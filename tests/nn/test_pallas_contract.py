"""Pallas TP kernel consistency vs the XLA reference path (interpret mode on
CPU — the analogue of the reference's kernel-vs-Contracter tests,
``tests/nn/test_contract_kernels.py``, tolerances from
``tests/model/test_allegro.py:72-74``)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

import allegro_tpu.ops.pallas_contract as pc
from allegro_tpu.lib.irreps import Irreps
from allegro_tpu.nn.contract import Contracter


@pytest.fixture(autouse=True)
def _interpret_mode():
    pc.INTERPRET = True
    yield
    pc.INTERPRET = False


IRREPS_GRID = [
    ("1x0e+1x1o", "1x0e+1x1o", "1x0e+1x1o"),
    ("1x0e+1x1o+1x2e", "1x0e+1x1o+1x2e", "1x0e+1x1o+1x2e"),
    ("1x0e+1x1o+1x2e", "1x0e+1x1o+1x2e", "1x0e"),
]


def _pair(irr, coupling, mul, scatter_factor=0.3):
    kw = dict(
        irreps_in1=irr[0], irreps_in2=irr[1], irreps_out=irr[2],
        mul=mul, path_channel_coupling=coupling, scatter_factor=scatter_factor,
        param_dtype=jnp.float32,
    )
    return (
        Contracter(**kw, kernel_backend="einsum"),
        Contracter(**kw, kernel_backend="pallas"),
    )


@pytest.mark.parametrize("irr", IRREPS_GRID)
@pytest.mark.parametrize("coupling", [True, False])
def test_forward_consistency(irr, coupling, rng):
    mul = 8
    ref, ker = _pair(irr, coupling, mul)
    E, n_atoms = 12, 4
    x1 = jnp.asarray(rng.randn(E, mul, Irreps(irr[0]).dim), jnp.float32)
    x2 = jnp.asarray(rng.randn(E, mul, Irreps(irr[1]).dim), jnp.float32)
    centers = jnp.asarray(rng.randint(0, n_atoms, E), jnp.int32)
    params = ref.init(jax.random.PRNGKey(0), x1, x2, centers, n_atoms)
    out_ref = ref.apply(params, x1, x2, centers, n_atoms)
    out_ker = ker.apply(params, x1, x2, centers, n_atoms)  # same param pytree
    np.testing.assert_allclose(np.asarray(out_ker), np.asarray(out_ref), atol=5e-5, rtol=1e-4)


@pytest.mark.parametrize("coupling", [True, False])
def test_gradient_consistency(coupling, rng):
    """Input gradients (the force path) must match the einsum backend.
    (Weight gradients are zero by design in the inference-scope backend;
    the tp_gradw kernel is covered by test_tp_gradw_correct.)"""
    irr = IRREPS_GRID[1]
    mul = 8
    ref, ker = _pair(irr, coupling, mul)
    E, n_atoms = 10, 3
    x1 = jnp.asarray(rng.randn(E, mul, 9), jnp.float32)
    x2 = jnp.asarray(rng.randn(E, mul, 9), jnp.float32)
    centers = jnp.asarray(rng.randint(0, n_atoms, E), jnp.int32)
    params = ref.init(jax.random.PRNGKey(0), x1, x2, centers, n_atoms)

    def loss(mod):
        def f(p, a, b):
            out = mod.apply(p, a, b, centers, n_atoms)
            return jnp.sum(out * out)
        return f

    g_ref = jax.grad(loss(ref), argnums=(1, 2))(params, x1, x2)
    g_ker = jax.grad(loss(ker), argnums=(1, 2))(params, x1, x2)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_ker)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-4, rtol=5e-4)


def test_tp_gradw_correct(rng):
    """The weight-gradient kernel (trainable scope) vs autodiff of the
    reference einsum formulation."""
    from allegro_tpu.nn.contract import enumerate_instructions, pack_w3j
    from allegro_tpu.ops.pallas_contract import sparse_entries, tp_contract

    i1 = Irreps("1x0e+1x1o")
    ins = enumerate_instructions(i1, i1, i1)
    W3 = pack_w3j(i1, i1, i1, ins)
    entries = sparse_entries(W3)
    P, d1, d2, d3 = W3.shape
    R, L = 8, 128
    a = jnp.asarray(rng.randn(d1, R, L), jnp.float32)
    b = jnp.asarray(rng.randn(d2, R, L), jnp.float32)
    w = jnp.asarray(rng.rand(P, L), jnp.float32)

    def loss_kernel(w):
        out = tp_contract(a, b, w, entries, (d1, d2, d3), 8)
        return jnp.sum(out**2)

    def loss_ref(w):
        W3j = jnp.asarray(W3, jnp.float32)
        # out[k,r,l] = sum_p w[p,l] * sum_ij W3[p,i,j,k] a[i,r,l] b[j,r,l]
        t = jnp.einsum("pijk,irl,jrl->pkrl", W3j, a, b)
        out = jnp.einsum("pl,pkrl->krl", w, t)
        return jnp.sum(out**2)

    gw_k = jax.grad(loss_kernel)(w)
    gw_r = jax.grad(loss_ref)(w)
    np.testing.assert_allclose(np.asarray(gw_k), np.asarray(gw_r), atol=1e-3, rtol=1e-3)


def test_pack_unpack_roundtrip(rng):
    from allegro_tpu.ops.pallas_contract import pack_edge_major, unpack_dim_major

    x = jnp.asarray(rng.randn(96, 8, 5), jnp.float32)  # 96*8 % 128 == 0
    y = pack_edge_major(x)
    assert y.shape == (5, 96 * 8 // 128, 128)
    back = unpack_dim_major(y, 96, 8)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=0)
    g = jax.grad(lambda a: (pack_edge_major(a) ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(g), 2 * np.asarray(x), atol=1e-6)


def test_full_model_consistency(rng):
    """Whole-model check: pallas backend vs einsum backend must agree on
    energies and forces with identical parameters — the reference's
    kernel-consistency test (``tests/model/test_allegro.py:206-267``).

    Scope matches the reference's Triton backend: inference + forces
    (first-order AD). Force-loss training (second-order AD) uses the einsum
    backend — jax.custom_vjp does not support reverse-over-reverse; a
    primitive-based kernel with JVP+transpose rules (the cuEq-equivalent,
    trainable backend) is tracked in TODO.md."""
    from allegro_tpu.data import batch_frames, keys, to_jax
    from allegro_tpu.data.neighborlist import neighbor_list
    from allegro_tpu.model import AllegroModel

    def make(backend):
        return AllegroModel(
            r_max=2.5,
            type_names=["A", "B"],
            l_max=2,
            num_layers=2,
            num_scalar_features=8,
            num_tensor_features=4,
            scalar_embed_mlp_hidden_layers_width=8,
            allegro_mlp_hidden_layers_width=8,
            readout_mlp_hidden_layers_width=8,
            avg_num_neighbors=5.0,
            per_type_energy_scales=1.1,
            per_type_energy_shifts=[0.2, -0.2],
            model_dtype="float32",
            tp_kernel_backend=backend,
        )

    r = np.random.RandomState(3)
    fr = {
        keys.POSITIONS: r.randn(10, 3) * 1.5,
        keys.ATOM_TYPES: r.randint(0, 2, 10).astype(np.int32),
    }
    fr = neighbor_list(fr, 2.5)
    b = to_jax(batch_frames([fr], n_frames=1), dtype=np.float32)
    m_ref, m_ker = make("einsum"), make("pallas")
    params = m_ref.init(0, b)
    out_ref = m_ref(params, b)
    out_ker = m_ker(params, b)
    np.testing.assert_allclose(
        np.asarray(out_ker[keys.TOTAL_ENERGY]),
        np.asarray(out_ref[keys.TOTAL_ENERGY]),
        atol=5e-5, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out_ker[keys.FORCES]), np.asarray(out_ref[keys.FORCES]),
        atol=5e-4, rtol=1e-3,
    )

    # force-loss TRAINING gradients: second-order AD through the kernels
    # (enabled by the primitive-based backend with JVP+transpose rules —
    # this is what the reference's cuEquivariance backend provides)
    def force_loss(model):
        def f(p):
            out = model(p, b)
            return (out[keys.FORCES] ** 2).sum() + (out[keys.TOTAL_ENERGY] ** 2).sum()
        return f

    g_ref = jax.grad(force_loss(m_ref))(params)
    g_ker = jax.grad(force_loss(m_ker))(params)
    for x, y in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_ker)):
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=5e-3, rtol=5e-3)


def test_pallas_backend_under_vmap(rng):
    """The trainer vmaps the model over stacked per-device batches — the TP
    primitive's batching rule must hold (shared weights ride the row axis)."""
    from allegro_tpu.data import batch_frames, keys, to_jax
    from allegro_tpu.data.neighborlist import neighbor_list
    from allegro_tpu.model import AllegroModel

    def make(backend):
        return AllegroModel(
            r_max=2.2, type_names=["A", "B"], l_max=1, num_layers=1,
            num_scalar_features=8, num_tensor_features=4,
            scalar_embed_mlp_hidden_layers_width=8,
            allegro_mlp_hidden_layers_width=8, readout_mlp_hidden_layers_width=8,
            avg_num_neighbors=5.0, per_type_energy_scales=1.0,
            per_type_energy_shifts=0.0, model_dtype="float32",
            tp_kernel_backend=backend,
        )

    r = np.random.RandomState(4)
    rows = []
    for k in range(3):
        fr = {
            keys.POSITIONS: r.randn(8, 3) * 1.2,
            keys.ATOM_TYPES: r.randint(0, 2, 8).astype(np.int32),
        }
        fr = neighbor_list(fr, 2.2)
        rows.append(
            to_jax(batch_frames([fr], n_atoms=10, n_edges=64, n_frames=1), dtype=np.float32)
        )
    stacked = {k: jnp.stack([row[k] for row in rows]) for k in rows[0]}
    m_ref, m_ker = make("einsum"), make("pallas")
    params = m_ref.init(0, rows[0])

    def forces(model):
        return jax.vmap(lambda row: model(params, row)[keys.FORCES])(stacked)

    f_ref = forces(m_ref)
    f_ker = forces(m_ker)
    np.testing.assert_allclose(np.asarray(f_ker), np.asarray(f_ref), atol=5e-4, rtol=1e-3)


def test_entry_permutations():
    from allegro_tpu.nn.contract import pack_w3j, enumerate_instructions
    from allegro_tpu.ops.pallas_contract import sparse_entries, _swap_a_out, _swap_b_out

    i1 = Irreps("1x0e+1x1o")
    ins = enumerate_instructions(i1, i1, i1)
    w3j = pack_w3j(i1, i1, i1, ins)
    e = sparse_entries(w3j)
    assert len(e) > 0
    b1 = _swap_a_out(e)
    assert sorted((i, j, k) for i, j, k, _, _ in e) == sorted(
        (k, j, i) for i, j, k, _, _ in b1
    )
    b2 = _swap_b_out(e)
    assert sorted((i, j, k) for i, j, k, _, _ in e) == sorted(
        (i, k, j) for i, j, k, _, _ in b2
    )
