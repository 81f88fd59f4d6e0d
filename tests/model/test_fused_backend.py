"""Full-model consistency of the fused kernel backend vs the einsum oracle
(interpret mode on CPU) — the analogue of the reference's kernel-consistency
battery (``tests/model/test_allegro.py:206-267``: same params, energies /
forces equal within dtype tolerance)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import allegro_tpu.ops.fused_tp as fused_tp
from allegro_tpu.data import batch_frames, keys, to_jax
from allegro_tpu.data.neighborlist import neighbor_list
from allegro_tpu.model import AllegroModel

pytestmark = pytest.mark.slow

R_MAX = 2.5


@pytest.fixture(autouse=True)
def _interpret_mode():
    fused_tp.INTERPRET = True
    yield
    fused_tp.INTERPRET = False


def _data(rng, n_atoms=12, n_edges_pad=None, dtype=np.float64):
    pos = rng.randn(n_atoms, 3) * 1.4
    frame = {
        keys.POSITIONS: pos,
        keys.ATOM_TYPES: rng.randint(0, 3, n_atoms).astype(np.int32),
    }
    fr = neighbor_list(frame, R_MAX)
    b = batch_frames(
        [fr], n_atoms=n_atoms + 2, n_edges=n_edges_pad, n_frames=1, edge_multiple=16
    )
    return to_jax(b, dtype=dtype)


def _models(dtype_str, backend="fused", **over):
    kw = dict(
        r_max=R_MAX,
        type_names=["A", "B", "C"],
        l_max=2,
        parity=True,
        num_layers=2,
        num_scalar_features=16,
        num_tensor_features=4,
        scalar_embed_mlp_hidden_layers_width=16,
        allegro_mlp_hidden_layers_width=16,
        readout_mlp_hidden_layers_width=16,
        avg_num_neighbors=6.0,
        per_type_energy_scales=1.3,
        per_type_energy_shifts=[0.1, -0.2, 0.3],
        model_dtype=dtype_str,
    )
    kw.update(over)
    return (
        AllegroModel(**kw, tp_kernel_backend="einsum"),
        AllegroModel(**kw, tp_kernel_backend=backend),
    )


@pytest.mark.parametrize("dtype_str,tol", [("float64", 1e-10), ("float32", 5e-5)])
@pytest.mark.parametrize("coupling", [True, False])
@pytest.mark.parametrize("backend", ["fused", "fused_infer"])
def test_energy_force_consistency(dtype_str, tol, coupling, backend, rng):
    ref, fus = _models(
        dtype_str, tp_path_channel_coupling=coupling, backend=backend
    )
    np_dtype = np.float64 if dtype_str == "float64" else np.float32
    data = _data(np.random.RandomState(3), dtype=np_dtype)
    params = ref.init(0, data)
    out_r = ref(params, data)
    out_f = fus(params, data)  # identical parameter pytree across backends
    np.testing.assert_allclose(
        np.asarray(out_f[keys.TOTAL_ENERGY]),
        np.asarray(out_r[keys.TOTAL_ENERGY]),
        atol=tol, rtol=10 * tol,
    )
    fscale = float(np.abs(np.asarray(out_r[keys.FORCES])).max())
    np.testing.assert_allclose(
        np.asarray(out_f[keys.FORCES]),
        np.asarray(out_r[keys.FORCES]),
        atol=tol * max(fscale, 1.0), rtol=10 * tol,
    )


@pytest.mark.parametrize("backend", ["fused", "fused_infer"])
def test_shared_env_weights_consistency(backend, rng):
    """``weight_individual_irreps=False`` (one env weight per channel, shared
    across irreps — reference ``allegro/nn/_strided/_channels.py`` knob): the
    mega-kernel path slices per-irrep weight columns directly, so this config
    must route through the fallback path and still match the einsum oracle."""
    ref, fus = _models("float64", backend=backend, weight_individual_irreps=False)
    data = _data(np.random.RandomState(11))
    params = ref.init(0, data)
    out_r = ref.apply_with_derivatives(params, data)
    out_f = fus.apply_with_derivatives(params, data)
    np.testing.assert_allclose(
        np.asarray(out_f[keys.TOTAL_ENERGY]),
        np.asarray(out_r[keys.TOTAL_ENERGY]),
        atol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(out_f[keys.FORCES]), np.asarray(out_r[keys.FORCES]), atol=1e-9
    )


def test_padding_invariance_fused(rng):
    """Extra sentinel-padded edges/atoms must not change fused outputs."""
    ref, fus = _models("float64")
    r = np.random.RandomState(5)
    d_small = _data(r, n_edges_pad=None)
    params = fus.init(0, d_small)
    out1 = fus(params, d_small)
    n_real_edges = int(np.asarray(d_small[keys.EDGE_MASK]).sum())
    d_big = _data(np.random.RandomState(5), n_edges_pad=n_real_edges + 160)
    out2 = fus(params, d_big)
    np.testing.assert_allclose(
        np.asarray(out2[keys.TOTAL_ENERGY]),
        np.asarray(out1[keys.TOTAL_ENERGY]),
        atol=1e-10,
    )
    n_at = np.asarray(d_small[keys.POSITIONS]).shape[0]
    np.testing.assert_allclose(
        np.asarray(out2[keys.FORCES])[:n_at],
        np.asarray(out1[keys.FORCES]),
        atol=1e-10,
    )


def test_training_grads_through_fused(rng):
    """Force-loss parameter gradients (second-order AD) match einsum."""
    ref, fus = _models("float64")
    data = _data(np.random.RandomState(9))
    params = ref.init(0, data)
    target = jnp.zeros_like(data[keys.POSITIONS])

    def loss(model):
        def f(p):
            out = model(p, data)
            return jnp.sum((out[keys.FORCES] - target) ** 2) + out[
                keys.TOTAL_ENERGY
            ].sum() ** 2

        return f

    g_r = jax.grad(loss(ref))(params)
    g_f = jax.grad(loss(fus))(params)
    flat_r = jax.tree.leaves(g_r)
    flat_f = jax.tree.leaves(g_f)
    assert len(flat_r) == len(flat_f)
    for a, b in zip(flat_r, flat_f):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-9, rtol=1e-7)


def test_fused_infer_weight_grads_fail_loudly(rng):
    """`fused_infer` is the inference/MD backend: its one-pass backward skips
    the weight-cotangent computation (a large VPU saving). Accidental
    parameter training must fail LOUDLY — NaN weight grads (the dw output is
    NaN by design) or a raised error — never silently-wrong numbers.
    Training uses `fused`. The ops-level NaN contract:"""
    import allegro_tpu.ops.fused_tp as ft
    from allegro_tpu.ops.fused_primitives import fused_layer_infer

    eb, Ep, U = 16, 32, 4
    d = 2
    entries = ((0, 0, 0, 0, 1.0), (1, 1, 1, 1, 0.5))
    centers = jnp.asarray(
        np.sort(np.random.RandomState(0).randint(0, 8, Ep)).astype(np.int32)
    )
    win, offs = ft.make_block_plan(centers, eb)
    nr = ft.num_rank_rows(10, eb)
    x = jnp.ones((Ep, d * U))
    sh = jnp.ones((Ep, d))
    wexp = jnp.ones((Ep, 2 * U))
    w = jnp.ones((2, U))

    def loss(w):
        out = fused_layer_infer(
            x, sh, wexp, w, offs, win, entries, (d, d, d), U, eb, (0, 1), nr
        )
        return out.sum()

    g = jax.grad(loss)(w)
    assert not np.isfinite(np.asarray(g)).any(), "dw must be NaN by design"
    # forces (position-path cotangents) stay finite: test_energy_force_consistency


@pytest.mark.parametrize("backend", ["fused", "fused_infer"])
def test_lmax3_consistency(backend, rng):
    """l_max=3 full-parity deep stack (BASELINE config 3, the O(l_max^6)
    case): fused kernels vs the einsum oracle at f64."""
    ref, fus = _models("float64", backend=backend, l_max=3)
    data = _data(np.random.RandomState(21))
    params = ref.init(0, data)
    out_r = ref.apply_with_derivatives(params, data)
    out_f = fus.apply_with_derivatives(params, data)
    np.testing.assert_allclose(
        np.asarray(out_f[keys.TOTAL_ENERGY]),
        np.asarray(out_r[keys.TOTAL_ENERGY]),
        atol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(out_f[keys.FORCES]), np.asarray(out_r[keys.FORCES]), atol=1e-9
    )
