"""The precomputed per-neighbor-list statics (EDGE_TYPE, fused block plans,
center/neighbor rank-window fast paths, the neighbor-sort permutation) must
be pure accelerations: outputs and parameter gradients identical to the
fallback in-graph computation."""

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


def _data(rng, n_atoms=12):
    pos = rng.randn(n_atoms, 3) * 1.4
    frame = {
        keys.POSITIONS: pos,
        keys.ATOM_TYPES: rng.randint(0, 3, n_atoms).astype(np.int32),
    }
    fr = neighbor_list(frame, R_MAX)
    b = batch_frames([fr], n_atoms=n_atoms + 2, n_frames=1, edge_multiple=16)
    return to_jax(b, dtype=np.float64)


def _model(backend):
    return AllegroModel(
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
        model_dtype="float64",
        tp_kernel_backend=backend,
    )


@pytest.mark.parametrize("backend", ["fused", "fused_infer"])
def test_statics_do_not_change_energy_forces(backend, rng):
    model = _model(backend)
    data = _data(np.random.RandomState(3))
    params = model.init(0, data)
    pre = model.precompute_statics(data)
    # the fast paths must actually be armed for this test to mean anything
    assert keys.CENTER_RANK_IDENTITY in pre and keys.NBR_RANK_IDENTITY in pre
    out_plain = model.apply_with_derivatives(params, data)
    out_pre = model.apply_with_derivatives(params, pre)
    np.testing.assert_allclose(
        np.asarray(out_pre[keys.TOTAL_ENERGY]),
        np.asarray(out_plain[keys.TOTAL_ENERGY]),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(out_pre[keys.FORCES]),
        np.asarray(out_plain[keys.FORCES]),
        atol=1e-11,
    )


def test_statics_do_not_change_training_grads(rng):
    """Second-order AD (force loss) through the center/neighbor rank-window
    kernels and the perm_rows transpose must equal the fallback path."""
    model = _model("fused")
    data = _data(np.random.RandomState(9))
    params = model.init(0, data)
    pre = model.precompute_statics(data)
    target = jnp.zeros_like(data[keys.POSITIONS])

    def loss(d):
        def f(p):
            out = model.apply_with_derivatives(p, d)
            return (
                jnp.sum((out[keys.FORCES] - target) ** 2)
                + out[keys.TOTAL_ENERGY].sum() ** 2
            )

        return f

    g_plain = jax.grad(loss(data))(params)
    g_pre = jax.grad(loss(pre))(params)
    for a, b in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_pre)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-10, rtol=1e-8)


def test_no_fused_readout_killswitch(rng, monkeypatch):
    """ALLEGRO_NO_FUSED_READOUT=1 (the bench fallback if Mosaic rejects the
    readout kernel) must route the statics-armed fused_infer model through
    the exact XLA readout — including trimming the mega path's padded
    scalar blocks — with identical outputs."""
    model = _model("fused_infer")
    # seed 3: CENTER_RANK_IDENTITY armed, so the fused readout actually runs
    # on the baseline side (seed 7 left it dark — XLA vs XLA, vacuous)
    data = _data(np.random.RandomState(3))
    params = model.init(0, data)
    pre = model.precompute_statics(data)
    assert keys.CENTER_RANK_IDENTITY in pre
    out_fused = model.apply_with_derivatives(params, pre)
    monkeypatch.setenv("ALLEGRO_NO_FUSED_READOUT", "1")
    out_xla = model.apply_with_derivatives(params, pre)
    np.testing.assert_allclose(
        np.asarray(out_xla[keys.TOTAL_ENERGY]),
        np.asarray(out_fused[keys.TOTAL_ENERGY]),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(out_xla[keys.FORCES]),
        np.asarray(out_fused[keys.FORCES]),
        atol=1e-11,
    )


def _kernel_names(model, params, data):
    jx = str(jax.make_jaxpr(lambda p, d: model.apply(p, d))(params, data))
    return {tag: tag in jx for tag in ("mega_latent_env", "readout_sum_infer")}


def test_kernel_selection_travels_with_model(rng, monkeypatch):
    """use_mega / use_fused_readout are MODEL settings (VERDICT r4 #6):
    serialized in builder_kwargs, they win over the process env kill-switches
    so exported artifacts and rebuilds replay with identical kernel
    selection (reference analogue: modifier persistence,
    _contract.py:253-310)."""
    from allegro_tpu.model import FullAllegroModel

    data = _data(np.random.RandomState(3))  # seed 3 arms CENTER_RANK_IDENTITY
    # builder_kwargs carry the FULL builder's signature (what _rebuild and
    # the package loader replay)
    base = _model("fused_infer").builder_kwargs

    # explicit off: no mega/readout kernels even with a clean env
    monkeypatch.delenv("ALLEGRO_NO_MEGA", raising=False)
    monkeypatch.delenv("ALLEGRO_NO_FUSED_READOUT", raising=False)
    m_off = FullAllegroModel(
        **{**base, "use_mega": False, "use_fused_readout": False}
    )
    pre = m_off.precompute_statics(data)
    assert keys.CENTER_RANK_IDENTITY in pre  # fused readout eligible
    params = m_off.init(0, pre)
    names = _kernel_names(m_off, params, pre)
    assert not names["mega_latent_env"] and not names["readout_sum_infer"]

    # explicit on: the kernels run even under the env kill-switches
    monkeypatch.setenv("ALLEGRO_NO_MEGA", "1")
    monkeypatch.setenv("ALLEGRO_NO_FUSED_READOUT", "1")
    m_on = FullAllegroModel(
        **{**base, "use_mega": True, "use_fused_readout": True}
    )
    names = _kernel_names(m_on, params, pre)
    assert names["mega_latent_env"] and names["readout_sum_infer"]

    # a rebuild from serialized builder_kwargs (the package/modifier path)
    # keeps the selection under the same hostile env
    m_rt = FullAllegroModel(**m_on.builder_kwargs)
    names = _kernel_names(m_rt, params, pre)
    assert names["mega_latent_env"] and names["readout_sum_infer"]

    # outputs agree between the selections (env cleared for the off model)
    monkeypatch.delenv("ALLEGRO_NO_MEGA", raising=False)
    monkeypatch.delenv("ALLEGRO_NO_FUSED_READOUT", raising=False)
    out_on = m_on.apply_with_derivatives(params, pre)
    out_off = m_off.apply_with_derivatives(params, pre)
    np.testing.assert_allclose(
        np.asarray(out_on[keys.FORCES]),
        np.asarray(out_off[keys.FORCES]),
        atol=1e-11,
    )


def test_linear_readout_fused_parity(rng):
    """readout depth 0 → the fused readout kernel's n_hidden=0 (single
    matmul, no activation) branch; statics-armed must equal the XLA chain."""
    model = AllegroModel(
        r_max=R_MAX,
        type_names=["A", "B", "C"],
        l_max=1,
        num_layers=2,
        num_scalar_features=16,
        num_tensor_features=4,
        scalar_embed_mlp_hidden_layers_width=16,
        allegro_mlp_hidden_layers_width=16,
        readout_mlp_hidden_layers_depth=0,
        avg_num_neighbors=6.0,
        per_type_energy_scales=1.3,
        per_type_energy_shifts=[0.1, -0.2, 0.3],
        model_dtype="float64",
        tp_kernel_backend="fused_infer",
    )
    data = _data(np.random.RandomState(5))
    params = model.init(0, data)
    pre = model.precompute_statics(data)
    assert keys.CENTER_RANK_IDENTITY in pre
    out_plain = model.apply_with_derivatives(params, data)
    out_pre = model.apply_with_derivatives(params, pre)
    np.testing.assert_allclose(
        np.asarray(out_pre[keys.TOTAL_ENERGY]),
        np.asarray(out_plain[keys.TOTAL_ENERGY]),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(out_pre[keys.FORCES]),
        np.asarray(out_plain[keys.FORCES]),
        atol=1e-11,
    )
