"""Model-modifier registry (backend swap keeps params) and ZBL pair potential."""

import numpy as np
import pytest

import allegro_tpu.ops.pallas_contract as pc
from allegro_tpu.data import batch_frames, keys, to_jax
from allegro_tpu.data.neighborlist import neighbor_list
from allegro_tpu.model import AllegroModel, MODEL_MODIFIERS, modify


def _model(**kw):
    base = dict(
        r_max=2.2,
        type_names=["H", "C"],
        l_max=1,
        num_layers=1,
        num_scalar_features=8,
        num_tensor_features=4,
        scalar_embed_mlp_hidden_layers_width=8,
        allegro_mlp_hidden_layers_width=8,
        readout_mlp_hidden_layers_width=8,
        avg_num_neighbors=5.0,
        per_type_energy_scales=1.0,
        per_type_energy_shifts=0.0,
        model_dtype="float64",
    )
    base.update(kw)
    return AllegroModel(**base)


def _batch(rng, n=8):
    fr = {
        keys.POSITIONS: rng.randn(n, 3) * 1.2,
        keys.ATOM_TYPES: rng.randint(0, 2, n).astype(np.int32),
    }
    fr = neighbor_list(fr, 2.2)
    return to_jax(batch_frames([fr], n_frames=1), dtype=np.float64)


def test_modifier_swaps_backend_keeps_params(rng):
    pc.INTERPRET = True
    try:
        m = _model()
        b = _batch(rng)
        params = m.init(0, b)
        out_ref = m(params, b)
        m2 = modify(m, ["enable_PallasContracter"])
        out_ker = m2(params, b)  # SAME params pytree
        np.testing.assert_allclose(
            np.asarray(out_ker[keys.TOTAL_ENERGY]),
            np.asarray(out_ref[keys.TOTAL_ENERGY]),
            atol=1e-8,
        )
        m3 = modify(m2, [{"modifier": "enable_EinsumContracter"}])
        out_back = m3(params, b)
        np.testing.assert_allclose(
            np.asarray(out_back[keys.TOTAL_ENERGY]),
            np.asarray(out_ref[keys.TOTAL_ENERGY]),
            atol=0,
        )
    finally:
        pc.INTERPRET = False


def test_registry_names():
    assert "enable_PallasContracter" in MODEL_MODIFIERS
    assert "enable_EinsumContracter" in MODEL_MODIFIERS


def test_zbl_pair_potential(rng):
    b = _batch(rng)
    m_plain = _model()
    m_zbl = _model(
        pair_potential={
            "_target_": "allegro_tpu.nn.ZBLPairPotential",
            "chemical_species": ["H", "C"],
        }
    )
    params = m_zbl.init(0, b)
    out_zbl = m_zbl(params, b)
    out_plain = m_plain(params, b)  # param tree identical (ZBL is parameter-free)
    e_zbl = float(np.asarray(out_zbl[keys.TOTAL_ENERGY]).sum())
    e_plain = float(np.asarray(out_plain[keys.TOTAL_ENERGY]).sum())
    assert e_zbl > e_plain  # ZBL is strictly repulsive
    # forces finite and consistent with finite differences
    eps = 1e-6
    fr_pos = np.asarray(b[keys.POSITIONS]).copy()
    atom, axis = 1, 0
    for s, sign in ((eps, +1), (-eps, -1)):
        pass
    pos_p = fr_pos.copy(); pos_p[atom, axis] += eps
    pos_m = fr_pos.copy(); pos_m[atom, axis] -= eps
    def e_of(p):
        bb = dict(b)
        import jax.numpy as jnp
        bb[keys.POSITIONS] = jnp.asarray(p)
        return float(np.asarray(m_zbl(params, bb)[keys.TOTAL_ENERGY]).sum())
    f_num = -(e_of(pos_p) - e_of(pos_m)) / (2 * eps)
    f_model = float(np.asarray(out_zbl[keys.FORCES])[atom, axis])
    np.testing.assert_allclose(f_model, f_num, atol=1e-5, rtol=1e-5)
