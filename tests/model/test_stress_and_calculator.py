"""Stress/virial correctness (finite-difference strain) and the calculator API."""

import numpy as np
import pytest

from allegro_tpu.calculator import AllegroCalculator
from allegro_tpu.data import batch_frames, keys, to_jax
from allegro_tpu.data.neighborlist import neighbor_list
from allegro_tpu.model import AllegroModel

R_MAX = 2.2


def _model():
    return AllegroModel(
        r_max=R_MAX,
        type_names=["A", "B"],
        l_max=1,
        num_layers=2,
        num_scalar_features=8,
        num_tensor_features=4,
        scalar_embed_mlp_hidden_layers_width=8,
        allegro_mlp_hidden_layers_width=8,
        readout_mlp_hidden_layers_width=8,
        avg_num_neighbors=8.0,
        per_type_energy_scales=0.9,
        per_type_energy_shifts=[0.1, -0.1],
        model_dtype="float64",
    )


def _crystal(rng, side=3, a=1.8):
    grid = np.stack(np.meshgrid(*(np.arange(side),) * 3, indexing="ij"), -1).reshape(-1, 3)
    pos = grid * a + 0.08 * rng.randn(side**3, 3)
    types = rng.randint(0, 2, side**3).astype(np.int32)
    cell = np.eye(3) * side * a
    return pos, types, cell


def _energy_of(model, params, pos, types, cell):
    fr = {
        keys.POSITIONS: pos,
        keys.ATOM_TYPES: types,
        keys.CELL: cell,
        keys.PBC: np.ones(3, bool),
    }
    fr = neighbor_list(fr, R_MAX)
    b = to_jax(batch_frames([fr], n_frames=1), dtype=np.float64)
    return float(np.asarray(model.apply(params, b)[keys.TOTAL_ENERGY]).sum())


def test_virial_matches_finite_difference_strain(rng):
    pos, types, cell = _crystal(rng)
    model = _model()
    fr = neighbor_list(
        {keys.POSITIONS: pos, keys.ATOM_TYPES: types, keys.CELL: cell, keys.PBC: np.ones(3, bool)},
        R_MAX,
    )
    b = to_jax(batch_frames([fr], n_frames=1), dtype=np.float64)
    params = model.init(0, b)
    out = model(params, b)
    virial = np.asarray(out[keys.VIRIAL])[0]
    stress = np.asarray(out[keys.STRESS])[0]
    volume = float(np.abs(np.linalg.det(cell)))
    np.testing.assert_allclose(stress, -virial / volume, atol=1e-12)
    eps = 1e-6
    for (a_, b_) in [(0, 0), (1, 1), (0, 1), (2, 0)]:
        strain = np.zeros((3, 3))
        strain[a_, b_] += 0.5 * eps
        strain[b_, a_] += 0.5 * eps
        def deformed(s):
            return (
                pos @ (np.eye(3) + s),
                cell @ (np.eye(3) + s).T if False else cell + cell @ s,
            )
        pos_p, cell_p = pos + pos @ strain, cell + cell @ strain
        pos_m, cell_m = pos - pos @ strain, cell - cell @ strain
        ep = _energy_of(model, params, pos_p, types, cell_p)
        em = _energy_of(model, params, pos_m, types, cell_m)
        de_deps = (ep - em) / (2 * eps)
        np.testing.assert_allclose(-virial[a_, b_], de_deps, atol=1e-6, rtol=1e-5)


def test_forces_translation_sum_zero_with_pbc(rng):
    pos, types, cell = _crystal(rng)
    model = _model()
    fr = neighbor_list(
        {keys.POSITIONS: pos, keys.ATOM_TYPES: types, keys.CELL: cell, keys.PBC: np.ones(3, bool)},
        R_MAX,
    )
    b = to_jax(batch_frames([fr], n_frames=1), dtype=np.float64)
    params = model.init(0, b)
    f = np.asarray(model(params, b)[keys.FORCES])
    np.testing.assert_allclose(f.sum(axis=0), 0.0, atol=1e-9)


def test_calculator_repeated_calls_single_signature(rng):
    pos, types, cell = _crystal(rng)
    model = _model()
    fr = neighbor_list(
        {keys.POSITIONS: pos, keys.ATOM_TYPES: types, keys.CELL: cell, keys.PBC: np.ones(3, bool)},
        R_MAX,
    )
    b = to_jax(batch_frames([fr], n_frames=1), dtype=np.float64)
    params = model.init(0, b)
    calc = AllegroCalculator(model, params, dtype=np.float64)
    r1 = calc.calculate(pos, atom_types=types, cell=cell, pbc=(True,) * 3)
    assert "stress" in r1 and r1["forces"].shape == pos.shape
    # direct-vs-calculator consistency
    out = model(params, b)
    np.testing.assert_allclose(r1["energy"], float(np.asarray(out[keys.TOTAL_ENERGY]).sum()), atol=1e-10)
    np.testing.assert_allclose(r1["forces"], np.asarray(out[keys.FORCES])[: len(pos)], atol=1e-10)
    # perturbed second call reuses the padded signature
    r2 = calc.calculate(pos + 0.01 * rng.randn(*pos.shape), atom_types=types, cell=cell, pbc=(True,) * 3)
    assert np.isfinite(r2["energy"])
    # open-boundary call too
    r3 = calc.calculate(pos, atom_types=types)
    assert "stress" not in r3
