"""Domain decomposition tests: distributed energy/forces must exactly match
the single-device reference — the key correctness property of the halo
exchange (reference analogue: pair_allegro's decomposed MD matching the
single-process model, SURVEY.md §3.4)."""

import numpy as np
import jax
import pytest

from allegro_tpu.data import batch_frames, keys, to_jax
from allegro_tpu.data.neighborlist import neighbor_list
from allegro_tpu.model import AllegroEnergyModel
from allegro_tpu.parallel import SlabDecomposition

R_MAX = 1.6


def _model():
    return AllegroEnergyModel(
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
        per_type_energy_scales=0.7,
        per_type_energy_shifts=[0.4, -0.1],
        model_dtype="float64",
    )


def _system(rng, nx=16, ny=3, nz=3, a=1.4, jitter=0.05):
    grid = np.stack(
        np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz), indexing="ij"), -1
    ).reshape(-1, 3).astype(np.float64)
    pos = grid * a + jitter * rng.randn(len(grid), 3)
    cell = np.diag([nx * a, ny * a, nz * a])
    types = rng.randint(0, 2, len(grid)).astype(np.int32)
    return pos, types, cell


def _reference(model, params, pos, types, cell, pbc):
    fr = {keys.POSITIONS: pos, keys.ATOM_TYPES: types}
    if cell is not None:
        fr[keys.CELL] = cell
        fr[keys.PBC] = np.asarray(pbc)
    fr = neighbor_list(fr, R_MAX)
    b = to_jax(batch_frames([fr], n_frames=1), dtype=np.float64)
    out = model.apply_with_derivatives(params, b)
    n = len(pos)
    return float(np.asarray(out[keys.TOTAL_ENERGY]).sum()), np.asarray(out[keys.FORCES])[:n]


@pytest.mark.parametrize("n_dev", [2, 4, 8])
@pytest.mark.parametrize("pbc", [(True, True, True), (False, False, False)])
def test_distributed_matches_single(n_dev, pbc, rng):
    pos, types, cell = _system(rng)
    model = _model()
    e_ref_params_data = {
        keys.POSITIONS: pos[:8],
        keys.ATOM_TYPES: types[:8],
        keys.EDGE_INDEX: np.zeros((2, 4), np.int32),
        keys.EDGE_CELL_SHIFT: np.zeros((4, 3)),
        keys.EDGE_MASK: np.zeros(4, bool),
    }
    params = model.init(0, e_ref_params_data)
    e_ref, f_ref = _reference(model, params, pos, types, cell if any(pbc) else None, pbc)

    mesh = jax.sharding.Mesh(np.array(jax.devices()[:n_dev]), ("dp",))
    dd = SlabDecomposition(
        pos, types, cell if any(pbc) else None, pbc, R_MAX, mesh, dtype=np.float64
    )
    fn = dd.make_energy_forces_fn(model, params)
    e, f_local = fn(dd.scatter_positions(pos))
    f = dd.gather_forces(np.asarray(f_local))
    np.testing.assert_allclose(float(e), e_ref, atol=1e-9, rtol=1e-12)
    np.testing.assert_allclose(f, f_ref, atol=1e-9)


def test_slab_width_assertion(rng):
    pos, types, cell = _system(rng, nx=4)  # tiny box: 8 slabs too thin
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:8]), ("dp",))
    with pytest.raises(AssertionError):
        SlabDecomposition(pos, types, cell, (True,) * 3, R_MAX, mesh)
