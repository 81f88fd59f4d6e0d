"""3-D brick decomposition tests: the staged (dimension-by-dimension) halo
exchange over a multi-axis mesh must exactly reproduce the single-device
model — including corner/edge-adjacent ghost contributions that ride two or
three ppermute hops (LAMMPS brick-decomposition role,
``/root/reference/README.md:43-45``)."""

import numpy as np
import jax
import pytest

from allegro_tpu.data import batch_frames, keys, to_jax
from allegro_tpu.data.neighborlist import neighbor_list
from allegro_tpu.model import AllegroEnergyModel
from allegro_tpu.parallel import BrickDecomposition, SlabDecomposition

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


def _system(rng, nx=5, ny=5, nz=5, a=1.4, jitter=0.05):
    grid = np.stack(
        np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz), indexing="ij"), -1
    ).reshape(-1, 3).astype(np.float64)
    pos = grid * a + jitter * rng.randn(len(grid), 3)
    cell = np.diag([nx * a, ny * a, nz * a])
    types = rng.randint(0, 2, len(grid)).astype(np.int32)
    return pos, types, cell


def _params(model, pos, types):
    data = {
        keys.POSITIONS: pos[:8],
        keys.ATOM_TYPES: types[:8],
        keys.EDGE_INDEX: np.zeros((2, 4), np.int32),
        keys.EDGE_CELL_SHIFT: np.zeros((4, 3)),
        keys.EDGE_MASK: np.zeros(4, bool),
    }
    return model.init(0, data)


def _reference(model, params, pos, types, cell, pbc):
    fr = {keys.POSITIONS: pos, keys.ATOM_TYPES: types}
    if cell is not None:
        fr[keys.CELL] = cell
        fr[keys.PBC] = np.asarray(pbc)
    fr = neighbor_list(fr, R_MAX)
    b = to_jax(batch_frames([fr], n_frames=1), dtype=np.float64)
    out = model.apply_with_derivatives(params, b)
    n = len(pos)
    return (
        float(np.asarray(out[keys.TOTAL_ENERGY]).sum()),
        np.asarray(out[keys.FORCES])[:n],
    )


def _mesh(shape, names):
    devs = np.array(jax.devices()[: int(np.prod(shape))]).reshape(shape)
    return jax.sharding.Mesh(devs, names)


@pytest.mark.parametrize(
    "shape,names",
    [
        ((2, 2, 2), ("bx", "by", "bz")),
        ((4, 2), ("bx", "by")),
        ((8,), ("bx",)),
        ((1, 2, 2), ("bx", "by", "bz")),
    ],
)
@pytest.mark.parametrize(
    "pbc", [(True, True, True), (False, False, False), (True, False, True)]
)
def test_brick_matches_single_device(shape, names, pbc, rng):
    nx = 12 if shape[0] >= 4 else 5
    pos, types, cell = _system(rng, nx=nx)
    model = _model()
    params = _params(model, pos, types)
    e_ref, f_ref = _reference(
        model, params, pos, types, cell if any(pbc) else None, pbc
    )
    dd = BrickDecomposition(
        pos,
        types,
        cell if any(pbc) else None,
        pbc,
        R_MAX,
        _mesh(shape, names),
        dtype=np.float64,
    )
    fn = dd.make_energy_forces_fn(model, params)
    e, f_local = fn(dd.scatter_positions(pos))
    f = dd.gather_forces(np.asarray(f_local))
    np.testing.assert_allclose(float(e), e_ref, atol=1e-9, rtol=1e-12)
    np.testing.assert_allclose(f, f_ref, atol=1e-9)


def test_brick_width_assertion(rng):
    pos, types, cell = _system(rng, nx=2, ny=2, nz=2)  # 2.8 Å box: too thin
    mesh = _mesh((2, 2, 2), ("bx", "by", "bz"))
    with pytest.raises(AssertionError):
        BrickDecomposition(pos, types, cell, (True,) * 3, R_MAX, mesh)


@pytest.mark.parametrize("cls", [SlabDecomposition, BrickDecomposition])
def test_open_boundary_narrow_box_no_duplicate_edges(cls, rng):
    """D=2 along an OPEN axis with brick width < 2 r_max: the ring ppermute
    still wraps, and an unmasked wrap ghost at its true position would
    duplicate a direct ghost (double-counted edges). Regression for the
    wrap-transfer masking."""
    # box 2.8 wide along x → two bricks of 1.4 < 2*r_max... too thin for the
    # width assert; use 3.4 → bricks of 1.7 ∈ [r_max, 2 r_max)
    n = 24
    pos = np.zeros((n, 3))
    pos[:, 0] = rng.uniform(0.05, 3.35, n)
    pos[:, 1] = rng.uniform(0.0, 2.0, n)
    pos[:, 2] = rng.uniform(0.0, 2.0, n)
    pos[0, 0], pos[1, 0] = 0.0, 3.4  # pin the bounding box to 3.4 wide
    types = rng.randint(0, 2, n).astype(np.int32)
    pbc = (False, False, False)
    model = _model()
    params = _params(model, pos, types)
    e_ref, f_ref = _reference(model, params, pos, types, None, pbc)
    if cls is SlabDecomposition:
        mesh = _mesh((2,), ("dp",))
    else:
        mesh = _mesh((2,), ("bx",))
    dd = cls(pos, types, None, pbc, R_MAX, mesh, dtype=np.float64)
    fn = dd.make_energy_forces_fn(model, params)
    e, f_local = fn(dd.scatter_positions(pos))
    f = dd.gather_forces(np.asarray(f_local))
    np.testing.assert_allclose(float(e), e_ref, atol=1e-9, rtol=1e-12)
    np.testing.assert_allclose(f, f_ref, atol=1e-9)
