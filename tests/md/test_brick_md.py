"""MD with 3-D brick domain decomposition: trajectory must match the
single-device edge-shard strategy, energy conserved across re-decompositions
(atom migration between bricks — the LAMMPS processor-grid role,
``/root/reference/README.md:43-45``)."""

import numpy as np
import jax
import pytest

pytestmark = pytest.mark.slow

from allegro_tpu.data import keys
from allegro_tpu.md import MDState, Simulation, kinetic_energy
from allegro_tpu.model import AllegroEnergyModel

N_TYPES = 2


def _model(r_max=1.6):
    return AllegroEnergyModel(
        r_max=r_max,
        type_names=["A", "B"],
        l_max=1,
        num_layers=1,
        num_scalar_features=8,
        num_tensor_features=4,
        scalar_embed_mlp_hidden_layers_width=8,
        allegro_mlp_hidden_layers_width=8,
        readout_mlp_hidden_layers_width=8,
        avg_num_neighbors=6.0,
        per_type_energy_scales=0.05,
        per_type_energy_shifts=[0.1, -0.3],
        model_dtype="float64",
    )


def _system(rng, n=5, a=1.4):
    grid = np.stack(
        np.meshgrid(*(np.arange(n),) * 3, indexing="ij"), -1
    ).reshape(-1, 3).astype(np.float64)
    pos = grid * a + 0.04 * rng.randn(len(grid), 3)
    types = rng.randint(0, N_TYPES, len(grid)).astype(np.int32)
    cell = np.diag([n * a] * 3)
    return pos, types, cell


def _init_params(model, pos, types):
    data = {
        keys.POSITIONS: pos,
        keys.ATOM_TYPES: types,
        keys.EDGE_INDEX: np.zeros((2, 4), np.int32),
        keys.EDGE_CELL_SHIFT: np.zeros((4, 3)),
        keys.EDGE_MASK: np.zeros(4, bool),
    }
    return model.init(0, data)


def _sim(model, params, types, cell, strategy, mesh, **kw):
    defaults = dict(
        atom_types=types,
        masses=np.ones(N_TYPES),
        r_max=1.6,
        dt=2e-3,
        cell=cell,
        pbc=(True,) * 3,
        skin=0.3,
        steps_per_block=5,
        edge_multiple=32,
        mesh=mesh,
        dtype=np.float64,
        strategy=strategy,
    )
    defaults.update(kw)
    return Simulation(model, params, **defaults)


def _brick_mesh(shape=(2, 2, 2)):
    devs = np.array(jax.devices()[: int(np.prod(shape))]).reshape(shape)
    return jax.sharding.Mesh(devs, ("bx", "by", "bz")[: len(shape)])


def test_brick_md_matches_single_device(rng):
    pos, types, cell = _system(rng)
    model = _model()
    params = _init_params(model, pos, types)
    v0 = rng.randn(len(pos), 3) * 0.05
    one = jax.sharding.Mesh(np.array(jax.devices()[:1]), ("dp",))
    st_ref = _sim(model, params, types, cell, "edge_shard", one).run(
        MDState(pos.copy(), v0.copy()), 20
    )
    st_brick = _sim(model, params, types, cell, "brick", _brick_mesh()).run(
        MDState(pos.copy(), v0.copy()), 20
    )
    inv = np.linalg.inv(cell)

    def wrapped(p):
        f = p @ inv
        return (f - np.floor(f)) @ cell

    np.testing.assert_allclose(
        wrapped(st_brick.positions), wrapped(st_ref.positions), atol=1e-6
    )
    np.testing.assert_allclose(st_brick.velocities, st_ref.velocities, atol=1e-6)


def test_brick_md_energy_conservation_with_migration(rng):
    pos, types, cell = _system(rng)
    model = _model()
    params = _init_params(model, pos, types)
    sim = _sim(model, params, types, cell, "brick", _brick_mesh(), skin=0.15)
    v0 = rng.randn(len(pos), 3) * 0.3  # hot: forces migration across bricks
    energies = []
    sim.run(
        MDState(pos, v0), 60,
        callback=lambda s, e: energies.append(
            e + kinetic_energy(s.velocities, sim.masses_per_atom)
        ),
    )
    assert sim.rebuilds >= 2  # re-decompositions happened
    e = np.asarray(energies)
    assert np.abs(e - e[0]).max() < 2e-4 * max(abs(e[0]), 1.0), (e[0], e[-1])
