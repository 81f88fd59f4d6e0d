"""MD engine tests: NVE energy conservation (across neighbor rebuilds),
thermostat behavior, and multi-device edge-sharded force consistency."""

import numpy as np
import jax
import pytest

from allegro_tpu.data import keys
from allegro_tpu.md import MDState, Simulation, kinetic_energy
from allegro_tpu.model import AllegroEnergyModel

N_TYPES = 2


def _model(r_max=2.0):
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


def _system(rng, n=27, spacing=1.5):
    side = round(n ** (1 / 3))
    grid = np.stack(np.meshgrid(*(np.arange(side),) * 3, indexing="ij"), -1).reshape(-1, 3)
    pos = grid * spacing + 0.05 * rng.randn(len(grid), 3)
    types = rng.randint(0, N_TYPES, len(grid)).astype(np.int32)
    cell = np.eye(3) * side * spacing
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


def _make_sim(model, params, types, cell, mesh_size=1, **kw):
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:mesh_size]), ("dp",))
    defaults = dict(
        atom_types=types,
        masses=np.ones(N_TYPES),
        r_max=2.0,
        dt=2e-3,
        cell=cell,
        pbc=(True, True, True),
        skin=0.4,
        steps_per_block=10,
        edge_multiple=32,
        mesh=mesh,
        dtype=np.float64,
    )
    defaults.update(kw)
    return Simulation(model, params, **defaults)


def test_nve_energy_conservation(rng):
    pos, types, cell = _system(rng)
    model = _model()
    params = _init_params(model, pos, types)
    sim = _make_sim(model, params, types, cell)
    v0 = rng.randn(len(pos), 3) * 0.05
    energies = []
    sim.run(
        MDState(pos, v0), 100,
        callback=lambda s, e: energies.append(e + kinetic_energy(s.velocities, sim.masses_per_atom)),
    )
    e = np.asarray(energies)
    drift = np.abs(e - e[0]).max()
    assert drift < 5e-5 * max(abs(e[0]), 1.0), (drift, e[0], e[-1])
    assert sim.rebuilds >= 1


def test_nve_conservation_across_rebuilds(rng):
    pos, types, cell = _system(rng)
    model = _model()
    params = _init_params(model, pos, types)
    # tiny skin: force frequent rebuilds
    sim = _make_sim(model, params, types, cell, skin=0.05, steps_per_block=5, dt=4e-3)
    v0 = rng.randn(len(pos), 3) * 0.4
    energies = []
    sim.run(
        MDState(pos, v0), 60,
        callback=lambda s, e: energies.append(e + kinetic_energy(s.velocities, sim.masses_per_atom)),
    )
    assert sim.rebuilds >= 3
    e = np.asarray(energies)
    assert np.abs(e - e[0]).max() < 1e-4 * max(abs(e[0]), 1.0)


def test_multidevice_matches_single(rng):
    pos, types, cell = _system(rng)
    model = _model()
    params = _init_params(model, pos, types)
    v0 = rng.randn(len(pos), 3) * 0.05
    trajs = {}
    for ndev in (1, 4):
        sim = _make_sim(model, params, types, cell, mesh_size=ndev)
        st = sim.run(MDState(pos.copy(), v0.copy()), 30)
        trajs[ndev] = (st.positions, st.velocities)
    # edge partitioning changes float summation order; tiny differences are
    # amplified by the chaotic dynamics over 30 steps
    np.testing.assert_allclose(trajs[1][0], trajs[4][0], atol=1e-5)
    np.testing.assert_allclose(trajs[1][1], trajs[4][1], atol=1e-5)


def test_langevin_heats_system(rng):
    pos, types, cell = _system(rng)
    model = _model()
    params = _init_params(model, pos, types)
    sim = _make_sim(
        model, params, types, cell, langevin_gamma=2.0, langevin_kT=0.5, dt=1e-3
    )
    st = MDState(pos, np.zeros_like(pos))
    st = sim.run(st, 200)
    ke = kinetic_energy(st.velocities, sim.masses_per_atom)
    # equipartition: KE ≈ 1.5 N kT = 1.5*27*0.5 ≈ 20; loose band
    assert 5.0 < ke < 60.0, ke
