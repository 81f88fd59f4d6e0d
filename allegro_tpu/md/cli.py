"""MD stage for the CLI: build a system from config, run, report."""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import numpy as np


def run_md(config: Dict[str, Any], workdir: str):
    import jax

    from ..data import keys
    from ..train import Trainer, load_checkpoint
    from ..train.config import build_model, resolve
    from . import MDState, Simulation, kinetic_energy

    mcfg = dict(config.get("md", {}))
    cfg = resolve(config, stats=None)
    model = build_model(cfg["model"])

    # system: a noisy cubic crystal (or positions from an npz file)
    n_atoms = int(mcfg.get("n_atoms", 1000))
    rng = np.random.RandomState(int(mcfg.get("seed", 0)))
    n_types = len(cfg["model"].get("type_names", ["A"]))
    spacing = float(mcfg.get("spacing", 2.2))
    side = int(round(n_atoms ** (1 / 3)))
    n_atoms = side**3
    grid = np.stack(np.meshgrid(*(np.arange(side),) * 3, indexing="ij"), -1).reshape(-1, 3)
    pos = grid * spacing + 0.05 * rng.randn(n_atoms, 3)
    types = rng.randint(0, n_types, n_atoms).astype(np.int32)
    cell = np.eye(3) * side * spacing

    # params: checkpoint if available, else fresh init
    example = {
        keys.POSITIONS: pos[:8],
        keys.ATOM_TYPES: types[:8],
        keys.EDGE_INDEX: np.zeros((2, 4), np.int32),
        keys.EDGE_CELL_SHIFT: np.zeros((4, 3)),
        keys.EDGE_MASK: np.zeros(4, bool),
    }
    params = model.init(int(cfg["model"].get("seed", 0)), example)
    ckpt = mcfg.get("ckpt")
    if ckpt:
        trainer = Trainer(model)

        class _T:  # template
            pass

        t = _T()
        t.params = params
        t.ema_params = params
        t.opt_state = trainer.optimizer.init(params)
        t.step = 0
        state = load_checkpoint(ckpt, mcfg.get("ckpt_name", "best"), template=t)
        params = state.ema_params

    # multi-chip strategy (config: md.strategy = edge_shard | slab | brick,
    # md.mesh_shape = [Dx, Dy, Dz] for brick); default single-device
    import jax

    strategy = str(mcfg.get("strategy", "edge_shard"))
    mesh = None
    if strategy == "slab":
        devs = np.array(jax.devices())
        mesh = jax.sharding.Mesh(devs, ("dp",))
    elif strategy == "brick":
        shape = tuple(int(s) for s in mcfg.get("mesh_shape", [len(jax.devices()), 1, 1]))
        devs = np.array(jax.devices()[: int(np.prod(shape))]).reshape(shape)
        mesh = jax.sharding.Mesh(devs, ("bx", "by", "bz")[: len(shape)])
    sim = Simulation(
        model,
        params,
        atom_types=types,
        masses=np.ones(n_types) * float(mcfg.get("mass", 1.0)),
        r_max=float(cfg["model"]["r_max"]),
        dt=float(mcfg.get("dt", 1e-3)),
        cell=cell,
        pbc=(True, True, True),
        skin=float(mcfg.get("skin", 0.4)),
        steps_per_block=int(mcfg.get("steps_per_block", 20)),
        langevin_gamma=mcfg.get("langevin_gamma"),
        langevin_kT=float(mcfg.get("langevin_kT", 0.0)),
        mesh=mesh,
        strategy=strategy,
    )
    v0 = rng.randn(n_atoms, 3) * float(mcfg.get("v0", 0.05))
    st = MDState(pos, v0)
    log = []

    traj = []
    dump = bool(mcfg.get("dump_trajectory", False))

    def cb(s, e_pot):
        ke = kinetic_energy(s.velocities, sim.masses_per_atom)
        log.append({"step": s.step, "e_pot": e_pot, "e_kin": ke, "e_tot": e_pot + ke})
        print(f"step {s.step}: E_pot={e_pot:.6f} E_kin={ke:.6f} E_tot={e_pot + ke:.6f}")
        if dump:
            traj.append(
                {
                    keys.POSITIONS: s.positions.copy(),
                    keys.ATOM_TYPES: types,
                    keys.CELL: cell,
                    keys.PBC: np.ones(3, bool),
                }
            )

    st = sim.run(st, int(mcfg.get("n_steps", 100)), callback=cb)
    os.makedirs(workdir, exist_ok=True)
    with open(os.path.join(workdir, "md_log.json"), "w") as f:
        json.dump(log, f)
    if traj:
        from ..data.xyz import write_extxyz

        write_extxyz(
            os.path.join(workdir, "trajectory.extxyz"),
            traj,
            type_names=cfg["model"].get("type_names"),
        )
        print(f"trajectory written: {os.path.join(workdir, 'trajectory.extxyz')}")
    print(
        f"MD done: {st.step} steps, {sim.rebuilds} neighbor rebuilds, "
        f"{sim.recompiles} bucket growths"
    )
    return st
