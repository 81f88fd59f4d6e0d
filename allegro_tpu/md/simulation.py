"""MD simulation driver: jitted integrators + host re-neighboring.

Architecture (TPU-first re-design of the LAMMPS/pair_allegro MD step,
SURVEY.md §3.4):

- The inner loop — velocity Verlet (+ optional Langevin thermostat) against
  the model's forces — is ONE jitted function running ``steps_per_block``
  steps via ``lax.scan`` on device, with a *fixed* neighbor list.
- The neighbor list is built on the host with a skin margin
  (``r_max + skin``) and is re-used until any atom has moved more than
  ``skin/2``; rebuilds pad into *sticky bucket* sizes (grow-only, rounded to
  ``edge_multiple``) so the jitted step never sees a new shape → zero
  recompiles across the run (SURVEY.md §7.3 bucket note).
- Multi-chip: the padded edge set is split evenly across a device mesh
  ('dp' axis); every device holds the full (replicated) positions, computes
  the energy of its edge shard, and XLA all-reduces the force contributions
  over ICI. Strict locality makes this exact — the same property
  pair_allegro's MPI decomposition exploits (``allegro/_compile.py:28-63``).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data import keys, round_up, to_jax
from ..data.neighborlist import primitive_neighbor_list


@dataclasses.dataclass
class MDState:
    positions: np.ndarray  # [N, 3]
    velocities: np.ndarray  # [N, 3]
    step: int = 0


def kinetic_energy(velocities, masses) -> float:
    v = np.asarray(velocities)
    return float(0.5 * (np.asarray(masses)[:, None] * v * v).sum())


def temperature(velocities, masses, k_B: float = 1.0) -> float:
    n = len(velocities)
    return 2.0 * kinetic_energy(velocities, masses) / (3.0 * n * k_B)


def maxwell_boltzmann_velocities(
    masses_per_atom: np.ndarray,
    kT: float,
    seed: int = 0,
    zero_momentum: bool = True,
) -> np.ndarray:
    """Draw initial velocities at temperature ``kT`` (units with k_B = 1)."""
    rng = np.random.RandomState(seed)
    m = np.asarray(masses_per_atom, dtype=np.float64)[:, None]
    v = rng.randn(len(m), 3) * np.sqrt(kT / m)
    if zero_momentum:
        p = (m * v).sum(axis=0) / m.sum()
        v = v - p
    return v


class Simulation:
    def __init__(
        self,
        model,
        params,
        atom_types: np.ndarray,
        masses: np.ndarray,  # per-type masses
        r_max: float,
        dt: float = 1e-3,
        cell: Optional[np.ndarray] = None,
        pbc=(False, False, False),
        skin: float = 0.5,
        steps_per_block: int = 10,
        edge_multiple: int = 1024,
        mesh: Optional[jax.sharding.Mesh] = None,
        dtype=np.float32,
        langevin_gamma: Optional[float] = None,
        langevin_kT: float = 0.0,
        seed: int = 0,
        strategy: str = "edge_shard",  # or "slab": spatial domain decomposition
        per_edge_type_cutoff: Optional[np.ndarray] = None,  # [T, T] <= r_max
    ):
        self.model = model
        self.params = params
        self.types = np.asarray(atom_types, dtype=np.int32)
        self.n_atoms = len(self.types)
        self.masses_per_atom = np.asarray(masses, dtype=np.float64)[self.types]
        self.r_max = float(r_max)
        self.skin = float(skin)
        # per-(center,neighbor)-type cutoff matrix: edges longer than their
        # type pair's cutoff are dropped at (re-)neighboring, matching the
        # training-time neighbor list (reference EdgeLengthNormalizer role,
        # allegro/model/allegro_models.py:153-157)
        if per_edge_type_cutoff is not None:
            per_edge_type_cutoff = np.asarray(per_edge_type_cutoff, np.float64)
            assert (per_edge_type_cutoff <= r_max + 1e-12).all()
        self.per_edge_type_cutoff = per_edge_type_cutoff
        self.dt = float(dt)
        self.cell = None if cell is None else np.asarray(cell, dtype=np.float64).reshape(3, 3)
        self.pbc = np.asarray(pbc, dtype=bool)
        self.steps_per_block = int(steps_per_block)
        self.edge_multiple = int(edge_multiple)
        self.dtype = dtype
        self.langevin_gamma = langevin_gamma
        self.langevin_kT = float(langevin_kT)
        self._rng_key = jax.random.PRNGKey(seed)
        if mesh is None:
            mesh = jax.sharding.Mesh(np.array(jax.devices()[:1]), ("dp",))
        self.mesh = mesh
        self.n_dev = int(np.prod(mesh.devices.shape))
        self.strategy = strategy
        if strategy not in ("edge_shard", "slab", "brick"):
            raise ValueError(f"unknown MD strategy {strategy}")
        if strategy == "brick":
            assert len(mesh.axis_names) <= 3, "brick mesh has at most 3 axes"
        self._edge_bucket = 0
        self._block_fn = None
        self._ref_positions: Optional[np.ndarray] = None
        self._static: Dict = {}
        self.recompiles = 0
        self.rebuilds = 0
        # Constant per-atom energy (type shifts): with edge shards replicated
        # over D devices the model would count it D times — compute it once
        # (all edges masked) and subtract (D-1)x in the energy.
        self._e_const = self._compute_e_const()

    def _compute_e_const(self) -> float:
        data = {
            keys.POSITIONS: jnp.zeros((self.n_atoms, 3), self.dtype),
            keys.ATOM_TYPES: jnp.asarray(self.types),
            keys.EDGE_INDEX: jnp.zeros((2, 2), jnp.int32),
            keys.EDGE_CELL_SHIFT: jnp.zeros((2, 3), self.dtype),
            keys.EDGE_MASK: jnp.zeros(2, bool),
        }
        out = self.model.apply(self.params, data)
        return float(out[keys.TOTAL_ENERGY].sum())

    # --- neighbor management ---
    def _needs_rebuild(self, positions: np.ndarray) -> bool:
        if self._ref_positions is None:
            return True
        disp = positions - self._ref_positions
        return bool((np.linalg.norm(disp, axis=1) > 0.5 * self.skin).any())

    def _wrap(self, positions: np.ndarray) -> np.ndarray:
        """Wrap positions into the cell along periodic axes (required for the
        image-enumeration neighbor list to see all neighbors)."""
        if self.cell is None or not self.pbc.any():
            return positions
        frac = positions @ np.linalg.inv(self.cell)
        frac[:, self.pbc] -= np.floor(frac[:, self.pbc])
        return frac @ self.cell

    def _rebuild(self, positions: np.ndarray):
        i, j, shifts = primitive_neighbor_list(
            positions, self.r_max + self.skin, self.cell, self.pbc
        )
        if self.per_edge_type_cutoff is not None and len(i):
            c = self.cell if self.cell is not None else np.zeros((3, 3))
            r = np.linalg.norm(
                positions[j] - positions[i] + shifts @ c, axis=1
            )
            # keep the skin margin per type pair (rebuild-trigger safety)
            keep = r < self.per_edge_type_cutoff[self.types[i], self.types[j]] + self.skin
            i, j, shifts = i[keep], j[keep], shifts[keep]
        E = len(i)
        per_dev = round_up(max(-(-E // self.n_dev), 1), self.edge_multiple)
        bucket = per_dev * self.n_dev
        if bucket > self._edge_bucket:
            if self._edge_bucket:
                self.recompiles += 1
            self._edge_bucket = bucket
            self._block_fn = None  # force re-jit at the new bucket size
        bucket = self._edge_bucket
        order = np.argsort(i, kind="stable")
        i, j, shifts = i[order], j[order], shifts[order]
        # sentinel padding (out-of-range atom id): dropped by segment-sums,
        # clipped by gathers, and keeps center-sorted order through the pads
        # (required by the fused kernel backend's rank-space block plan)
        eidx = np.full((2, bucket), self.n_atoms, dtype=np.int32)
        eidx[0, :E], eidx[1, :E] = i, j
        sh = np.zeros((bucket, 3))
        sh[:E] = shifts
        mask = np.zeros(bucket, dtype=bool)
        mask[:E] = True
        D = self.n_dev
        static = {
            keys.ATOM_TYPES: self.types,
            keys.EDGE_INDEX: eidx.reshape(2, D, bucket // D).transpose(1, 0, 2),
            keys.EDGE_CELL_SHIFT: sh.reshape(D, bucket // D, 3),
            keys.EDGE_MASK: mask.reshape(D, bucket // D),
        }
        # position-independent per-edge statics: recomputed only here (at
        # re-neighboring), not inside every jitted MD step
        num_types = len(self.model.config["type_names"])
        ct = self.types[np.clip(eidx[0], 0, self.n_atoms - 1)]
        nt = self.types[np.clip(eidx[1], 0, self.n_atoms - 1)]
        static[keys.EDGE_TYPE] = (
            (ct * num_types + nt).astype(np.int32).reshape(D, bucket // D)
        )
        backend = (self.model.builder_kwargs or {}).get("tp_kernel_backend")
        if backend in ("fused", "fused_infer"):
            from ..nn.allegro import FUSED_BLOCK_EDGES, WINDOW_ROWS
            from ..ops.fused_tp import make_block_plan_np

            # mirror Model.precompute_statics: the plan's eb/wr come from the
            # MODEL's builder kwargs, not the process default — otherwise a
            # flagship model (eb=512/wr=64) fails AllegroLayers' plan shape
            # check and silently re-derives a classic plan in-graph every MD
            # step (correct output, ~0.5 ms/step wasted; ADVICE r4)
            bk = self.model.builder_kwargs or {}
            _EB = bk.get("fused_block_edges") or FUSED_BLOCK_EDGES
            wr = bk.get("window_rows")
            if wr is None:
                wr = WINDOW_ROWS
            if wr and not (0 < wr < _EB):
                wr = None
            if D != 1:
                wr = None  # narrow-window statics are single-shard only
            centers_sh = eidx[0].reshape(D, bucket // D)
            wins, offss = [], []
            for d in range(D):
                w, o, _ = make_block_plan_np(centers_sh[d], _EB, self.n_atoms)
                wins.append(w)
                offss.append(o)
            if wr:
                try:
                    w_n, o_n, _ = make_block_plan_np(
                        centers_sh[0], _EB, self.n_atoms, wr=wr
                    )
                    # classic twin plan rides the *_EB keys for the center
                    # ops (lane-axis wr<128 blocks are tile-illegal on TPU);
                    # leading shard axis (D==1) stripped by the step's vmap
                    static[keys.FUSED_OFFS_EB] = offss[0][None]
                    static[keys.FUSED_WIN_EB] = wins[0][None]
                    static[keys.FUSED_WR] = np.zeros((1, wr), np.int32)
                    wins, offss = [w_n], [o_n]
                except ValueError:
                    wr = None  # edge distribution rejects the narrow plan
            static[keys.FUSED_WIN] = np.stack(wins)
            static[keys.FUSED_OFFS] = np.stack(offss)
            if D == 1 and E and np.array_equal(
                np.unique(i), np.arange(int(i.max()) + 1)
            ):
                static[keys.CENTER_RANK_IDENTITY] = np.ones((1,), bool)
            if D == 1 and E:
                # neighbor-sorted twin plan (see Model.precompute_statics) —
                # always classic wr = eb (center ops)
                Ep1 = -(-bucket // _EB) * _EB
                nbr_p = np.concatenate(
                    [eidx[1], np.full(Ep1 - bucket, self.n_atoms, np.int32)]
                ).astype(np.int64)
                order2 = np.argsort(nbr_p, kind="stable").astype(np.int32)
                w2, o2, _ = make_block_plan_np(nbr_p[order2], _EB, self.n_atoms)
                inv2 = np.empty_like(order2)
                inv2[order2] = np.arange(Ep1, dtype=np.int32)
                static[keys.FUSED_OFFS_NBR] = o2[None]
                static[keys.FUSED_WIN_NBR] = w2[None]
                static[keys.NBR_PERM] = order2[None]
                static[keys.NBR_PERM_INV] = inv2[None]
                if np.array_equal(np.unique(j), np.arange(int(j.max()) + 1)):
                    static[keys.NBR_RANK_IDENTITY] = np.ones((1,), bool)
        if self.cell is not None:
            static[keys.CELL] = np.broadcast_to(self.cell[None], (1, 3, 3))
            static[keys.PBC] = self.pbc[None]
        self._static = to_jax(static, dtype=self.dtype)
        self._ref_positions = positions.copy()
        self.rebuilds += 1

    # --- compiled block step ---
    def _make_block_fn(self):
        model = self.model
        params = self.params
        dt = self.dt
        inv_m = jnp.asarray(1.0 / self.masses_per_atom, dtype=self.dtype)[:, None]
        n_atoms = self.n_atoms
        steps = self.steps_per_block
        gamma = self.langevin_gamma
        kT = self.langevin_kT
        e_const = jnp.asarray(self._e_const, dtype=self.dtype)
        masses = jnp.asarray(self.masses_per_atom, dtype=self.dtype)[:, None]
        P = jax.sharding.PartitionSpec
        data_sh = jax.sharding.NamedSharding(self.mesh, P("dp"))
        rep_sh = jax.sharding.NamedSharding(self.mesh, P())

        def energy(pos, static):
            def row(shard):
                data = {
                    keys.POSITIONS: pos,
                    keys.ATOM_TYPES: shard[keys.ATOM_TYPES],
                    keys.EDGE_INDEX: shard[keys.EDGE_INDEX],
                    keys.EDGE_CELL_SHIFT: shard[keys.EDGE_CELL_SHIFT],
                    keys.EDGE_MASK: shard[keys.EDGE_MASK],
                }
                if keys.CELL in shard:
                    data[keys.CELL] = shard[keys.CELL]
                    data[keys.PBC] = shard[keys.PBC]
                for k in (
                    keys.EDGE_TYPE,
                    keys.FUSED_OFFS,
                    keys.FUSED_WIN,
                    keys.FUSED_WR,
                    keys.FUSED_OFFS_EB,
                    keys.FUSED_WIN_EB,
                    keys.CENTER_RANK_IDENTITY,
                    keys.FUSED_OFFS_NBR,
                    keys.FUSED_WIN_NBR,
                    keys.NBR_PERM,
                    keys.NBR_PERM_INV,
                    keys.NBR_RANK_IDENTITY,
                ):
                    if k in shard:
                        data[k] = shard[k]
                out = model.apply(params, data)
                return out[keys.TOTAL_ENERGY].sum()

            # edge shards on the leading axis; positions replicated.
            per_shard = jax.vmap(
                row,
                in_axes=(
                    {
                        k: (None if k in (keys.ATOM_TYPES, keys.CELL, keys.PBC) else 0)
                        for k in static
                    },
                ),
            )(static)
            # per-atom constant (type shifts) is counted once per shard
            n_shards = per_shard.shape[0]
            return per_shard.sum() - (n_shards - 1) * e_const

        force_fn = jax.grad(energy, argnums=0)

        def block(pos, vel, static, key):
            def one_step(carry, _):
                pos, vel, f, key = carry
                vel = vel + (0.5 * dt) * f * inv_m
                pos = pos + dt * vel
                f = -force_fn(pos, static)
                vel = vel + (0.5 * dt) * f * inv_m
                if gamma is not None:
                    key, sub = jax.random.split(key)
                    c1 = jnp.exp(-gamma * dt)
                    sigma = jnp.sqrt(kT * (1 - c1**2) / masses).astype(pos.dtype)
                    noise = jax.random.normal(sub, vel.shape, dtype=pos.dtype)
                    vel = c1 * vel + sigma * noise
                return (pos, vel, f, key), None

            f0 = -force_fn(pos, static)
            (pos, vel, f, key), _ = jax.lax.scan(
                one_step, (pos, vel, f0, key), None, length=steps
            )
            e_pot = energy(pos, static)
            return pos, vel, e_pot, key

        static_ax = {
            k: (rep_sh if k in (keys.ATOM_TYPES, keys.CELL, keys.PBC) else data_sh)
            for k in self._static
        }
        return jax.jit(
            block,
            in_shardings=(rep_sh, rep_sh, static_ax, rep_sh),
            out_shardings=(rep_sh, rep_sh, rep_sh, rep_sh),
        )

    # --- spatial domain-decomposition strategies (slab / brick) ---
    def _run_slab(self, state: MDState, n_steps: int, callback: Optional[Callable]) -> MDState:
        """MD with true spatial decomposition: each device integrates its own
        slab's/brick's atoms; ghost positions ride ppermute halos every force
        call (the pair_allegro MPI-timestep analogue, SURVEY.md §3.4; brick =
        LAMMPS 3-D processor-grid role). Atoms migrate between domains at
        re-decomposition time (host)."""
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel import BrickDecomposition, SlabDecomposition

        brick = self.strategy == "brick"

        def _build(pos, mins):
            common = dict(
                skin=self.skin,
                edge_multiple=self.edge_multiple,
                dtype=np.float64 if self.dtype == np.float64 else np.float32,
                min_owned_pad=mins["No"],
                min_edges_pad=mins["El"],
            )
            if brick:
                return BrickDecomposition(
                    pos, self.types, self.cell, self.pbc, self.r_max,
                    self.mesh, min_send_pad=mins["S"], **common,
                )
            return SlabDecomposition(
                pos, self.types, self.cell, self.pbc, self.r_max,
                self.mesh, min_send_pad=mins["S"], **common,
            )

        def _sizes(dd):
            return (dd.No, tuple(dd.S) if brick else dd.S, dd.El)

        pos = np.asarray(state.positions, dtype=np.float64)
        vel = np.asarray(state.velocities, dtype=np.float64)
        dt = self.dt
        steps = self.steps_per_block
        empty = {"No": 0, "S": (0, 0, 0) if brick else 0, "El": 0}
        mins = getattr(self, "_slab_mins", empty)
        done = 0
        dd = None
        block_fn = getattr(self, "_slab_block_fn", None)
        inv_m_j = None
        while done < n_steps:
            if dd is None or self._needs_rebuild(pos):
                pos = self._wrap(pos)
                dd = _build(pos, mins)
                self.rebuilds += 1
                if _sizes(dd) != (mins["No"], mins["S"], mins["El"]):
                    if mins["No"]:
                        self.recompiles += 1
                    mins = {"No": dd.No, "S": _sizes(dd)[1], "El": dd.El}
                    self._slab_mins = mins
                    block_fn = None
                self._ref_positions = pos.copy()
                masses_local = np.zeros((dd.D, dd.No, 1))
                for d_, idx in enumerate(dd.owned):
                    masses_local[d_, : len(idx), 0] = self.masses_per_atom[idx]
                inv_m = np.zeros_like(masses_local)
                np.divide(1.0, masses_local, out=inv_m, where=masses_local > 0)
                dtp = dd.arrays["own_pos"].dtype
                mshape = tuple(int(s) for s in self.mesh.devices.shape)
                inv_m_j = jnp.asarray(inv_m.reshape(mshape + (dd.No, 1)), dtp)
                if block_fn is None:
                    # one compiled block serves all same-shape rebuilds: the
                    # halo/edge arrays and masses are ARGUMENTS, not constants
                    raw = dd.make_energy_forces_fn(
                        self.model, self.params, jit=False, bind_arrays=False
                    )

                    def block(pos_l, vel_l, arrays, inv_m_a):
                        def one(carry, _):
                            p, v, f = carry
                            v = v + (0.5 * dt) * f * inv_m_a
                            p = p + dt * v
                            _, f = raw(p, arrays)
                            v = v + (0.5 * dt) * f * inv_m_a
                            return (p, v, f), None

                        _, f0 = raw(pos_l, arrays)
                        (p, v, f), _ = jax.lax.scan(
                            one, (pos_l, vel_l, f0), None, length=steps
                        )
                        e_pot, _ = raw(p, arrays)
                        return p, v, e_pot

                    sh = NamedSharding(self.mesh, P(*self.mesh.axis_names))
                    rep = NamedSharding(self.mesh, P())
                    arr_sh = {k: sh for k in dd.arrays}
                    block_fn = jax.jit(
                        block,
                        in_shardings=(sh, sh, arr_sh, sh),
                        out_shardings=(sh, sh, rep),
                    )
                    self._slab_block_fn = block_fn
            p_l, v_l, e_pot = block_fn(
                jnp.asarray(dd.scatter_positions(pos, wrap=False)),
                jnp.asarray(dd.scatter_vectors(vel)),
                dd.arrays,
                inv_m_j,
            )
            pos = dd.gather_positions(np.asarray(jax.device_get(p_l)))
            vel = dd.gather_vectors(np.asarray(jax.device_get(v_l)))
            done += steps
            state = MDState(pos, vel, state.step + steps)
            if callback is not None:
                callback(state, float(e_pot))
        return state

    # --- public API ---
    def run(self, state: MDState, n_steps: int, callback: Optional[Callable] = None) -> MDState:
        if self.strategy in ("slab", "brick"):
            return self._run_slab(state, n_steps, callback)
        pos = np.asarray(state.positions, dtype=np.float64)
        vel = np.asarray(state.velocities, dtype=np.float64)
        done = 0
        while done < n_steps:
            if self._needs_rebuild(pos):
                pos = self._wrap(pos)
                self._rebuild(pos)
            if self._block_fn is None:
                self._block_fn = self._make_block_fn()
            p, v, e_pot, self._rng_key = self._block_fn(
                jnp.asarray(pos, self.dtype),
                jnp.asarray(vel, self.dtype),
                self._static,
                self._rng_key,
            )
            pos = np.asarray(jax.device_get(p), dtype=np.float64)
            vel = np.asarray(jax.device_get(v), dtype=np.float64)
            done += self.steps_per_block
            state = MDState(pos, vel, state.step + self.steps_per_block)
            if callback is not None:
                callback(state, float(e_pot))
        return state
