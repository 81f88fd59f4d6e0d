"""Chained-timing comparison of full force steps across TP backends, plus an
energy-only forward and a no-TP ablation, on the real chip.

Usage: python scripts/profile_model.py [n_atoms] [backends...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from allegro_tpu.data import batch_frames, keys, to_jax
from allegro_tpu.data.neighborlist import neighbor_list
from allegro_tpu.model import AllegroModel

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
BACKENDS = [a for a in sys.argv[2:] if not a.startswith("-")] or [
    "einsum_direct", "einsum", "pallas", "fused", "fused_infer",
]
ITERS = 10

rng = np.random.RandomState(0)
side = int(round(N ** (1 / 3)))
N = side**3
spacing = 2.2
grid = (
    np.stack(np.meshgrid(*(np.arange(side),) * 3, indexing="ij"), axis=-1)
    .reshape(-1, 3)
    .astype(np.float64)
)
pos = grid * spacing + 0.1 * rng.randn(N, 3)
frame = {
    keys.POSITIONS: pos,
    keys.ATOM_TYPES: rng.randint(0, 3, N).astype(np.int32),
    keys.CELL: np.eye(3) * (side * spacing),
    keys.PBC: np.ones(3, dtype=bool),
}
frame = neighbor_list(frame, 4.0)
E = frame[keys.EDGE_INDEX].shape[1]
print(f"N={N} E={E} device={jax.devices()[0]}")
batch = to_jax(batch_frames([frame], n_frames=1), dtype=np.float32)

kw = dict(
    r_max=4.0, type_names=["A", "B", "C"], l_max=2, parity=True, num_layers=2,
    num_scalar_features=64, num_tensor_features=32, avg_num_neighbors=E / N,
    per_type_energy_scales=1.0, per_type_energy_shifts=0.0, model_dtype="float32",
)


def device_time(name, fn, *args, iters=ITERS):
    @jax.jit
    def loop(s0, args):
        def body(i, s):
            out = fn(*jax.tree.map(lambda a: _perturb(a, s), args))
            tot = sum(
                (leaf.astype(jnp.float32) ** 2).sum()
                for leaf in jax.tree.leaves(out)
                if jnp.issubdtype(leaf.dtype, jnp.floating)
            )
            return tot * 1e-30

        return jax.lax.fori_loop(0, iters, body, s0)

    def _perturb(a, s):
        if jnp.issubdtype(a.dtype, jnp.floating):
            return a + s.astype(a.dtype)
        return a

    s = loop(jnp.float32(0.0), args)
    jax.block_until_ready(s)
    best = float("inf")
    for trial in (1.0, 2.0):
        t0 = time.perf_counter()
        s = loop(jnp.float32(trial * 1e-9), args)
        jax.block_until_ready(s)
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    print(f"{name:44s} {best:8.3f} ms   ({best / N * 1e3:6.2f} us/atom)")
    return best


params = None
for backend in BACKENDS:
    model = AllegroModel(**kw, tp_kernel_backend=backend)
    if params is None:
        params = model.init(0, batch)

    def force(p, b_pos):
        b = dict(batch)
        b[keys.POSITIONS] = b_pos
        out = model.apply_with_derivatives(p, b)
        return out[keys.FORCES]

    def energy(p, b_pos):
        b = dict(batch)
        b[keys.POSITIONS] = b_pos
        out = model.apply(p, b)
        return out[keys.TOTAL_ENERGY]

    device_time(f"{backend:14s} energy fwd", energy, params, batch[keys.POSITIONS])
    device_time(f"{backend:14s} force step", force, params, batch[keys.POSITIONS])
