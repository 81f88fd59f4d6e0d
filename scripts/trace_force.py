"""Full per-op device-time table of the flagship force step (top-40),
beyond the top-10 recorded in the bench JSON. Real chip.

Usage: python scripts/trace_force.py [n_atoms] [top_k]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("BENCH_PRECISION", "high")

import jax
import jax.numpy as jnp

from allegro_tpu.bench import _crystal_frame, _flagship_model
from allegro_tpu.data import keys
from allegro_tpu.ops import fused_tp as _ft
from allegro_tpu.utils.chiplock import chip_lock
from allegro_tpu.utils.traceops import capture_step_breakdown

N_ATOMS = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
TOP_K = int(sys.argv[2]) if len(sys.argv) > 2 else 40

_ft.set_onehot_passes(int(os.environ.get("ALLEGRO_ONEHOT_PASSES", "2")))


def main():
    # _crystal_frame returns (frame, n_atoms) — the edge count comes from the
    # frame's neighbor list (ADVICE r4: unpacking the second value as n_edges
    # made avg_num_neighbors = 1.0, mis-normalizing the traced model)
    batch, n_atoms = _crystal_frame(N_ATOMS, 4.0)
    n_edges = batch[keys.EDGE_INDEX].shape[1]
    model = _flagship_model(n_edges / n_atoms, "fused_infer", 4.0)
    batch = model.precompute_statics(batch)
    params = model.init(0, batch)

    @jax.jit
    def force_step(params, batch, d):
        b = dict(batch)
        b[keys.POSITIONS] = batch[keys.POSITIONS] + d
        out = model.apply_with_derivatives(params, b)
        return 1e-4 * out[keys.FORCES]

    d = jnp.zeros_like(batch[keys.POSITIONS])
    d = force_step(params, batch, d)
    _ = float(d.sum())

    def run_steps(n):
        nonlocal d
        for _ in range(n):
            d = force_step(params, batch, d)
        _ = float(d.sum())

    info = capture_step_breakdown(run_steps, iters=10, top_k=TOP_K)
    print(f"device_ms_per_step: {info['device_ms_per_step']}")
    print("categories:", info["categories"])
    cum = 0.0
    for name, ms, pct in info["top_ops"]:
        cum += pct
        print(f"  {ms:8.4f} ms  {pct:5.1f}%  (cum {cum:5.1f}%)  {name}")


if __name__ == "__main__":
    with chip_lock(timeout=3600):
        main()
