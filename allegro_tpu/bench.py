"""Benchmark: MD-step force inference throughput on the flagship model.

(Repo-root shim lives in bench.py; this module is the implementation.)

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "us/atom/step", "vs_baseline": N}

The headline metric is µs/atom per MD force call (energy+forces) at float32 —
the BASELINE.md north-star metric (< 1 µs/atom/step target on v5p-8; this
runs on whatever single chip is available).
"""

import json
import os
import sys
import time

import numpy as np


def run_benchmark_stage(config, workdir):
    """CLI stage wrapper: `python -m allegro_tpu benchmark -c config.yaml`."""
    bcfg = dict(config.get("benchmark", {}))
    result = run_benchmark(
        n_atoms=int(bcfg.get("n_atoms", 4096)),
        r_max=float(bcfg.get("r_max", 4.0)),
        backend=bcfg.get("tp_kernel_backend", "einsum_direct"),
        verbose=True,
    )
    print(json.dumps(result))
    return result


def run_benchmark(n_atoms=4096, r_max=4.0, iters=20, warmup=3, verbose=False, backend=None):
    import jax

    from allegro_tpu.data import batch_frames, keys, to_jax
    from allegro_tpu.data.neighborlist import neighbor_list
    from allegro_tpu.model import AllegroModel

    rng = np.random.RandomState(0)
    side = int(round(n_atoms ** (1 / 3)))
    n_atoms = side**3
    spacing = 2.2
    grid = (
        np.stack(np.meshgrid(*(np.arange(side),) * 3, indexing="ij"), axis=-1)
        .reshape(-1, 3)
        .astype(np.float64)
    )
    pos = grid * spacing + 0.1 * rng.randn(n_atoms, 3)
    frame = {
        keys.POSITIONS: pos,
        keys.ATOM_TYPES: rng.randint(0, 3, n_atoms).astype(np.int32),
        keys.CELL: np.eye(3) * (side * spacing),
        keys.PBC: np.ones(3, dtype=bool),
    }
    t0 = time.time()
    frame = neighbor_list(frame, r_max)
    n_edges = frame[keys.EDGE_INDEX].shape[1]
    if verbose:
        print(
            f"neighbor list: {n_edges} edges ({n_edges / n_atoms:.1f}/atom) "
            f"in {time.time() - t0:.1f}s",
            file=sys.stderr,
        )
    batch = to_jax(batch_frames([frame], n_frames=1), dtype=np.float32)

    if backend is None:
        backend = os.environ.get("BENCH_BACKEND")
    if backend is None:
        # einsum_direct is fastest at small scale, but XLA materializes a
        # [E,U,d1,d3] HBM temporary; the fused pallas kernels never do, which
        # is what fits large single-chip systems (measured: 32k atoms is
        # pallas-only on a 16GB chip). Beyond ~50k atoms/chip: slab domain
        # decomposition (allegro_tpu.parallel), as pair_allegro scales by MPI.
        backend = "einsum_direct" if n_atoms <= 20000 else "pallas"
    model = AllegroModel(
        r_max=r_max,
        type_names=["A", "B", "C"],
        l_max=2,
        parity=True,
        num_layers=2,
        num_scalar_features=64,
        num_tensor_features=32,
        avg_num_neighbors=n_edges / n_atoms,
        per_type_energy_scales=1.0,
        per_type_energy_shifts=0.0,
        model_dtype="float32",
        tp_kernel_backend=backend,
    )
    params = model.init(0, batch)

    # NOTE timing methodology: each step's input depends on the previous
    # step's output (like a real MD loop), and a scalar VALUE is fetched at
    # the end — `block_until_ready` is unreliable through remote-tunnel
    # backends, and identical repeated calls can be deduped. This measures
    # amortized per-step device time honestly.
    @jax.jit
    def force_step(params, batch, d):
        b = dict(batch)
        b[keys.POSITIONS] = batch[keys.POSITIONS] + d
        out = model.apply_with_derivatives(params, b)
        return 1e-4 * out[keys.FORCES]

    import jax.numpy as jnp

    d = jnp.zeros_like(batch[keys.POSITIONS])
    t0 = time.time()
    d = force_step(params, batch, d)
    _ = float(d.sum())
    if verbose:
        print(f"compile+first step: {time.time() - t0:.1f}s", file=sys.stderr)
    for _ in range(warmup):
        d = force_step(params, batch, d)
    _ = float(d.sum())
    t0 = time.time()
    for _ in range(iters):
        d = force_step(params, batch, d)
    _ = float(d.sum())  # forces completion of the whole chain
    dt = (time.time() - t0) / iters
    us_per_atom = dt / n_atoms * 1e6
    target = 1.0  # us/atom/step north-star (BASELINE.md)
    return {
        "metric": "md_force_call_us_per_atom",
        "value": round(us_per_atom, 4),
        "unit": "us/atom/step",
        "vs_baseline": round(target / us_per_atom, 4),
        "extra": {
            "n_atoms": int(n_atoms),
            "n_edges": int(n_edges),
            "l_max": 2,
            "num_layers": 2,
            "num_tensor_features": 32,
            "backend": backend,
            "step_ms": round(dt * 1e3, 3),
            "device": str(jax.devices()[0]),
        },
    }


if __name__ == "__main__":
    n = int(os.environ.get("BENCH_N_ATOMS", "4096"))
    result = run_benchmark(n_atoms=n, verbose="-v" in sys.argv)
    print(json.dumps(result))
