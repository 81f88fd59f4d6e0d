"""Exact multi-chip communication accounting at the 100k-atom headline scale.

Builds the slab and brick decompositions of the bench's 100k-atom crystal
over an 8-device virtual CPU mesh (decomposition construction is host-side
numpy — the numbers are exact regardless of device backend) and prints one
JSON line per configuration: ghost fractions, per-step halo bytes, collective
counts, and the v5p-8 projection (VERDICT r3 #5; reference scaling anchor:
pair_allegro's MPI decomposition, ``/root/reference/README.md:43-45``).

Usage: python scripts/multichip_accounting.py [n_atoms]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path = [p for p in sys.path if ".axon_site" not in p]
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402

from allegro_tpu.bench import _crystal_frame  # noqa: E402
from allegro_tpu.data import keys  # noqa: E402
from allegro_tpu.parallel import BrickDecomposition, SlabDecomposition  # noqa: E402
from allegro_tpu.parallel.accounting import (  # noqa: E402
    decomposition_accounting,
    project_step,
)

# measured single-chip coefficients (BENCH_r04: hbm_model_GB / n_edges at the
# 4k f32 flagship, roofline_frac from the same run) — override via env to
# re-project from a fresh bench JSON
HBM_BYTES_PER_EDGE = float(os.environ.get("ACCT_HBM_BYTES_PER_EDGE", "34700"))
ROOFLINE_FRAC = float(os.environ.get("ACCT_ROOFLINE_FRAC", "0.71"))


def main(n_atoms=100000, r_max=4.0):
    frame, n_atoms = _crystal_frame(n_atoms, r_max)
    pos = np.asarray(frame[keys.POSITIONS])
    types = np.asarray(frame[keys.ATOM_TYPES])
    cell = np.asarray(frame[keys.CELL])
    devs = np.array(jax.devices("cpu")[:8])

    slab_mesh = jax.sharding.Mesh(devs, ("dd",))
    brick_mesh = jax.sharding.Mesh(devs.reshape(2, 2, 2), ("bx", "by", "bz"))

    results = []
    for name, dd in (
        ("slab", SlabDecomposition(pos, types, cell, (True,) * 3, r_max, slab_mesh)),
        ("brick", BrickDecomposition(pos, types, cell, (True,) * 3, r_max, brick_mesh)),
    ):
        acct = decomposition_accounting(dd)
        acct["projection_v5p8"] = project_step(
            acct, HBM_BYTES_PER_EDGE, chip="v5p", roofline_frac=ROOFLINE_FRAC
        )
        acct["projection_v5e8"] = project_step(
            acct, HBM_BYTES_PER_EDGE, chip="v5e", roofline_frac=ROOFLINE_FRAC
        )
        results.append(acct)
        print(json.dumps(acct))
    return results


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 100000)
