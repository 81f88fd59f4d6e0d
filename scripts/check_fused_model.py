"""End-to-end fused-backend check on the real chip: energies+forces vs einsum.

Usage: python scripts/check_fused_model.py [n_atoms]
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

N = int(sys.argv[1]) if len(sys.argv) > 1 else 512
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
print(f"N={N} E={E} ({E/N:.1f}/atom) device={jax.devices()[0]}")
batch = to_jax(batch_frames([frame], n_frames=1), dtype=np.float32)

kw = dict(
    r_max=4.0, type_names=["A", "B", "C"], l_max=2, parity=True, num_layers=2,
    num_scalar_features=64, num_tensor_features=32, avg_num_neighbors=E / N,
    per_type_energy_scales=1.0, per_type_energy_shifts=0.0, model_dtype="float32",
)

ref = AllegroModel(**kw, tp_kernel_backend="einsum_direct")
params = ref.init(0, batch)
out_ref = jax.jit(lambda p, b: ref.apply_with_derivatives(p, b))(params, batch)
f_ref = np.asarray(out_ref[keys.FORCES], np.float64)
e_ref = float(out_ref[keys.TOTAL_ENERGY].sum())
print(f"einsum_direct: E={e_ref:.6f}")

for backend in ("fused", "fused_infer"):
    m = AllegroModel(**kw, tp_kernel_backend=backend)
    t0 = time.time()
    out = jax.jit(lambda p, b: m.apply_with_derivatives(p, b))(params, batch)
    f = np.asarray(out[keys.FORCES], np.float64)
    e = float(out[keys.TOTAL_ENERGY].sum())
    fe = np.abs(f - f_ref).max()
    rel = fe / (np.abs(f_ref).max() + 1e-30)
    print(
        f"{backend:12s}: E={e:.6f} dE={abs(e - e_ref):.2e} "
        f"dF={fe:.2e} (rel {rel:.2e})  compile+run {time.time()-t0:.1f}s"
    )
