"""End-to-end parity check of the native C++ MD driver (allegro_md) vs the
Python Simulation, both running the same .atpu-compatible model on the real
chip via PJRT.

1. builds a small flagship-architecture model + .atpu artifact,
2. runs the C++ driver (libaxon_pjrt.so) for N steps,
3. recovers step-0 forces from the first Verlet displacement and compares to
   model.apply_with_derivatives,
4. compares the final positions against a host-side f64 Verlet loop driven by
   the same model forces.

Usage: python scripts/check_md_driver.py
"""

import json
import os
import subprocess
import sys
import tempfile
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

from allegro_tpu.compile.export import export_model
from allegro_tpu.data import batch_frames, keys, to_jax
from allegro_tpu.data.neighborlist import neighbor_list
from allegro_tpu.model import AllegroModel
from allegro_tpu.native.md_driver import build_md_driver
from allegro_tpu.utils.chiplock import chip_lock

# serialize vs bench/other real-chip users for the whole script (flat script:
# the flock is released at process exit; re-entrant if a wrapper holds it)
_chip_guard = chip_lock(timeout=3600)
_chip_guard.__enter__()

R_MAX = 2.0
SKIN = 0.4
N = 20
N_ATOMS_PAD = 32
N_EDGES_PAD = 1024
DT = 1e-3
STEPS = 50

rng = np.random.RandomState(0)
# compact cluster: ~2 Å spacing grid jittered
grid = np.stack(np.meshgrid(*(np.arange(3),) * 3, indexing="ij"), -1).reshape(-1, 3)[:N]
pos0 = grid * 1.8 + 0.05 * rng.randn(N, 3)
types = rng.randint(0, 2, N).astype(np.int32)
masses = np.where(types == 0, 1.0, 2.0)

model = AllegroModel(
    r_max=R_MAX,
    type_names=["A", "B"],
    l_max=2,
    parity=True,
    num_layers=2,
    num_scalar_features=16,
    num_tensor_features=4,
    avg_num_neighbors=8.0,
    per_type_energy_scales=0.2,
    per_type_energy_shifts=0.0,
    model_dtype="float32",
)
frame = neighbor_list({keys.POSITIONS: pos0, keys.ATOM_TYPES: types}, R_MAX)
data = to_jax(batch_frames([frame], n_frames=1), np.float32)
params = model.init(0, data)

td = tempfile.mkdtemp(prefix="allegro_md_check_")
art = os.path.join(td, "model.atpu")
blob = export_model(model, params, n_atoms=N_ATOMS_PAD, n_edges=N_EDGES_PAD)
open(art, "wb").write(blob)
init = os.path.join(td, "init.npz")
np.savez(
    init,
    positions=pos0.astype(np.float64),
    types=types.astype(np.int32),
    masses=masses.astype(np.float64),
)
print(f"artifact {len(blob)} bytes -> {art}")

binary = build_md_driver()
assert binary, "driver build failed"
env = dict(os.environ)
opts = [
    "--option", "remote_compile=1",
    "--option", "local_only=0",
    "--option", "priority=0",
    "--option", "topology=v5e:1x1x1",
    "--option", "n_slices=1",
    "--option", f"session_id={uuid.uuid4()}",
    "--option", "rank=4294967295",
]
cmd = [
    binary, "--artifact", art, "--plugin", "/opt/axon/libaxon_pjrt.so",
    "--init", init, "--steps", str(STEPS), "--dt", str(DT), "--skin", str(SKIN),
    "--out-prefix", os.path.join(td, "run_"), "--dump-every", "10",
] + opts
print("running:", " ".join(cmd[:6]), "...")
proc = subprocess.run(cmd, env=env, capture_output=True, text=True, timeout=1200)
print(proc.stderr[-2500:])
if proc.returncode != 0:
    print(proc.stdout[-2000:])
    sys.exit(f"driver failed rc={proc.returncode}")
print(proc.stdout.strip())

# --- step-0 force recovery check: run the driver for ONE step from rest ---
cmd1 = [
    binary, "--artifact", art, "--plugin", "/opt/axon/libaxon_pjrt.so",
    "--init", init, "--steps", "1", "--dt", str(DT), "--skin", str(SKIN),
    "--out-prefix", os.path.join(td, "one_"),
] + opts[:-2] + ["--option", f"session_id={uuid.uuid4()}", "--option", "rank=4294967295"]
proc1 = subprocess.run(cmd1, env=env, capture_output=True, text=True, timeout=1200)
if proc1.returncode != 0:
    sys.exit(f"driver 1-step failed: {proc1.stderr[-1500:]}")
x1 = np.load(os.path.join(td, "one_positions.npy"))
f0_driver = 2.0 * masses[:, None] * (x1 - pos0) / DT**2

out_ref = jax.jit(lambda p, b: model.apply_with_derivatives(p, b))(params, data)
f0_model = np.asarray(out_ref[keys.FORCES], np.float64)[:N]
err = np.abs(f0_driver - f0_model).max()
rel = err / (np.abs(f0_model).max() + 1e-30)
print(f"step-0 forces: driver vs model  max_err={err:.3e} rel={rel:.3e}")
assert rel < 1e-4, "force mismatch"

# --- trajectory check vs host-side f64 Verlet with model forces ---
def model_forces(x):
    fr = neighbor_list({keys.POSITIONS: x, keys.ATOM_TYPES: types}, R_MAX + SKIN)
    d = to_jax(
        batch_frames([fr], n_atoms=N_ATOMS_PAD, n_edges=N_EDGES_PAD, n_frames=1),
        np.float32,
    )
    out = jax.jit(lambda p, b: model.apply_with_derivatives(p, b))(params, d)
    return np.asarray(out[keys.FORCES], np.float64)[:N]

x = pos0.copy()
v = np.zeros_like(x)
f = model_forces(x)
for s in range(STEPS):
    x = x + DT * v + 0.5 * DT**2 / masses[:, None] * f
    fn = model_forces(x)
    v = v + 0.5 * DT / masses[:, None] * (f + fn)
    f = fn

x_drv = np.load(os.path.join(td, "run_positions.npy"))
err = np.abs(x_drv - x).max()
print(f"{STEPS}-step trajectory: driver vs python  max_err={err:.3e}")
assert err < 1e-4, "trajectory mismatch"

# ===========================================================================
# periodic crystal: the driver's ghost-atom path (C++ mirror of the
# compile/targets.py conversion — pair_allegro's bread-and-butter workload)
# ===========================================================================
print("--- periodic crystal (ghost-atom path) ---")
SIDE, A0 = 3, 1.8  # nearest neighbor 1.8 < r_max 2.0: edges exist (incl. wrap)
NP_ = SIDE**3
NP_PAD = 192  # reals + ghosts
NE_PAD = 2048
cell = np.eye(3) * (SIDE * A0)
gridp = np.stack(
    np.meshgrid(*(np.arange(SIDE),) * 3, indexing="ij"), -1
).reshape(-1, 3).astype(np.float64)
posp0 = gridp * A0 + 0.55 + 0.05 * rng.randn(NP_, 3)  # well inside the cell
typesp = rng.randint(0, 2, NP_).astype(np.int32)
massesp = np.where(typesp == 0, 1.0, 2.0)
velp0 = 0.05 * rng.randn(NP_, 3)  # real motion: wraps + re-neighboring happen

artp = os.path.join(td, "model_periodic.atpu")
blobp = export_model(model, params, n_atoms=NP_PAD, n_edges=NE_PAD)
open(artp, "wb").write(blobp)
initp = os.path.join(td, "init_periodic.npz")
np.savez(
    initp,
    positions=posp0,
    types=typesp,
    masses=massesp,
    velocities=velp0,
    cell=cell,
    pbc=np.ones(3, np.int32),
)

cmdp = [
    binary, "--artifact", artp, "--plugin", "/opt/axon/libaxon_pjrt.so",
    "--init", initp, "--steps", str(STEPS), "--dt", str(DT), "--skin", str(SKIN),
    "--out-prefix", os.path.join(td, "per_"), "--dump-every", "10",
] + opts[:-2] + ["--option", f"session_id={uuid.uuid4()}", "--option", "rank=4294967295"]
procp = subprocess.run(cmdp, env=env, capture_output=True, text=True, timeout=1200)
print(procp.stderr[-1500:])
if procp.returncode != 0:
    print(procp.stdout[-2000:])
    sys.exit(f"periodic driver failed rc={procp.returncode}")
print(procp.stdout.strip())


def model_forces_periodic(x):
    fr = neighbor_list(
        {keys.POSITIONS: x, keys.ATOM_TYPES: typesp,
         keys.CELL: cell, keys.PBC: np.ones(3, bool)},
        R_MAX + SKIN,
    )
    d = to_jax(
        batch_frames([fr], n_atoms=NP_PAD, n_edges=NE_PAD, n_frames=1),
        np.float32,
    )
    out = jax.jit(lambda p, b: model.apply_with_derivatives(p, b))(params, d)
    return (
        np.asarray(out[keys.FORCES], np.float64)[:NP_],
        float(np.asarray(out[keys.PER_ATOM_ENERGY], np.float64)[:NP_].sum()),
    )


x = posp0.copy()
v = velp0.copy()
f, e0_model = model_forces_periodic(x)
for s in range(STEPS):
    x = x + DT * v + 0.5 * DT**2 / massesp[:, None] * f
    fn, _ = model_forces_periodic(x)
    v = v + 0.5 * DT / massesp[:, None] * (f + fn)
    f = fn

e0_driver = None
for line in procp.stderr.splitlines():
    if "step 0 E=" in line:
        e0_driver = float(line.split("E=")[1])
print(f"step-0 energy: driver {e0_driver:.6f} vs model {e0_model:.6f}")
assert abs(e0_model) > 1e-6, "vacuous periodic check: zero energy (no edges?)"
assert abs(e0_driver - e0_model) < 1e-3 * max(abs(e0_model), 1.0), "energy mismatch"

x_drvp = np.load(os.path.join(td, "per_positions.npy"))
assert np.abs(x - posp0).max() > 1e-4, "vacuous check: nothing moved"
# the driver wraps at re-neighboring; compare via minimum-image displacement
df = (x_drvp - x) @ np.linalg.inv(cell)
df -= np.round(df)
errp = np.abs(df @ cell).max()
v_drvp = np.load(os.path.join(td, "per_velocities.npy"))
errv = np.abs(v_drvp - v).max()
print(f"{STEPS}-step periodic trajectory: max_err={errp:.3e} vel_err={errv:.3e}")
assert errp < 1e-4, "periodic trajectory mismatch"
assert errv < 1e-4, "periodic velocity mismatch"

# virial: driver's fdotr (real+ghost rows) vs the model's strain derivative
# at the shared final state
w_drv = np.load(os.path.join(td, "per_virial.npy"))
fr_fin = neighbor_list(
    {keys.POSITIONS: x_drvp, keys.ATOM_TYPES: typesp,
     keys.CELL: cell, keys.PBC: np.ones(3, bool)},
    R_MAX + SKIN,
)
d_fin = to_jax(
    batch_frames([fr_fin], n_atoms=NP_PAD, n_edges=NE_PAD, n_frames=1), np.float32
)
out_fin = jax.jit(lambda p, b: model.apply_with_derivatives(p, b))(params, d_fin)
w_model = np.asarray(out_fin[keys.VIRIAL], np.float64).reshape(3, 3)
errw = np.abs(w_drv - w_model).max() / max(np.abs(w_model).max(), 1e-10)
print(f"virial: driver fdotr vs model strain-derivative  rel_err={errw:.3e}")
assert errw < 1e-2, "virial mismatch"
print("MD driver parity OK")
