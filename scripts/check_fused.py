"""Correctness check of the fused TP kernels vs a NumPy oracle.

Usage: python scripts/check_fused.py [--interpret]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--interpret" in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import jax.numpy as jnp
import numpy as np

from allegro_tpu.lib.irreps import Irreps
from allegro_tpu.nn.allegro import compute_irreps_ladder
from allegro_tpu.nn.contract import enumerate_instructions, pack_w3j
from allegro_tpu.ops import fused_tp
from allegro_tpu.ops.pallas_contract import sparse_entries

if "--interpret" in sys.argv:
    fused_tp.INTERPRET = True

EB = 256
U = 32
N_ATOMS = 500
E_REAL = 3000

rng = np.random.RandomState(0)

irreps_sh = Irreps("1x0e+1x1o+1x2e")
allowed = Irreps("1x0e+1x0o+1x1e+1x1o+1x2e+1x2o")
ladder = compute_irreps_ladder(irreps_sh, allowed, 2)
ins = enumerate_instructions(ladder[0], irreps_sh, ladder[1])
w3j = pack_w3j(ladder[0], irreps_sh, ladder[1], ins)
entries = sparse_entries(w3j)
P, d1, d2, d3 = w3j.shape
dims = (d1, d2, d3)
print(f"P={P} dims={dims} nnz={len(entries)}")

# centers: skewed distribution with gaps (some atoms edge-less) + sentinel pads
centers_real = np.sort(rng.choice(np.arange(0, N_ATOMS, 2), size=E_REAL))  # gaps!
Ep = -(-E_REAL // EB) * EB
centers = np.concatenate([centers_real, np.full(Ep - E_REAL, N_ATOMS)]).astype(np.int32)
NB = Ep // EB

x = rng.randn(Ep, d1 * U).astype(np.float32)
g = rng.randn(Ep, d3 * U).astype(np.float32)
sh = rng.randn(Ep, d2).astype(np.float32)
n_irr = len(irreps_sh)
wexp = rng.randn(Ep, n_irr * U).astype(np.float32)
wmat = rng.randn(P, U).astype(np.float32)
# zero padded edges (model invariant)
x[E_REAL:] = 0
g[E_REAL:] = 0
sh[E_REAL:] = 0
wexp[E_REAL:] = 0

dim_to_irr = []
for k_, sl in enumerate(irreps_sh.slices()):
    dim_to_irr.extend([k_] * (sl.stop - sl.start))

# ---- numpy oracle ----
neq = centers[1:] != centers[:-1]
ranks = np.concatenate([[0], np.cumsum(neq)]).astype(np.int32)
Na = fused_tp.num_rank_rows(N_ATOMS, EB)

# env build + scatter
env_oracle = np.zeros((Na, d2 * U), np.float64)
for e in range(E_REAL):
    r = ranks[e]
    for j in range(d2):
        env_oracle[r, j * U : (j + 1) * U] += sh[e, j] * wexp[
            e, dim_to_irr[j] * U : (dim_to_irr[j] + 1) * U
        ].astype(np.float64)

# gather + TP
out_oracle = np.zeros((Ep, d3 * U), np.float64)
for i, j, k, p, c in entries:
    xi = x[:, i * U : (i + 1) * U].astype(np.float64)
    ej = env_oracle[ranks][:, j * U : (j + 1) * U]
    out_oracle[:, k * U : (k + 1) * U] += c * wmat[p][None, :] * xi * ej

# TP + scatter (cotangent g): denv[r, jU+u] = sum_e sum c w x_i g_k
denv_oracle = np.zeros((Na, d2 * U), np.float64)
for i, j, k, p, c in entries:
    vals = (
        c
        * wmat[p][None, :]
        * x[:, i * U : (i + 1) * U].astype(np.float64)
        * g[:, k * U : (k + 1) * U].astype(np.float64)
    )
    for e in range(E_REAL):
        denv_oracle[ranks[e], j * U : (j + 1) * U] += vals[e]

# dw
dw_oracle = np.zeros((P, U), np.float64)
for i, j, k, p, c in entries:
    dw_oracle[p] += c * np.sum(
        x[:, i * U : (i + 1) * U].astype(np.float64)
        * env_oracle[ranks][:, j * U : (j + 1) * U]
        * g[:, k * U : (k + 1) * U].astype(np.float64),
        axis=0,
    )

# D: gather-unweight with t = env_oracle (as cotangent), vs sh/wexp
dsh_oracle = np.zeros((Ep, d2), np.float64)
dwexp_oracle = np.zeros((Ep, n_irr * U), np.float64)
t_gathered = env_oracle[ranks]
for j in range(d2):
    irr = dim_to_irr[j]
    dsh_oracle[:, j] = np.sum(
        t_gathered[:, j * U : (j + 1) * U] * wexp[:, irr * U : (irr + 1) * U], axis=1
    )
    dwexp_oracle[:, irr * U : (irr + 1) * U] += (
        t_gathered[:, j * U : (j + 1) * U] * sh[:, j : j + 1]
    )

# ---- kernels ----
cj = jnp.asarray(centers)
win, offs_p = fused_tp.make_block_plan(cj, EB)
xj, gj, shj, wexpj, wj = map(jnp.asarray, (x, g, sh, wexp, wmat))

eA, eB_ = fused_tp.env_scatter_call(
    shj, wexpj, offs_p, win, dim_to_irr=tuple(dim_to_irr), U=U, eb=EB, n_rank_rows=Na
)
env = np.asarray(fused_tp.combine_scatter_outputs(eA, eB_, win, EB), np.float64)
# compare only rows that are ever visited (gather windows)
vis = np.zeros(Na, bool)
w_np = np.asarray(win)
for b in range(NB):
    vis[w_np[b] * EB : (w_np[b] + 2) * EB] = True
err = np.abs(env[vis] - env_oracle[vis]).max()
print(f"env_scatter           max_err={err:.2e}")

envj = jnp.asarray(np.where(vis[:, None], env, 0.0).astype(np.float32))
# the two window specs index the SAME env array at win and win+1
out = fused_tp.gather_tp_call(
    xj, envj, envj, wj, offs_p, win, entries=entries, dims=dims, U=U, eb=EB
)
err = np.abs(np.asarray(out, np.float64) - out_oracle).max()
rel = err / (np.abs(out_oracle).max() + 1e-30)
print(f"gather_tp             max_err={err:.2e} rel={rel:.2e}")

dA, dB = fused_tp.tp_scatter_call(
    xj, gj, wj, offs_p, win, entries=entries, dims=dims, U=U, eb=EB, n_rank_rows=Na
)
denv = np.asarray(fused_tp.combine_scatter_outputs(dA, dB, win, EB), np.float64)
err = np.abs(denv[vis] - denv_oracle[vis]).max()
rel = err / (np.abs(denv_oracle).max() + 1e-30)
print(f"tp_scatter            max_err={err:.2e} rel={rel:.2e}")

dw = fused_tp.gather_dw_call(
    xj, envj, envj, gj, offs_p, win, entries=entries, dims=dims, U=U, eb=EB
)
err = np.abs(np.asarray(dw, np.float64) - dw_oracle).max()
rel = err / (np.abs(dw_oracle).max() + 1e-30)
print(f"gather_dw             max_err={err:.2e} rel={rel:.2e}")

dsh = fused_tp.gather_unweight_sh_call(
    envj, envj, wexpj, offs_p, win, dim_to_irr=tuple(dim_to_irr), U=U, eb=EB
)
err = np.abs(np.asarray(dsh, np.float64) - dsh_oracle).max()
rel = err / (np.abs(dsh_oracle).max() + 1e-30)
print(f"gather_unweight_sh    max_err={err:.2e} rel={rel:.2e}")

dwexp = fused_tp.gather_unweight_w_call(
    envj, envj, shj, offs_p, win, dim_to_irr=tuple(dim_to_irr), U=U, eb=EB
)
err = np.abs(np.asarray(dwexp, np.float64) - dwexp_oracle).max()
rel = err / (np.abs(dwexp_oracle).max() + 1e-30)
print(f"gather_unweight_w     max_err={err:.2e} rel={rel:.2e}")
