"""Race the feature-major-I/O gather_tp prototype against the edge-major
production kernel on silicon, at production shapes.

Decides whether flipping the whole fused family to feature-major I/O
(killing every in-kernel VMEM transpose) pays — see
``ops/fused_tp.gather_tp_fm_call``. Both kernels compute the identical
result (pinned by ``tests/nn/test_fused_primitives.py::
test_feature_major_gather_tp_matches``); this measures layout cost only.

Usage: python scripts/probe_fm.py [n_atoms] [edges_per_atom]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from allegro_tpu.utils.chiplock import chip_lock  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import allegro_tpu.ops.fused_tp as ft  # noqa: E402

N_ATOMS = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
EPA = int(sys.argv[2]) if len(sys.argv) > 2 else 25
EB = int(os.environ.get("ALLEGRO_FUSED_EB", "128"))
U = 32
REPS = 30


def production_entries():
    """Flagship-model TP metadata (l_max=2, parity, layer-1 shape)."""
    from allegro_tpu.lib.irreps import Irreps
    from allegro_tpu.nn.allegro import compute_irreps_ladder
    from allegro_tpu.nn.contract import enumerate_instructions, pack_w3j
    from allegro_tpu.ops.pallas_contract import sparse_entries

    irreps_sh = Irreps("1x0e+1x1o+1x2e")
    allowed = Irreps("1x0e+1x0o+1x1e+1x1o+1x2e+1x2o")
    ladder = compute_irreps_ladder(irreps_sh, allowed, 3)
    ins = enumerate_instructions(ladder[1], irreps_sh, ladder[2])
    w3j = pack_w3j(ladder[1], irreps_sh, ladder[2], ins)
    entries = sparse_entries(w3j)
    P, d1, d2, d3 = w3j.shape
    return entries, (d1, d2, d3), P


def bench(fn, args, label):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    best = min(ts) * 1e3
    med = sorted(ts)[len(ts) // 2] * 1e3
    print(f"{label:28s} best {best:7.3f} ms   median {med:7.3f} ms")
    return best


def main():
    rng = np.random.RandomState(0)
    E = N_ATOMS * EPA
    Ep = -(-E // EB) * EB
    entries, dims, P = production_entries()
    d1, d2, d3 = dims
    print(f"atoms={N_ATOMS} edges={E} (pad {Ep}) dims={dims} "
          f"entries={len(entries)} P={P} U={U} eb={EB}")

    centers = np.sort(rng.randint(0, N_ATOMS, E)).astype(np.int32)
    # make centers the identity rank map (every atom has an edge)
    centers[:N_ATOMS] = np.arange(N_ATOMS)
    centers = np.sort(centers)
    centers = np.concatenate([centers, np.full(Ep - E, N_ATOMS, np.int32)])
    win, offs = ft.make_block_plan(jnp.asarray(centers), EB)
    Nr = ft.num_rank_rows(N_ATOMS, EB)

    x = jnp.asarray(rng.randn(Ep, d1 * U), jnp.float32)
    env = jnp.asarray(rng.randn(Nr, d2 * U), jnp.float32)
    w = jnp.asarray(rng.randn(P, U), jnp.float32)
    kw = dict(entries=entries, dims=dims, U=U, eb=EB)

    em = jax.jit(
        lambda x, e, w: ft.gather_tp_call(x, e, e, w, offs, win, **kw)
    )
    fm = jax.jit(
        lambda xT, eT, w: ft.gather_tp_fm_call(xT, eT, eT, w, offs, win, **kw)
    )
    xT = jnp.asarray(np.asarray(x).T.copy())
    envT = jnp.asarray(np.asarray(env).T.copy())

    # correctness on silicon first
    a = np.asarray(em(x, env, w))
    b = np.asarray(fm(xT, envT, w)).T
    err = np.abs(a - b).max() / max(np.abs(a).max(), 1e-30)
    print(f"max rel deviation edge-major vs feature-major: {err:.2e}")

    t_em = bench(em, (x, env, w), "edge-major gather_tp")
    t_fm = bench(fm, (xT, envT, w), "feature-major gather_tp")
    print(f"feature-major speedup: {t_em / t_fm:.3f}x")


if __name__ == "__main__":
    with chip_lock():
        main()
