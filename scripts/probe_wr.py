"""Race the narrow-window (wr=64) kernel plan vs the classic wr=eb plan on
the real chip, at flagship shape.

Every one-hot window product has MXU cost O(2*wr) per edge: at wr=eb=128
the window pair costs two 128-row K tiles per pass; at wr=64 the pair
concatenates into ONE 128-row operand — half the MXU streaming — and every
window DMA block halves. The plan itself is identical math (validated
bit-identical in interpret mode, tests/model/test_window_rows.py); this
probe answers whether the chip agrees it is faster on the kernels the
round-4 trace says dominate (mega layer body, gather_tp_raw, bwd_fused_raw).

Round-4 follow-up: per-kernel time is ~0.9 us/block across kernels with very
different I/O — a fixed per-grid-step cost plus O(eb) one-hot MACs/edge.
eb=256 alone was a wash (half the blocks, double the MACs/edge); eb=256 with
wr=64 halves BOTH. Pass (eb, wr) pairs to race:

Usage: python scripts/probe_wr.py [n_atoms] [eb:wr ...]
       python scripts/probe_wr.py 4096 128:128 256:64 512:64
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from allegro_tpu.lib.irreps import Irreps
from allegro_tpu.nn.allegro import compute_irreps_ladder
from allegro_tpu.nn.contract import enumerate_instructions, pack_w3j
from allegro_tpu.ops import fused_tp
from allegro_tpu.ops.pallas_contract import sparse_entries
from allegro_tpu.utils.chiplock import chip_lock

N_ATOMS = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
PAIRS = [tuple(int(x) for x in a.split(":")) for a in sys.argv[2:]] or [
    (128, 128), (128, 64), (256, 64), (512, 64)
]
EB0 = max(eb for eb, _ in PAIRS)  # pad edges to the largest eb raced
U = 32
AVG_NEIGH = 25.3
E = int(N_ATOMS * AVG_NEIGH)
Ep = -(-E // EB0) * EB0
ITERS = 30
PASSES = 2  # headline policy


def device_time(name, fn, *args, iters=ITERS):
    @jax.jit
    def loop(s0, args):
        def body(i, s):
            out = fn(*jax.tree.map(
                lambda a: a + s.astype(a.dtype)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, args))
            tot = sum(
                (leaf.astype(jnp.float32) ** 2).sum()
                for leaf in jax.tree.leaves(out)
                if jnp.issubdtype(leaf.dtype, jnp.floating)
            )
            return tot * 1e-30
        return jax.lax.fori_loop(0, iters, body, s0)

    try:
        s = loop(jnp.float32(0.0), args)
        jax.block_until_ready(s)
    except Exception as e:
        first = (str(e).splitlines() or [""])[0][:90]
        print(f"  {name:44s} FAIL {type(e).__name__}: {first}")
        return None
    best = float("inf")
    for t in (1.0, 2.0, 3.0):
        t0 = time.perf_counter()
        s = loop(jnp.float32(t * 1e-9), args)
        jax.block_until_ready(s)
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    print(f"  {name:44s} {best:8.3f} ms")
    return best


def main():
    print(f"device={jax.devices()[0]}  N={N_ATOMS} E={E} Ep={Ep} "
          f"pairs={PAIRS} U={U}")
    irreps_sh = Irreps("1x0e+1x1o+1x2e")
    allowed = Irreps("1x0e+1x0o+1x1e+1x1o+1x2e+1x2o")
    ladder = compute_irreps_ladder(irreps_sh, allowed, 2)
    ins = enumerate_instructions(ladder[0], irreps_sh, ladder[1])
    w3j = pack_w3j(ladder[0], irreps_sh, ladder[1], ins)
    entries = sparse_entries(w3j)
    P, d1, d2, d3 = w3j.shape
    dims = (d1, d2, d3)
    n_irr = len(irreps_sh)
    print(f"P={P} dims={dims} nnz={len(entries)}")

    rng = np.random.RandomState(0)
    centers_np = np.sort(rng.randint(0, N_ATOMS, E)).astype(np.int32)
    # pre-pad with the sentinel so every raced eb yields the same Ep
    centers_np = np.concatenate(
        [centers_np, np.full(Ep - E, N_ATOMS, np.int32)]
    )

    dim_to_irr = []
    for k_, sl in enumerate(irreps_sh.slices()):
        dim_to_irr.extend([k_] * (sl.stop - sl.start))
    dim_to_irr = tuple(dim_to_irr)

    x = jnp.asarray(rng.randn(Ep, d1 * U), jnp.float32)
    g = jnp.asarray(rng.randn(Ep, d3 * U), jnp.float32)
    sh = jnp.asarray(rng.randn(Ep, d2), jnp.float32)
    wexp = jnp.asarray(rng.randn(Ep, n_irr * U), jnp.float32)
    wmat = jnp.asarray(rng.randn(P, U), jnp.float32)
    # mega MLP pieces: two scalar tracks + env projection output
    S = 128
    H = 128
    p0 = jnp.asarray(rng.randn(Ep, S), jnp.float32)
    p1 = jnp.asarray(rng.randn(Ep, U), jnp.float32)
    w0 = jnp.asarray(rng.randn(S + U, H) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.randn(H, S + n_irr * U) * 0.1, jnp.float32)

    results = {}
    outs = {}
    g_lat = jnp.asarray(rng.randn(Ep, S), jnp.float32)
    for eb, wr in PAIRS:
        try:
            win_np, offs_np, Ep2 = fused_tp.make_block_plan_np(
                centers_np, eb, N_ATOMS, wr=wr
            )
        except ValueError as e:
            print(f"--- eb={eb} wr={wr}: plan invalid ({e})")
            continue
        assert Ep2 == Ep, (Ep2, Ep)
        win = jnp.asarray(win_np)
        offs = jnp.asarray(offs_np)
        nr = fused_tp.num_rank_rows(N_ATOMS, wr)
        print(f"--- eb={eb} wr={wr} (n_rank_rows={nr}) ---")

        def env_fwd(sh, wexp, *, offs=offs, win=win, eb=eb, wr=wr, nr=nr):
            return fused_tp.env_scatter_call(
                sh, wexp, offs, win, dim_to_irr=dim_to_irr, U=U, eb=eb,
                n_rank_rows=nr, wr=wr, passes=PASSES,
            )

        eA, eB_ = env_fwd(sh, wexp)
        r = {}
        r["env_scatter"] = device_time("env_scatter", env_fwd, sh, wexp)

        def gtp(x, eA, eB_, *, offs=offs, win=win, eb=eb, wr=wr):
            return fused_tp.gather_tp_raw_call(
                x, eA, eB_, wmat, offs, win, entries=entries, dims=dims, U=U,
                eb=eb, wr=wr, passes=PASSES, split_scalars=True,
            )

        r["gather_tp_raw"] = device_time("gather_tp_raw(split)", gtp, x, eA, eB_)
        out = gtp(x, eA, eB_)
        outs[(eb, wr)] = np.asarray(out[0][:E])

        def bwd(x, g, eA, eB_, *, offs=offs, win=win, eb=eb, wr=wr, nr=nr):
            return fused_tp.bwd_fused_raw_call(
                x, g, eA, eB_, wmat, offs, win, entries=entries, dims=dims,
                U=U, eb=eb, n_rank_rows=nr, wr=wr, passes=PASSES,
            )

        r["bwd_fused_raw"] = device_time("bwd_fused_raw", bwd, x, g, eA, eB_)
        dx, dA, dB = bwd(x, g, eA, eB_)

        def unw(dA, dB, sh, wexp, *, offs=offs, win=win, eb=eb, wr=wr):
            return fused_tp.unweight_both_raw_call(
                dA, dB, sh, wexp, offs, win, dim_to_irr=dim_to_irr, U=U,
                eb=eb, wr=wr, passes=PASSES,
            )

        r["unweight_both_raw"] = device_time("unweight_both_raw", unw, dA, dB, sh, wexp)

        def mega(p0, p1, sh, *, offs=offs, win=win, eb=eb, wr=wr, nr=nr):
            return fused_tp.latent_env_scatter_call(
                (p0, p1), sh, w0, w1, offs, win, dim_to_irr=dim_to_irr, U=U,
                eb=eb, n_rank_rows=nr, S=S, n_hidden=1, wr=wr, mlp_passes=3,
                passes=PASSES,
            )

        r["mega_fwd"] = device_time("mega latent_env_scatter", mega, p0, p1, sh)

        def megab(p0, p1, sh, dA, dB, g_lat, *, offs=offs, win=win, eb=eb, wr=wr):
            return fused_tp.latent_env_bwd_call(
                (p0, p1), sh, w0, w1, dA, dB, g_lat, offs, win,
                dim_to_irr=dim_to_irr, U=U, eb=eb, S=S, n_hidden=1, wr=wr,
                mlp_passes=3, passes=PASSES,
            )

        r["mega_bwd"] = device_time("mega latent_env_bwd", megab, p0, p1, sh, dA, dB, g_lat)
        results[(eb, wr)] = r

    # cross-plan correctness (same math, different blocking) + totals
    base = PAIRS[0]
    tot0 = sum(v for v in results[base].values() if v)
    denom = max(float(np.abs(outs[base]).max()), 1e-9)
    print(f"TOTAL eb={base[0]} wr={base[1]}: {tot0:.3f} ms (baseline)")
    for pair in PAIRS[1:]:
        if pair not in results:
            continue
        d = float(np.abs(outs[base] - outs[pair]).max()) / denom
        tot = sum(v for v in results[pair].values() if v)
        print(f"TOTAL eb={pair[0]} wr={pair[1]}: {tot:.3f} ms  "
              f"speedup {tot0 / max(tot, 1e-9):.3f}x  rel_diff {d:.2e}")


if __name__ == "__main__":
    with chip_lock(timeout=3600):
        main()
