"""Microbenchmark the TP formulations + model components on the real chip.

Methodology: the remote-tunnel backend has ~5 ms per-dispatch overhead and can
dedupe identical calls, so each measurement runs `iters` iterations CHAINED
inside one jitted lax.fori_loop (a scalar carry perturbs the inputs each
iteration, forcing sequential execution), timed as a single dispatch.

Usage: python scripts/profile_tp.py [n_atoms]
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
from allegro_tpu.ops.pallas_contract import (
    PallasTPBackend,
    pack_edge_major,
    sparse_entries,
)

N_ATOMS = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
U = 32
AVG_NEIGH = 25.3
E = int(N_ATOMS * AVG_NEIGH)
E = -(-E // 128) * 128
ITERS = 30


def device_time(name, fn, *args, iters=ITERS):
    """ms per iteration of fn(*args), chained on-device in one dispatch."""

    @jax.jit
    def loop(s0, args):
        def body(i, s):
            out = fn(*jax.tree.map(lambda a: _perturb(a, s), args))
            # NONLINEAR reduction over EVERY output element: sum(out) of a
            # multilinear function expands algebraically in the carry s and
            # XLA hoists the loop-invariant pieces out of the fori_loop
            # (measured: 83-entry TP "runs" in 0.012 ms); sum(out**2) cannot
            # be expanded or dead-code-eliminated.
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

    s = loop(jnp.float32(0.0), args)  # compile + warm
    jax.block_until_ready(s)
    best = float("inf")
    for trial in (1.0, 2.0, 3.0):
        # distinct s0 per call: the tunnel backend dedupes IDENTICAL calls
        t0 = time.perf_counter()
        s = loop(jnp.float32(trial * 1e-9), args)
        jax.block_until_ready(s)
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    print(f"{name:48s} {best:8.3f} ms")
    return best


def main():
    print(f"device={jax.devices()[0]}  N={N_ATOMS} E={E} U={U} iters={ITERS}")
    irreps_sh = Irreps("1x0e+1x1o+1x2e")
    allowed = Irreps("1x0e+1x0o+1x1e+1x1o+1x2e+1x2o")
    ladder = compute_irreps_ladder(irreps_sh, allowed, 2)
    ins = enumerate_instructions(ladder[0], irreps_sh, ladder[1])
    w3j = pack_w3j(ladder[0], irreps_sh, ladder[1], ins)
    entries = sparse_entries(w3j)
    P, d1, d2, d3 = w3j.shape
    print(f"layer0: P={P} dims=({d1},{d2},{d3}) nnz={len(entries)}")

    rng = np.random.RandomState(0)
    x1 = jnp.asarray(rng.randn(E, U, d1), jnp.float32)
    x2 = jnp.asarray(rng.randn(E, U, d2), jnp.float32)
    w = jnp.asarray(rng.randn(U, P), jnp.float32)
    w3 = jnp.asarray(w3j, jnp.float32)
    centers = jnp.sort(jnp.asarray(rng.randint(0, N_ATOMS, E), jnp.int32))
    sh = jnp.asarray(rng.randn(E, d2), jnp.float32)
    env_w = jnp.asarray(rng.randn(E, U * 3), jnp.float32)

    def tp_elementwise(x1, x2, w):
        acc = [None] * d3
        for (i, j, k, p, c) in entries:
            t = (c * w[:, p])[None, :] * x1[:, :, i] * x2[:, :, j]
            acc[k] = t if acc[k] is None else acc[k] + t
        return jnp.stack(
            [a if a is not None else jnp.zeros_like(x1[:, :, 0]) for a in acc], -1
        )

    def tp_einsum_direct(x1, x2, w):
        ww = jnp.einsum("up,pijk->uijk", w, w3)
        return jnp.einsum("zui,zuj,uijk->zuk", x1, x2, ww)

    def tp_loop(x1, x2, w):
        ww = jnp.einsum("up,pijk->uijk", w, w3)
        out = None
        for i in range(d1):
            y = jnp.einsum("zuj,ujk->zuk", x2, ww[:, i])
            t = x1[:, :, i : i + 1] * y
            out = t if out is None else out + t
        return out

    backend = PallasTPBackend(w3j)

    def tp_pallas(x1p, x2p, wt):
        return backend.contract_packed(x1p, x2p, wt, U)

    x1p = pack_edge_major(x1)
    x2p = pack_edge_major(x2)

    device_time("tp fwd elementwise", tp_elementwise, x1, x2, w)
    device_time("tp fwd einsum_direct", tp_einsum_direct, x1, x2, w)
    device_time("tp fwd loop", tp_loop, x1, x2, w)
    device_time("tp fwd pallas(packed)", tp_pallas, x1p, x2p, w)

    def mk_vjp(f):
        def g(*a):
            out, vjp = jax.vjp(f, *a)
            return vjp(jnp.ones_like(out))

        return g

    device_time("tp fwd+bwd elementwise", mk_vjp(tp_elementwise), x1, x2, w)
    device_time("tp fwd+bwd einsum_direct", mk_vjp(tp_einsum_direct), x1, x2, w)
    device_time("tp fwd+bwd pallas", mk_vjp(tp_pallas), x1p, x2p, w)

    rtoi = jnp.asarray(np.repeat(np.eye(3), [1, 3, 5], axis=1), jnp.float32)

    def env_weight(sh, env_w):
        wl = env_w.reshape(E, U, 3)
        return jnp.einsum("eui,id,ed->eud", wl, rtoi, sh)

    def env_weight_elem(sh, env_w):
        wl = env_w.reshape(E, U, 3)
        wfull = jnp.concatenate(
            [wl[:, :, 0:1], jnp.repeat(wl[:, :, 1:2], 3, -1), jnp.repeat(wl[:, :, 2:3], 5, -1)],
            -1,
        )
        return wfull * sh[:, None, :]

    def seg_gather(x2flat):
        s = jax.ops.segment_sum(x2flat, centers, num_segments=N_ATOMS)
        return jnp.take(s, centers, axis=0)

    def gather_rows(env_atoms):
        return jnp.take(env_atoms, centers, axis=0)

    def segsum_only(x2flat):
        return jax.ops.segment_sum(x2flat, centers, num_segments=N_ATOMS)

    x2flat = x2.reshape(E, -1)
    env_atoms = jax.ops.segment_sum(x2flat, centers, num_segments=N_ATOMS)
    device_time("env_weight einsum [E,U,9]", env_weight, sh, env_w)
    device_time("env_weight elementwise [E,U,9]", env_weight_elem, sh, env_w)
    device_time("segment_sum [E,288]->[N,288]", segsum_only, x2flat)
    device_time("segment_sum+take [E,288]", seg_gather, x2flat)
    device_time("take alone [N,288]->[E,288]", gather_rows, env_atoms)
    device_time("pack transpose [E,U,9]->[9,R,128]", pack_edge_major, x1)

    Wm = jnp.asarray(rng.randn(96, 64), jnp.float32)
    Wm2 = jnp.asarray(rng.randn(64, 64), jnp.float32)
    xm = jnp.asarray(rng.randn(E, 96), jnp.float32)

    def mlp(x):
        return jnp.maximum(x @ Wm, 0) @ Wm2

    def mlp_hi(x):
        h = jnp.maximum(jnp.dot(x, Wm, precision="highest"), 0)
        return jnp.dot(h, Wm2, precision="highest")

    device_time("mlp [E,96]x[96,64]x[64,64] default", mlp, xm)
    device_time("mlp same, precision=highest", mlp_hi, xm)

    # copy bound: how fast is one read+write of [E,U,9]?
    device_time("copy [E,U,9] (x*1.0001)", lambda a: a * 1.0001, x1)


if __name__ == "__main__":
    main()
