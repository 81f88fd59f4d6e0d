"""Probe fast in-kernel row-gather strategies on the real chip.

The fused TP kernels expand atom->edge rows with a one-hot MXU matmul —
O(eb) MACs per edge. Candidates for O(1)/element and their measured cost,
using the chained-fori_loop timing methodology (the tunnel has ~5 ms
dispatch overhead and dedupes identical calls — see profile_tp.py).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C = 288
Ep = 103680
ITERS = 30
rng = np.random.RandomState(0)


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

    try:
        s = loop(jnp.float32(0.0), args)
        jax.block_until_ready(s)
    except Exception as e:
        msg = str(e).split("\n")[0][:110]
        print(f"  {name:46s} FAIL {type(e).__name__}: {msg}")
        return None
    best = float("inf")
    for trial in (1.0, 2.0, 3.0):
        t0 = time.perf_counter()
        s = loop(jnp.float32(trial * 1e-9), args)
        jax.block_until_ready(s)
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    print(f"  {name:46s} {best:8.3f} ms")
    return best


def run(eb):
    nb = Ep // eb
    win2 = jnp.asarray(rng.randn(nb * 2 * eb, C), jnp.float32)
    offs_np = np.sort(rng.randint(0, 2 * eb, (nb, eb))).astype(np.int32)
    offs_p = jnp.asarray(
        np.concatenate([offs_np[:, None, :], np.zeros((nb, 7, eb), np.int32)], 1).reshape(
            nb * 8, eb
        )
    )
    ref_rows = offs_np + (np.arange(nb)[:, None] * 2 * eb)
    ref = np.asarray(win2)[ref_rows.reshape(-1)]

    def call(kernel):
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((8, eb), lambda b: (b, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((2 * eb, C), lambda b: (b, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((eb, C), lambda b: (b, 0), memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((nb * eb, C), jnp.float32), grid_spec=gs
        )

    def check(name, kfn, tol=None):
        try:
            f = call(kfn)
            out = f(offs_p, win2)
            err = float(np.abs(np.asarray(out) - ref).max())
        except Exception as e:
            msg = str(e).split("\n")[0][:110]
            print(f"  {name:46s} FAIL {type(e).__name__}: {msg}")
            return
        device_time(f"{name} [err={err:.1e}]", f, offs_p, win2)

    def k_taa_full(o_ref, w_ref, out_ref):
        o = o_ref[0, :]
        idx = jnp.broadcast_to(o[:, None], (eb, C))
        idx2 = jnp.concatenate([idx, idx], axis=0)  # same shape as input
        out_ref[:] = jnp.take_along_axis(w_ref[:], idx2, axis=0)[:eb]

    check(f"eb={eb} take_along_axis idx=input-shape", k_taa_full)

    def k_taa0(o_ref, w_ref, out_ref):
        o = o_ref[0, :]
        idx = jnp.broadcast_to(o[:, None], (eb, C))
        out_ref[:] = jnp.take_along_axis(w_ref[:], idx, axis=0)

    check(f"eb={eb} take_along_axis axis=0", k_taa0)

    def k_onehot(o_ref, w_ref, out_ref, prec):
        o = o_ref[0, :]
        ii = jax.lax.broadcasted_iota(jnp.int32, (eb, 2 * eb), 1)
        G = (ii == o[:, None]).astype(jnp.float32)
        out_ref[:] = jax.lax.dot_general(
            G, w_ref[:], (((1,), (0,)), ((), ())), precision=prec,
            preferred_element_type=jnp.float32,
        )

    check(f"eb={eb} one-hot HIGHEST", functools.partial(k_onehot, prec=jax.lax.Precision.HIGHEST))
    check(f"eb={eb} one-hot DEFAULT", functools.partial(k_onehot, prec=jax.lax.Precision.DEFAULT))

    def k_onehot_bf16(o_ref, w_ref, out_ref):
        o = o_ref[0, :]
        ii = jax.lax.broadcasted_iota(jnp.int32, (eb, 2 * eb), 1)
        G = (ii == o[:, None]).astype(jnp.bfloat16)
        v = w_ref[:]
        hi = v.astype(jnp.bfloat16)
        lo = (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        dn = (((1,), (0,)), ((), ()))
        out_ref[:] = (
            jax.lax.dot_general(G, hi, dn, preferred_element_type=jnp.float32)
            + jax.lax.dot_general(G, lo, dn, preferred_element_type=jnp.float32)
        )

    check(f"eb={eb} one-hot bf16 hi+lo", k_onehot_bf16)

    def k_copy(o_ref, w_ref, out_ref):
        out_ref[:] = w_ref[:eb] * 1.0001

    check(f"eb={eb} copy bound (no gather)", k_copy)

    # XLA native take at same volume
    rows_flat = jnp.asarray(ref_rows.reshape(-1))
    device_time(
        f"eb={eb} XLA jnp.take same volume", lambda w: jnp.take(w, rows_flat, axis=0), win2
    )


print(f"device={jax.devices()[0]}  Ep={Ep} C={C}")
for eb in (128, 256, 512):
    run(eb)
