"""Probe Mosaic capabilities needed by the fused TP kernels, on the real chip.

1. dynamic row gather from VMEM via jnp.take / indexing
2. manual DMA with dynamic start (pl.ds) from ANY -> VMEM scratch, with
   scalar-prefetch starts
3. one-hot matmul gather (f32 highest + bf16) correctness
4. sequential-grid carry in persistent VMEM scratch
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EB, C = 256, 288
rng = np.random.RandomState(0)
window = jnp.asarray(rng.randn(EB, C), jnp.float32)
offs = jnp.asarray(np.sort(rng.randint(0, 40, EB)), jnp.int32)
ref = np.asarray(window)[np.asarray(offs)]


def check(name, fn):
    try:
        out = fn()
        err = float(np.abs(np.asarray(out) - ref).max())
        print(f"{name:44s} OK  max_err={err:.2e}")
    except Exception as e:
        msg = str(e).split("\n")[0][:140]
        print(f"{name:44s} FAIL {type(e).__name__}: {msg}")


# 1a. jnp.take inside kernel
def k_take(w_ref, o_ref, out_ref):
    out_ref[:] = jnp.take(w_ref[:], o_ref[0], axis=0)


check(
    "in-kernel jnp.take(axis=0)",
    lambda: pl.pallas_call(
        k_take,
        out_shape=jax.ShapeDtypeStruct((EB, C), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(window, offs[None]),
)


# 1b. fori_loop of dynamic row reads
def k_loop(w_ref, o_ref, out_ref):
    def body(e, _):
        out_ref[pl.ds(e, 1), :] = w_ref[pl.ds(o_ref[0, e], 1), :]
        return 0

    jax.lax.fori_loop(0, EB, body, 0)


check(
    "in-kernel fori_loop row select",
    lambda: pl.pallas_call(
        k_loop,
        out_shape=jax.ShapeDtypeStruct((EB, C), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(window, offs[None]),
)


# 1c. one-hot matmul f32 highest
def k_onehot(w_ref, o_ref, out_ref):
    ii = jax.lax.broadcasted_iota(jnp.int32, (EB, EB), 1)
    G = (ii == o_ref[0][:, None]).astype(jnp.float32)
    out_ref[:] = jax.lax.dot_general(
        G, w_ref[:], (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


check(
    "in-kernel one-hot matmul f32 highest",
    lambda: pl.pallas_call(
        k_onehot,
        out_shape=jax.ShapeDtypeStruct((EB, C), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(window, offs[None]),
)


# 2. manual DMA ANY->VMEM with dynamic start + scalar prefetch
NB = 4
big = jnp.asarray(rng.randn(NB * 64 + EB, C), jnp.float32)
starts = jnp.asarray([0, 50, 120, 200], jnp.int32)


def k_dma(starts_ref, big_ref, out_ref, scratch, sem):
    b = pl.program_id(0)
    s = starts_ref[b]
    dma = pltpu.make_async_copy(big_ref.at[pl.ds(s, EB)], scratch, sem)
    dma.start()
    dma.wait()
    out_ref[:] = scratch[:] * 2.0


def run_dma():
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NB,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((EB, C), lambda b, starts: (b, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((EB, C), jnp.float32), pltpu.SemaphoreType.DMA(())],
    )
    out = pl.pallas_call(
        k_dma,
        out_shape=jax.ShapeDtypeStruct((NB * EB, C), jnp.float32),
        grid_spec=gs,
    )(starts, big)
    ref2 = np.concatenate([np.asarray(big)[s : s + EB] * 2 for s in np.asarray(starts)])
    err = float(np.abs(np.asarray(out) - ref2).max())
    print(f"{'manual DMA dyn-start + scalar prefetch':44s} OK  max_err={err:.2e}")


try:
    run_dma()
except Exception as e:
    print(f"{'manual DMA dyn-start + scalar prefetch':44s} FAIL {type(e).__name__}: {str(e).split(chr(10))[0][:140]}")


# 4. sequential-grid carry in persistent scratch
def k_carry(in_ref, out_ref, carry):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        carry[:] = jnp.zeros_like(carry)

    carry[:] = carry[:] + in_ref[:].sum(axis=0, keepdims=True)
    out_ref[:] = carry[:]


def run_carry():
    x = jnp.ones((NB * 8, 128), jnp.float32)
    out = pl.pallas_call(
        k_carry,
        out_shape=jax.ShapeDtypeStruct((NB, 128), jnp.float32),
        grid=(NB,),
        in_specs=[pl.BlockSpec((8, 128), lambda b: (b, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 128), lambda b: (b, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, 128), jnp.float32)],
    )(x)
    expect = np.arange(1, NB + 1)[:, None] * 8.0
    err = float(np.abs(np.asarray(out) - expect).max())
    print(f"{'persistent scratch carry across grid':44s} OK  max_err={err:.2e}")


try:
    run_carry()
except Exception as e:
    print(f"{'persistent scratch carry across grid':44s} FAIL {type(e).__name__}: {str(e).split(chr(10))[0][:140]}")
