"""Fused sparse Clebsch–Gordan tensor-product Pallas kernels.

The TPU-native equivalent of the reference's FlashAllegro Triton kernels
(``allegro/nn/_strided/_flashallegro.py:24-282``) and of the cuEquivariance
segmented-TP backend (``_cueq_contracter.py``): the channelwise CG contraction

    out[k, r, l] = sum_{(i,j,k,p) in nnz(w3j)}  c * w[p, l] * a[i, r, l] * b[j, r, l]

evaluated entirely in VMEM, never materializing outer products to HBM.

Design (TPU-first):

- **Packed dim-major layout** ``[d, rows, 128]``: the (edge, channel) pairs
  are flattened onto rows × 128 lanes (channel minor), so every basis-dim
  slice is a perfectly tiled ``[rows, 128]`` VPU operand at ANY channel count
  dividing 128. Path weights are lane-tiled with period U.
- **Static sparsity**: the nonzero CG entries ``(i, j, k, p, c)`` are baked
  into the kernel at trace time (the analogue of the Triton backend's CSR
  metadata, ``_flashallegro.py:284-378``), sorted by ``(i, j)`` so each
  distinct product ``a[i] * b[j]`` is formed once.
- **Layout conversion as kernels**: XLA's HBM transpose of a tiny minor dim
  costs ~3x the TP kernel itself (measured), so pack/unpack are Pallas
  on-chip transposes.
- **Derivatives by index permutation**: every VJP is again a kernel from the
  same family with permuted entry roles — the index-permutation trick of the
  Triton backward (``_flashallegro.py:348-360,583-639``) — and the weight
  gradient is a triple-product reduction whose own VJPs are permuted TPs.
  NOTE: ``jax.custom_vjp`` forbids reverse-over-reverse regardless of how the
  rules are composed, so this backend (like the reference's Triton backend)
  is scoped to inference/MD (first-order forces). The trainable backend —
  the same kernels registered as JAX primitives with JVP + transpose rules,
  where the trilinear family genuinely closes — is tracked in TODO.md.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Entry = Tuple[int, int, int, int, float]  # (ia, ib, io, p, c)

# Global switch: run kernels in interpreter mode (CPU tests). The real TPU
# path never sets this.
INTERPRET = False

LANES = 128


def sparse_entries(w3j_packed: np.ndarray, tol: float = 1e-12) -> Tuple[Entry, ...]:
    """Nonzero entries of the packed [P, d1, d2, d3] 3j buffer, (i,j,k,p,c)."""
    P, d1, d2, d3 = w3j_packed.shape
    entries: List[Entry] = []
    for p in range(P):
        idx = np.argwhere(np.abs(w3j_packed[p]) > tol)
        for i, j, k in idx:
            entries.append((int(i), int(j), int(k), int(p), float(w3j_packed[p, i, j, k])))
    entries.sort(key=lambda e: (e[0], e[1], e[2]))
    return tuple(entries)


def _swap_a_out(entries):
    """Entry roles for grad wrt ``a``: out index <-> a index."""
    return tuple(sorted(((k, j, i, p, c) for (i, j, k, p, c) in entries),
                        key=lambda e: (e[0], e[1], e[2])))


def _swap_b_out(entries):
    """Entry roles for grad wrt ``b``: out index <-> b index."""
    return tuple(sorted(((i, k, j, p, c) for (i, j, k, p, c) in entries),
                        key=lambda e: (e[0], e[1], e[2])))


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _tp_kernel(w_ref, a_ref, b_ref, o_ref, *, entries, d_out):
    """One block: o[k] = sum over entries of c * w[p] * a[i] * b[j]."""
    acc = [None] * d_out
    cur = (-1, -1)
    t = None
    for ia, ib, io, p, c in entries:
        if (ia, ib) != cur:
            t = a_ref[ia] * b_ref[ib]  # [rows, 128]
            cur = (ia, ib)
        contrib = (c * w_ref[p : p + 1]) * t
        acc[io] = contrib if acc[io] is None else acc[io] + contrib
    for k in range(d_out):
        if acc[k] is None:
            o_ref[k] = jnp.zeros_like(o_ref[k])
        else:
            o_ref[k] = acc[k]


def _gradw_kernel(a_ref, b_ref, g_ref, ow_ref, *, entries, n_paths):
    """Accumulate gw[p, l] = sum_rows c * a[i] * b[j] * g[k] across blocks."""

    @pl.when(pl.program_id(0) == 0)
    def _():
        ow_ref[...] = jnp.zeros_like(ow_ref)

    acc = [None] * n_paths
    cur = (-1, -1)
    t = None
    for ia, ib, io, p, c in entries:
        if (ia, ib) != cur:
            t = a_ref[ia] * b_ref[ib]
            cur = (ia, ib)
        contrib = c * jnp.sum(t * g_ref[io], axis=0, keepdims=True)  # [1, 128]
        acc[p] = contrib if acc[p] is None else acc[p] + contrib
    for p in range(n_paths):
        if acc[p] is not None:
            ow_ref[p : p + 1] = ow_ref[p : p + 1] + acc[p]


# ---------------------------------------------------------------------------
# pallas_call wrappers (raw, no AD)
# ---------------------------------------------------------------------------


def _pad_rows(x, block: int):
    R = x.shape[1]
    Rp = -(-R // block) * block
    if Rp == R:
        return x, R
    return jnp.pad(x, ((0, 0), (0, Rp - R), (0, 0))), R


def _run_tp(a, b, w, entries, d_out: int, block: int):
    a, R = _pad_rows(a, block)
    b, _ = _pad_rows(b, block)
    Rp, L = a.shape[1], a.shape[2]
    out = pl.pallas_call(
        functools.partial(_tp_kernel, entries=entries, d_out=d_out),
        out_shape=jax.ShapeDtypeStruct((d_out, Rp, L), a.dtype),
        grid=(Rp // block,),
        in_specs=[
            pl.BlockSpec((w.shape[0], L), lambda e: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((a.shape[0], block, L), lambda e: (0, e, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b.shape[0], block, L), lambda e: (0, e, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((d_out, block, L), lambda e: (0, e, 0), memory_space=pltpu.VMEM),
        interpret=INTERPRET,
    )(w, a, b)
    return out[:, :R]


def _run_gradw(a, b, g, n_paths: int, entries, block: int):
    a, _ = _pad_rows(a, block)
    b, _ = _pad_rows(b, block)
    g, _ = _pad_rows(g, block)
    Rp, L = a.shape[1], a.shape[2]
    return pl.pallas_call(
        functools.partial(_gradw_kernel, entries=entries, n_paths=n_paths),
        out_shape=jax.ShapeDtypeStruct((n_paths, L), a.dtype),
        grid=(Rp // block,),
        in_specs=[
            pl.BlockSpec((a.shape[0], block, L), lambda e: (0, e, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b.shape[0], block, L), lambda e: (0, e, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g.shape[0], block, L), lambda e: (0, e, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_paths, L), lambda e: (0, 0), memory_space=pltpu.VMEM),
        interpret=INTERPRET,
    )(a, b, g)


# ---------------------------------------------------------------------------
# differentiable ops (closed under AD)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def tp_contract(a, b, w, entries, dims: Tuple[int, int, int], block: int = 256):
    """Fused CG TP on packed dim-major inputs.

    a [d_a, R, 128], b [d_b, R, 128], w [P, 128] → [d_out, R, 128];
    ``dims = (d_a, d_b, d_out)``, ``entries`` from :func:`sparse_entries`.
    """
    return _run_tp(a, b, w, entries, dims[2], block)


def _tp_fwd(a, b, w, entries, dims, block):
    return _run_tp(a, b, w, entries, dims[2], block), (a, b, w)


def _tp_bwd(entries, dims, block, res, g):
    a, b, w = res
    d_a, d_b, d_out = dims
    ga = tp_contract(g, b, w, _swap_a_out(entries), (d_out, d_b, d_a), block)
    gb = tp_contract(a, g, w, _swap_b_out(entries), (d_a, d_out, d_b), block)
    gw = tp_gradw(a, b, g, entries, dims, block)
    return ga, gb, gw


tp_contract.defvjp(_tp_fwd, _tp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def tp_contract_infer(a, b, w, entries, dims: Tuple[int, int, int], block: int = 256):
    """Inference-scope TP: identical forward, but the backward returns a ZERO
    weight cotangent without running the weight-gradient kernel (XLA cannot
    DCE the custom-call). Use when weights are constants (MD/inference)."""
    return _run_tp(a, b, w, entries, dims[2], block)


def _tpi_fwd(a, b, w, entries, dims, block):
    return _run_tp(a, b, w, entries, dims[2], block), (a, b, w)


def _tpi_bwd(entries, dims, block, res, g):
    a, b, w = res
    d_a, d_b, d_out = dims
    ga = tp_contract_infer(g, b, w, _swap_a_out(entries), (d_out, d_b, d_a), block)
    gb = tp_contract_infer(a, g, w, _swap_b_out(entries), (d_a, d_out, d_b), block)
    return ga, gb, jnp.zeros_like(w)


tp_contract_infer.defvjp(_tpi_fwd, _tpi_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def tp_gradw(a, b, g, entries, dims: Tuple[int, int, int], block: int = 256):
    """Weight gradient: [P, 128] = sum over rows of c * a[i] * b[j] * g[k]."""
    n_paths = 1 + max(e[3] for e in entries)
    return _run_gradw(a, b, g, n_paths, entries, block)


def _gradw_fwd(a, b, g, entries, dims, block):
    return tp_gradw(a, b, g, entries, dims, block), (a, b, g)


def _gradw_bwd(entries, dims, block, res, t):
    a, b, g = res
    d_a, d_b, d_out = dims
    # d gw / d a ⊣ t  = TP of (b, g) with weights t, output indexed by i
    da = tp_contract(
        b, g, t, tuple(sorted(((j, k, i, p, c) for (i, j, k, p, c) in entries),
                              key=lambda e: (e[0], e[1], e[2]))),
        (d_b, d_out, d_a), block,
    )
    db = tp_contract(
        a, g, t, tuple(sorted(((i, k, j, p, c) for (i, j, k, p, c) in entries),
                              key=lambda e: (e[0], e[1], e[2]))),
        (d_a, d_out, d_b), block,
    )
    dg = tp_contract(a, b, t, entries, (d_a, d_b, d_out), block)
    return da, db, dg


tp_gradw.defvjp(_gradw_fwd, _gradw_bwd)


def pack_edge_major(x, lanes: int = LANES):
    """[E, U, d] → packed dim-major [d, E*U/lanes, lanes].

    The d-major transpose is the only real data movement; the (E, U) → lanes
    flattening is a free row-major reshape. The fast model path avoids even
    the transpose by *constructing* the tensor track dim-major (see
    ``AllegroLayers``); this helper serves the edge-major convenience API and
    entry conversion. Plain XLA ops — natively differentiable.
    """
    E, U, d = x.shape
    assert (E * U) % lanes == 0, (E, U, lanes)
    return jnp.transpose(x, (2, 0, 1)).reshape(d, E * U // lanes, lanes)


def unpack_dim_major(y, E: int, U: int):
    """packed [d, E*U/128, 128] → [E, U, d] (inverse of pack)."""
    d = y.shape[0]
    return jnp.transpose(y.reshape(d, E, U), (1, 2, 0))


# ---------------------------------------------------------------------------
# model-facing backend
# ---------------------------------------------------------------------------


class PallasTPBackend:
    """Callable backend bound to one Contracter's static CG data."""

    LANES = LANES

    def __init__(
        self,
        w3j_packed: np.ndarray,
        block_rows: int = 64,  # small blocks: accumulators stay in vregs
        block_edges: int = 512,
        infer_only: bool = True,
    ):
        self.entries = sparse_entries(w3j_packed)
        self.n_paths, self.d1, self.d2, self.d3 = w3j_packed.shape
        self.dims = (self.d1, self.d2, self.d3)
        self.block_rows = block_rows
        self.block_edges = block_edges
        # inference scope (reference-Triton-equivalent): skip the weight-grad
        # kernel in VJPs; set False to exercise tp_gradw (tests)
        self.infer_only = infer_only

    def tile_weights(self, w, U: int):
        """[U, P] or [P] path weights → lane-tiled [P, 128] (period U)."""
        L = self.LANES
        assert L % U == 0, f"channel count {U} must divide {L}"
        if w.ndim == 1:
            w_pu = jnp.broadcast_to(w[:, None], (self.n_paths, U))
        else:
            w_pu = w.T
        return jnp.tile(w_pu, (1, L // U))  # AD adjoint: sum over tiles

    def pack(self, x):
        return pack_edge_major(x)

    def unpack(self, y, E: int, U: int):
        return unpack_dim_major(y, E, U)

    def contract_packed(self, x1p, x2p, w, U: int):
        w_tiled = self.tile_weights(w, U).astype(x1p.dtype)
        # primitive-based op: JVP + transpose rules → arbitrary-order AD
        # (force training included); cotangents are only computed for the
        # operands that actually need them.
        from .tp_primitives import tp

        return tp(
            x1p, x2p, w_tiled, entries=self.entries, dims=self.dims, block=self.block_rows
        )

    def __call__(self, x1, x2, w):
        """Edge-major convenience: [E, U, d1], [E, U, d2] → [E, U, d3]."""
        import math

        E, U = x1.shape[0], x1.shape[1]
        g = self.LANES // math.gcd(U, self.LANES)
        Ep = -(-E // g) * g
        if Ep != E:
            x1 = jnp.pad(x1, ((0, Ep - E), (0, 0), (0, 0)))
            x2 = jnp.pad(x2, ((0, Ep - E), (0, 0), (0, 0)))
        out = self.contract_packed(self.pack(x1), self.pack(x2), w, U)
        return self.unpack(out, Ep, U)[:E]
