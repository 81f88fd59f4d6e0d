"""Fused sparse Clebsch–Gordan tensor-product Pallas kernel.

The TPU-native equivalent of the reference's FlashAllegro Triton kernels
(``allegro/nn/_strided/_flashallegro.py:24-282``): the channelwise CG
contraction

    out[k, z, u] = sum_{(i,j,k,p) in nnz(w3j)}  c * w[p, u] * x1[i, z, u] * x2[j, z, u]

evaluated entirely in VMEM, never materializing outer products to HBM.

Design (TPU-first, cf. pallas guide):

- **Dim-major layout** ``[D, E, U]``: slicing a basis dim yields a clean
  ``[BE, U]`` (sublane × lane) tile; the channel axis ``U`` rides the 128
  lanes (full efficiency at U=128, graceful at 32/64). The model-facing
  wrapper transposes from the strided ``[E, U, D]`` layout.
- **Static sparsity**: the nonzero CG entries ``(i, j, k, p, c)`` are baked
  into the kernel at trace time (the analogue of the Triton backend's CSR
  metadata, ``_flashallegro.py:284-378``), sorted by ``(i, j)`` so each
  distinct product ``x1[i] * x2[j]`` is formed once.
- **Custom VJP via index permutation**: the same kernel computes
  ``grad_x1`` with entries ``(k, j, i)`` over ``(g, x2)`` and ``grad_x2``
  with entries ``(i, k, j)`` over ``(x1, g)`` — exactly the trick the Triton
  backward uses (``_flashallegro.py:348-360,583-639``). ``grad_w`` is a
  third kernel that reduces the triple product over edges, accumulating
  ``[P, U]`` across sequential grid steps.
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


def sparse_entries(w3j_packed: np.ndarray, tol: float = 1e-12) -> Tuple[Entry, ...]:
    """Nonzero entries of the packed [P, d1, d2, d3] 3j buffer, (i,j,k,p,c)."""
    P, d1, d2, d3 = w3j_packed.shape
    entries: List[Entry] = []
    for p in range(P):
        idx = np.argwhere(np.abs(w3j_packed[p]) > tol)
        for i, j, k in idx:
            entries.append((int(i), int(j), int(k), int(p), float(w3j_packed[p, i, j, k])))
    # sort by (ia, ib) so the kernel reuses each x1[i]*x2[j] product
    entries.sort(key=lambda e: (e[0], e[1], e[2]))
    return tuple(entries)


def _permute_entries(entries, perm: str):
    """Remap entry roles for the backward passes (index-permutation trick)."""
    if perm == "fwd":  # out[k] += c w x1[i] x2[j]
        out = entries
    elif perm == "bwd1":  # grad_x1[i] += c w g[k] x2[j]
        out = tuple((k, j, i, p, c) for (i, j, k, p, c) in entries)
    elif perm == "bwd2":  # grad_x2[j] += c w x1[i] g[k]
        out = tuple((i, k, j, p, c) for (i, j, k, p, c) in entries)
    else:
        raise ValueError(perm)
    return tuple(sorted(out, key=lambda e: (e[0], e[1], e[2])))


def _tp_kernel(w_ref, a_ref, b_ref, o_ref, *, entries, d_out):
    """One edge-block: o[k, :, :] = sum c * w[p] * a[i] * b[j]."""
    acc = [None] * d_out
    cur = (-1, -1)
    t = None
    for ia, ib, io, p, c in entries:
        if (ia, ib) != cur:
            t = a_ref[ia] * b_ref[ib]  # [BE, U]
            cur = (ia, ib)
        contrib = (c * w_ref[p : p + 1]) * t  # [1,U] * [BE,U]
        acc[io] = contrib if acc[io] is None else acc[io] + contrib
    for k in range(d_out):
        if acc[k] is None:
            o_ref[k] = jnp.zeros_like(o_ref[k])
        else:
            o_ref[k] = acc[k]


def _tp_gradw_kernel(a_ref, b_ref, g_ref, ow_ref, *, entries, n_paths):
    """Accumulate grad_w[p, u] = sum_z c * a[i] * b[j] * g[k] across blocks."""
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
        contrib = c * jnp.sum(t * g_ref[io], axis=0, keepdims=True)  # [1, U]
        acc[p] = contrib if acc[p] is None else acc[p] + contrib
    for p in range(n_paths):
        if acc[p] is not None:
            ow_ref[p : p + 1] = ow_ref[p : p + 1] + acc[p]


def _pad_edges(x, be: int):
    E = x.shape[1]
    Ep = -(-E // be) * be
    if Ep == E:
        return x, E
    pad = [(0, 0)] * x.ndim
    pad[1] = (0, Ep - E)
    return jnp.pad(x, pad), E


def _run_tp(a, b, w, entries, d_out: int, be: int):
    """a [Da, E, U], b [Db, E, U], w [P, U] -> [d_out, E, U]."""
    a, E = _pad_edges(a, be)
    b, _ = _pad_edges(b, be)
    Ep, U = a.shape[1], a.shape[2]
    grid = (Ep // be,)
    out = pl.pallas_call(
        functools.partial(_tp_kernel, entries=entries, d_out=d_out),
        out_shape=jax.ShapeDtypeStruct((d_out, Ep, U), a.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((w.shape[0], U), lambda e: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((a.shape[0], be, U), lambda e: (0, e, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b.shape[0], be, U), lambda e: (0, e, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((d_out, be, U), lambda e: (0, e, 0), memory_space=pltpu.VMEM),
        interpret=INTERPRET,
    )(w, a, b)
    return out[:, :E]


def _run_gradw(a, b, g, n_paths: int, entries, be: int, dtype):
    a, _ = _pad_edges(a, be)
    b, _ = _pad_edges(b, be)
    g, _ = _pad_edges(g, be)
    Ep, U = a.shape[1], a.shape[2]
    grid = (Ep // be,)
    return pl.pallas_call(
        functools.partial(_tp_gradw_kernel, entries=entries, n_paths=n_paths),
        out_shape=jax.ShapeDtypeStruct((n_paths, U), dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((a.shape[0], be, U), lambda e: (0, e, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b.shape[0], be, U), lambda e: (0, e, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g.shape[0], be, U), lambda e: (0, e, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_paths, U), lambda e: (0, 0), memory_space=pltpu.VMEM),
        interpret=INTERPRET,
    )(a, b, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def tp_contract_dim_major(x1, x2, w, entries, d1: int, d2: int, d3: int, block_edges: int = 256):
    """Fused CG TP in dim-major layout.

    x1 [d1, E, U], x2 [d2, E, U], w [P, U] → out [d3, E, U].
    ``entries`` is the static nnz tuple from :func:`sparse_entries`.
    """
    return _run_tp(x1, x2, w, _permute_entries(entries, "fwd"), d3, block_edges)


def _tp_fwd(x1, x2, w, entries, d1, d2, d3, block_edges):
    out = _run_tp(x1, x2, w, _permute_entries(entries, "fwd"), d3, block_edges)
    return out, (x1, x2, w)


def _tp_bwd(entries, d1, d2, d3, block_edges, res, g):
    x1, x2, w = res
    gx1 = _run_tp(g, x2, w, _permute_entries(entries, "bwd1"), d1, block_edges)
    gx2 = _run_tp(x1, g, w, _permute_entries(entries, "bwd2"), d2, block_edges)
    gw = _run_gradw(
        x1, x2, g, w.shape[0], _permute_entries(entries, "fwd"), block_edges, w.dtype
    )
    return gx1, gx2, gw


tp_contract_dim_major.defvjp(_tp_fwd, _tp_bwd)


class PallasTPBackend:
    """Callable backend bound to one Contracter's static data.

    ``__call__(x1 [E,U,d1], x2 [E,U,d2], w)``: transposes to dim-major, runs
    the fused kernel, transposes back. ``w`` is [U, P] ("uuup" coupling) or
    [P] ("p" mode, broadcast across channels).
    """

    def __init__(self, w3j_packed: np.ndarray, block_edges: int = 256):
        self.entries = sparse_entries(w3j_packed)
        self.n_paths, self.d1, self.d2, self.d3 = w3j_packed.shape
        self.block_edges = block_edges

    LANES = 128

    def __call__(self, x1, x2, w):
        E, U = x1.shape[0], x1.shape[1]
        if w.ndim == 1:  # "p" mode: same path weights for all channels
            w_pu = jnp.broadcast_to(w[:, None], (self.n_paths, U))
        else:  # [U, P] -> [P, U]
            w_pu = w.T
        # Lane packing: the contraction is elementwise over (edge, channel),
        # so flatten (E, U) onto the 128-lane axis regardless of U — the
        # per-path weight pattern has period U and tiles exactly.
        L = self.LANES
        if U <= L and L % U == 0:
            rows_per_lane_group = L // U
            Ep = -(-E // rows_per_lane_group) * rows_per_lane_group
            pad = Ep - E

            def pack(x, d):
                if pad:
                    x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
                xdm = jnp.transpose(x, (2, 0, 1))  # [d, Ep, U]
                return xdm.reshape(d, Ep * U // L, L)

            w_tiled = jnp.tile(w_pu, (1, rows_per_lane_group))  # adjoint: sum
            out = tp_contract_dim_major(
                pack(x1, self.d1), pack(x2, self.d2), w_tiled.astype(x1.dtype),
                self.entries, self.d1, self.d2, self.d3, self.block_edges,
            )
            out = out.reshape(self.d3, Ep, U)[:, :E]
            return jnp.transpose(out, (1, 2, 0))
        x1dm = jnp.transpose(x1, (2, 0, 1))
        x2dm = jnp.transpose(x2, (2, 0, 1))
        out = tp_contract_dim_major(
            x1dm, x2dm, w_pu.astype(x1.dtype), self.entries,
            self.d1, self.d2, self.d3, self.block_edges,
        )
        return jnp.transpose(out, (1, 2, 0))
