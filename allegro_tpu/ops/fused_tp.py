"""Fused neighbor-environment + Clebsch-Gordan tensor-product Pallas kernels.

The second-generation TPU kernel family: where ``pallas_contract`` fuses only
the CG contraction (leaving the environment scatter/gather and layout packs to
XLA — measured ~5 ms/layer of pure data movement at production edge counts),
this module fuses the WHOLE per-layer dataflow of the reference Contracter
(``allegro/nn/_strided/_contract.py:185-251``) and of cuEquivariance's
in-kernel gather (``_cueq_contracter.py:104-123``):

    env-weight the SH basis  →  scatter edges→atoms  →  gather atoms→edges
    →  sparse-CG tensor product

into four Pallas kernels that never materialize a per-edge environment array
in HBM.

Key design elements (all TPU-idiomatic, no atomics, no manual DMA):

- **Rank space**: edges are center-sorted; atoms are renumbered by their rank
  among atoms-that-have-edges. Ranks are DENSE along the edge axis, so a block
  of ``eb`` edges touches at most ``eb`` consecutive rank rows — the window
  bound that makes static block shapes safe for ANY edge distribution (a
  count-based bound; an atom-id-based window has no such bound).
- **Two-window blocking**: the per-block rank window ``[rank_0, rank_0+eb)``
  straddles at most two ``eb``-aligned tiles of the environment array. Each
  kernel takes/produces the environment as TWO block-specs whose index maps
  are driven by a scalar-prefetched ``win[]`` array — standard Pallas
  pipelining (with revisit-elision) does all the data movement.
- **One-hot MXU gather/scatter**: within a block, atoms→edges expansion is
  ``G @ window`` and edges→atoms reduction is ``Gᵀ @ values`` with the 0/1
  matrix ``G[e, a] = (rank_e - win*eb == a)`` built from an iota — the MXU is
  otherwise idle in this VPU-bound kernel, and a one-hot product is exact.
- **Sequential-grid accumulation**: scatter outputs accumulate in VMEM across
  consecutive grid steps mapping to the same window (``win[]`` advances by at
  most one per block — guaranteed by rank density), initialized on window
  change. Never-visited rows are harmless: gathers only read visited windows.

The kernels are registered as JAX primitives in ``fused_primitives`` (JVP +
transpose rules — the trilinear family closes under differentiation, giving
arbitrary-order AD for force training, the role of the reference's
cuEquivariance training backend).
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Entry = Tuple[int, int, int, int, float]  # (i, j, k, p, c)


def compute_dtype(*dts):
    """In-kernel math runs at least in f32 (mixed-precision storage mode:
    per-edge arrays may live in HBM as bf16, but every product/accumulation
    happens in f32 in VMEM — the bf16-storage/f32-compute policy)."""
    out = jnp.float32
    for dt in dts:
        out = jnp.promote_types(out, dt)
    return out

# interpreter mode for CPU tests (set by tests/conftest via env or directly)
INTERPRET = False

# number of bf16 passes in the one-hot MXU products: 3 = exact f32 (default),
# 2 = ~7.6e-6 relative error at 2/3 the MXU cost (opt-in speed knob between
# exact and bf16 storage; see _split3_bf16). Env-tunable for the perf matrix.
import os as _os

ONEHOT_PASSES = int(_os.environ.get("ALLEGRO_ONEHOT_PASSES", "3"))
assert ONEHOT_PASSES in (2, 3), ONEHOT_PASSES


def set_onehot_passes(n: int) -> None:
    """Explicit setter for the one-hot split policy (ADVICE r3: the env var
    is only read at import time; callers that need a specific policy — e.g.
    the driver bench's 2-pass headline — must set it explicitly rather than
    relying on import order). Takes effect at the next trace."""
    global ONEHOT_PASSES
    assert n in (2, 3), n
    ONEHOT_PASSES = n

_HIGHEST = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# block plan (XLA ops, shared by every kernel of a force call)
# ---------------------------------------------------------------------------


def num_rank_rows(n_atoms: int, wr: int) -> int:
    """Static row count of the rank-space environment arrays (``wr`` = the
    plan's window row-block size — ``eb`` historically, 64 on the narrow-
    window fast path)."""
    return ((n_atoms + 1) // wr + 2) * wr


def make_block_plan(centers: jnp.ndarray, eb: int, wr: int = None):
    """Per-block window indices + per-edge window offsets, from sorted centers.

    centers: int32 [Ep] non-decreasing, padded edges carry an ``n_atoms``
    sentinel (sorted last). Ep must be a multiple of ``eb``.

    ``wr`` (default ``eb``): window ROW-block granularity. Returns
    (win [NB] int32, offs_padded [NB*8, eb] int32). ``offs`` values lie in
    [0, 2*wr): row ``rank_e - win[b]*wr`` of the (two-tile) window. With
    ``wr = eb`` any sorted edge distribution is valid (a block of ``eb``
    edges spans at most ``eb`` ranks); smaller ``wr`` requires every block's
    rank span to fit the narrower pair — callers must validate on host
    (:func:`make_block_plan_np` raises) before choosing it.
    """
    wr = eb if wr is None else wr
    (Ep,) = centers.shape
    assert Ep % eb == 0, (Ep, eb)
    nb = Ep // eb
    neq = (centers[1:] != centers[:-1]).astype(jnp.int32)
    ranks = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(neq)])
    win = ranks[::eb] // wr  # [NB]
    offs = ranks - jnp.repeat(win * wr, eb, total_repeat_length=Ep)
    offs = offs.reshape(nb, 1, eb)
    # pad rows to 8 so the block shape (8, eb) is tile-legal; row 0 is real
    offs_padded = jnp.concatenate(
        [offs, jnp.zeros((nb, 7, eb), jnp.int32)], axis=1
    ).reshape(nb * 8, eb)
    return win, offs_padded


def make_block_plan_np(centers: np.ndarray, eb: int, n_atoms: int,
                       wr: int = None):
    """Host (numpy) twin of :func:`make_block_plan`, for precomputing the
    plan ONCE per neighbor list (``Model.precompute_statics``) instead of
    re-deriving it inside every jitted force step (~0.5 ms/step of cumsum/
    repeat fusions at production edge counts). Also validates the fused
    backends' sorted-centers invariant, which the jitted path silently
    assumes: unsorted edge input would give silently wrong environments.

    ``centers``: int32 [E] (unpadded OK — padded here to a multiple of
    ``eb`` with the ``n_atoms`` sentinel). Returns (win, offs_padded, Ep).

    ``wr < eb`` raises ValueError when some block's rank span does not fit
    the narrow window pair (callers fall back to ``wr = eb``).
    """
    wr = eb if wr is None else wr
    if wr != eb and wr % 8 != 0:
        # sublane-axis block shapes must be 8-row multiples — Mosaic would
        # otherwise reject the (wr, eb) window blocks only at compile time,
        # deep inside the first force step, with an opaque error (ADVICE r4)
        raise ValueError(
            f"window_rows={wr} is not a multiple of 8 (TPU sublane tile); "
            f"use a multiple of 8 or wr={eb}"
        )
    centers = np.asarray(centers)
    real = centers[centers < n_atoms] if centers.size else centers
    if real.size and (np.diff(real) < 0).any():
        raise ValueError(
            "fused TP backends require edges sorted by center atom "
            "(non-decreasing edge_index[0]; the in-repo neighbor_list/"
            "simulation pipelines produce this order)"
        )
    E = centers.shape[0]
    Ep = -(-E // eb) * eb
    if Ep != E:
        centers = np.concatenate(
            [centers, np.full(Ep - E, n_atoms, dtype=centers.dtype)]
        )
    nb = Ep // eb
    neq = (centers[1:] != centers[:-1]).astype(np.int32)
    ranks = np.concatenate([np.zeros(1, np.int32), np.cumsum(neq, dtype=np.int32)])
    win = (ranks[::eb] // wr).astype(np.int32)
    offs = (ranks - np.repeat(win * wr, eb)).astype(np.int32).reshape(nb, 1, eb)
    if wr != eb:
        if offs.size and int(offs.max()) >= 2 * wr:
            raise ValueError(
                f"window_rows={wr} too small: a {eb}-edge block spans "
                f"{int(offs.max()) + 1} rank rows (> {2 * wr}); use wr={eb}"
            )
        # the raw-window garbage masks (_combine_window_tiles) and the
        # scatter accumulate-on-revisit init both assume win is CONTIGUOUS
        # (advances by at most 1 per block) — automatic at wr == eb, but a
        # block that exactly fills its window pair can jump by 2 at wr < eb
        if win.size > 1 and int(np.diff(win).max(initial=0)) > 1:
            raise ValueError(
                f"window_rows={wr}: window index jumps by more than 1 "
                f"between consecutive blocks; use wr={eb}"
            )
    offs_padded = np.concatenate(
        [offs, np.zeros((nb, 7, eb), np.int32)], axis=1
    ).reshape(nb * 8, eb)
    return win, offs_padded, Ep


def sort_entries_for_pairs(entries: Sequence[Entry], a: int = 0, b: int = 1):
    """Sort entries so consecutive ones share the (entries[a], entries[b]) pair
    (one product formed per distinct pair inside the kernels)."""
    return tuple(sorted(entries, key=lambda e: (e[a], e[b], e[2])))


def combine_scatter_outputs(dA, dB, win, eb: int):
    """Sum the two scatter-window partials into one environment array.

    Each partial array only has DEFINED contents on the window blocks its
    spec visited (A: [win0, win_last], B: shifted by one); everything else is
    uninitialized memory. Mask before adding so garbage never reaches the
    gathered row range [win0*eb, (win_last+2)*eb).

    ``eb`` here is the plan's window row unit — pass the plan's ``wr`` when
    the partials came from a narrow-window (wr < eb) plan."""
    rows = dA.shape[0]
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    w0, wl = win[0], win[-1]
    mA = jnp.logical_and(r >= w0 * eb, r < (wl + 1) * eb)
    mB = jnp.logical_and(r >= (w0 + 1) * eb, r < (wl + 2) * eb)
    zero = jnp.zeros((), dA.dtype)
    return jnp.where(mA, dA, zero) + jnp.where(mB, dB, zero)


# ---------------------------------------------------------------------------
# in-kernel helpers
# ---------------------------------------------------------------------------


_DN_ROWS = (((1,), (0,)), ((), ()))


def _split3_bf16(x):
    """Exact 3-term bf16 decomposition of f32: x == x0 + x1 + x2 (24 mantissa
    bits covered, hierarchically non-overlapping; the HIGHEST-precision MXU
    algorithm uses the same split with 6 products — a one-hot factor needs
    only the data side split, so 3 bf16 passes reproduce the f32 result
    EXACTLY at half the cost)."""
    x0 = x.astype(jnp.bfloat16)
    r1 = x - x0.astype(jnp.float32)
    x1 = r1.astype(jnp.bfloat16)
    x2 = (r1 - x1.astype(jnp.float32)).astype(jnp.bfloat16)
    return x0, x1, x2


def _split_parts(data, dtype, passes=None):
    """Split a one-hot-product data operand ONCE into its MXU passes.

    Returns ``(parts, spec)`` for :func:`_dot_parts`; callers that multiply
    the same data against several one-hot masks (the A/B window pair) hoist
    this so the split VPU ops (~1/8 of a one-hot site on chip) run once.

    f32 data: ``passes`` bf16 splits (3 = exact, see _split3_bf16; 2 drops
    the smallest term, ~7.6e-6 rel). ``passes=None`` resolves the module
    default ONEHOT_PASSES at trace time; callers with a per-model policy
    (builder kwarg ``onehot_passes``) or an exactness requirement (position
    gathers) pass it explicitly. Other dtypes (f64 tests, bf16 storage): a
    single pass at HIGHEST.
    """
    passes = ONEHOT_PASSES if passes is None else passes
    data = data.astype(dtype)
    if dtype == jnp.float32 and not INTERPRET:
        return _split3_bf16(data)[:passes], (jnp.bfloat16, False, jnp.float32)
    if dtype == jnp.float32 and INTERPRET and passes != 3:
        # interpret-mode (CPU tests) emulation of the REDUCED-pass policy:
        # drop the same split terms the MXU path drops, but run the dots at
        # HIGHEST on f32-cast parts (what matters for accuracy is the
        # deterministic bf16 rounding of the data split, not the MXU's
        # accumulation) — so tests/model/test_onehot_passes.py actually
        # exercises the 2-pass rounding (ADVICE r3 high). The 3-pass split is
        # bitwise-exact f32 reconstruction, so the plain HIGHEST pass below
        # covers it without tripling interpret-mode test cost.
        parts = tuple(
            p.astype(jnp.float32) for p in _split3_bf16(data)[:passes]
        )
        return parts, (jnp.float32, True, jnp.float32)
    acc = jnp.promote_types(dtype, jnp.float32)
    return (data,), (dtype, True, acc)


def _dot_parts(g_bool, parts, spec, right=False):
    """Σ over ``parts`` of the one-hot product (pass policy baked by
    :func:`_split_parts`). ``right=False``: g @ part; ``right=True``:
    part @ g."""
    gdt, use_highest, pref = spec
    g = g_bool.astype(gdt)
    out = None
    for part in parts:
        a, b = (part, g) if right else (g, part)
        t = jax.lax.dot_general(
            a, b, _DN_ROWS,
            precision=_HIGHEST if use_highest else None,
            preferred_element_type=pref,
        )
        out = t if out is None else out + t
    return out


def _onehot_dot(g_bool, data, dtype, passes=None):
    """g_bool [m, n] one-hot rows (bool) @ data [n, C] — exact, fast."""
    parts, spec = _split_parts(data, dtype, passes)
    return _dot_parts(g_bool, parts, spec)


def _onehot_dot_right(data, g_bool, dtype, passes=None):
    """data [C, n] @ one-hot g_bool [n, m] — right-multiplied twin of
    :func:`_onehot_dot` (same split-pass policy)."""
    parts, spec = _split_parts(data, dtype, passes)
    return _dot_parts(g_bool, parts, spec, right=True)


def _gather_windows(o, envA, envB, wr: int, dtype, passes=None):
    """One-hot gather of per-edge environment rows from the two window tiles.

    o [eb] int32 in [0, 2*wr); envA/envB [wr, C]. Exact: each G row has at
    most one nonzero (1.0), so MXU accumulation order cannot change the value;
    the split-matmul keeps f32 mantissas intact through the bf16-based MXU.

    Narrow windows (2*wr <= 128, the wr=64 fast path): the pair concatenates
    into a single <=128-row operand, so the whole gather is ONE one-hot
    product per split pass — half the MXU streaming and half the data split
    of the two-window form (the MXU's K granularity is 128: two wr=128
    window dots cost two full K tiles; a 128-row concat costs one).
    """
    m = o.shape[0]
    if 2 * wr <= 128:
        env = jnp.concatenate([envA, envB], axis=0)  # [2*wr, C]
        ii = jax.lax.broadcasted_iota(jnp.int32, (m, 2 * wr), 1)
        return _onehot_dot(ii == o[:, None], env, dtype, passes)
    ii = jax.lax.broadcasted_iota(jnp.int32, (m, wr), 1)
    oc = o[:, None]
    return _onehot_dot(ii == oc, envA, dtype, passes) + _onehot_dot(
        ii == (oc - wr), envB, dtype, passes
    )


def _scatter_windows(o, vals, wr: int, dtype, passes=None):
    """One-hot scatter (transpose of gather): per-window sums of vals rows.

    Returns (sumA [wr, C], sumB [wr, C]). Exact for the same reason only when
    each window row receives one edge; with many edges per atom the MXU
    accumulates in f32 (preferred_element_type) — same precision as XLA's
    segment_sum. Narrow windows: one one-hot product, split into halves
    (see :func:`_gather_windows`).
    """
    m = o.shape[0]
    parts, spec = _split_parts(vals, dtype, passes)  # split once for A and B
    if 2 * wr <= 128:
        ii = jax.lax.broadcasted_iota(jnp.int32, (2 * wr, m), 0)
        s = _dot_parts(ii == o[None, :], parts, spec)  # [2*wr, C]
        return s[:wr, :], s[wr:, :]
    ii = jax.lax.broadcasted_iota(jnp.int32, (wr, m), 0)
    orow = o[None, :]
    sa = _dot_parts(ii == orow, parts, spec)
    sb = _dot_parts(ii == (orow - wr), parts, spec)
    return sa, sb


def _tp_accumulate(x_cols, y_cols, w_ref, entries, U: int, d_out: int, out_dtype):
    """acc[k] = Σ_entries c * w[p] * x_cols[i] * y_cols[j]; returns list [d_out].

    x_cols/y_cols: callables dim -> [eb, U] value (so callers can slice from
    refs or computed arrays uniformly). Consecutive entries sharing (i, j)
    reuse the product.
    """
    acc = [None] * d_out
    cur = (-1, -1)
    t = None
    for i, j, k, p, c in entries:
        if (i, j) != cur:
            t = x_cols(i) * y_cols(j)
            cur = (i, j)
        wrow = w_ref[p, :][None, :].astype(t.dtype)  # [1, U] broadcast
        contrib = t * (c * wrow)
        acc[k] = contrib if acc[k] is None else acc[k] + contrib
    return acc


def _tp_accumulate_T(x_rows, y_rows, wT, entries, U: int, d_out: int):
    """Transposed accumulate: operands are ROW slices [U, eb] of feature-major
    arrays — full 128-lane VPU utilization (the edge axis rides the lanes;
    measured 2x over the [eb, U] column-slice form at U=32). ``wT`` [U, P].
    Returns list of [U, eb] blocks (None where no entry lands)."""
    acc = [None] * d_out
    cur = (-1, -1)
    t = None
    for i, j, k, p, c in entries:
        if (i, j) != cur:
            t = x_rows(i) * y_rows(j)
            cur = (i, j)
        contrib = t * (c * wT[:, p][:, None])
        acc[k] = contrib if acc[k] is None else acc[k] + contrib
    return acc


def _cat_T(acc, U: int, eb: int, dtype):
    """Stack accumulate blocks [U, eb] into [d*U, eb] (zeros where None)."""
    return jnp.concatenate(
        [a if a is not None else jnp.zeros((U, eb), dtype) for a in acc], axis=0
    )


def _first_visit(win_ref):
    b = pl.program_id(0)
    prev = win_ref[jnp.maximum(b - 1, 0)]
    return jnp.logical_or(b == 0, win_ref[b] != prev)


# ---------------------------------------------------------------------------
# raw-window (combine-free) environment plumbing — the inference fast path.
#
# The scatter kernels produce TWO partial arrays (A, B) whose tiles are only
# DEFINED on the windows their specs visited. The default (training) path
# masks+adds them into one combined array (`combine_scatter_outputs`) that
# the primitives treat as a first-class value — three extra full passes over
# [n_rank_rows, d2*U] per combine (~1.4 ms/step at 100k atoms across
# fwd env + bwd denv). The `*_raw_call` variants below skip the combine:
# consumers view BOTH partials through four window specs (A@w, A@w+1, B@w,
# B@w+1) and reconstruct the two combined tiles in VMEM with the same
# validity masks, computed from scalars of the prefetched `win` array:
#   tile w:    A@w valid always (visited windows only); B@w garbage iff
#              w == win[0] (no block wrote B there)
#   tile w+1:  A@(w+1) garbage iff w == win[-1]; B@(w+1) valid always
# ---------------------------------------------------------------------------


def _combine_window_tiles(win_ref, nb, Aw, Aw1, Bw, Bw1, dtype):
    b = pl.program_id(0)
    w = win_ref[b]
    w0 = win_ref[0]
    wl = win_ref[nb - 1]
    zero = jnp.zeros((), dtype)
    envW = Aw.astype(dtype) + jnp.where(w > w0, Bw.astype(dtype), zero)
    envW1 = jnp.where(w < wl, Aw1.astype(dtype), zero) + Bw1.astype(dtype)
    return envW, envW1


def _env_pair_specs(cols, wr):
    """Four window specs over the (A, B) partial pair (pass each array twice).
    ``wr``: the plan's window row-block size (``eb`` classically; 64 on the
    narrow-window fast path — half-size window DMA + single one-hot tile)."""
    return [
        pl.BlockSpec((wr, cols), lambda b, w_: (w_[b], 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((wr, cols), lambda b, w_: (w_[b] + 1, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((wr, cols), lambda b, w_: (w_[b], 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((wr, cols), lambda b, w_: (w_[b] + 1, 0), memory_space=pltpu.VMEM),
    ]


# ---------------------------------------------------------------------------
# kernel B: fused gather + TP   out[e, kU+u] = Σ c w[p,u] x[e, iU+u] env[rank_e, jU+u]
# ---------------------------------------------------------------------------


def _gather_tp_kernel(
    win_ref, offs_ref, x_ref, envA_ref, envB_ref, w_ref, out_ref, *, entries, dims, U, eb, wr, passes=None
):
    d1, d2, d3 = dims
    o = offs_ref[0, :]
    cdt = compute_dtype(x_ref.dtype, envA_ref.dtype)
    env_eT = _gather_windows(o, envA_ref[...], envB_ref[...], wr, cdt, passes).T
    xT = x_ref[...].astype(cdt).T
    wT = w_ref[...].astype(cdt).T
    acc = _tp_accumulate_T(
        lambda i: xT[i * U : (i + 1) * U, :],
        lambda j: env_eT[j * U : (j + 1) * U, :],
        wT, entries, U, d3,
    )
    out_ref[...] = _cat_T(acc, U, eb, cdt).T.astype(out_ref.dtype)


def gather_tp_call(x, envA, envB, w, offs_p, win, *, entries, dims, U, eb,
                   wr=None, passes=None):
    """x [Ep, d1*U], envA/envB [Na, d2*U], w [P, U] → out [Ep, d3*U]."""
    wr = eb if wr is None else wr
    Ep = x.shape[0]
    nb = Ep // eb
    d1, d2, d3 = dims
    entries = sort_entries_for_pairs(entries)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((8, eb), lambda b, w_: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((eb, d1 * U), lambda b, w_: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wr, d2 * U), lambda b, w_: (w_[b], 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wr, d2 * U), lambda b, w_: (w_[b] + 1, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((eb, d3 * U), lambda b, w_: (b, 0), memory_space=pltpu.VMEM),
    )
    kern = functools.partial(
        _gather_tp_kernel, entries=entries, dims=dims, U=U, eb=eb, wr=wr,
        passes=passes,
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((Ep, d3 * U), x.dtype),
        grid_spec=grid_spec,
        interpret=INTERPRET,
    )(win, offs_p, x, envA, envB, w)


def _gather_tp_raw_kernel(
    win_ref, offs_ref, x_ref, Aw_ref, Aw1_ref, Bw_ref, Bw1_ref, w_ref, out_ref,
    *maybe_ts, entries, dims, U, eb, wr, nb, passes=None
):
    d1, d2, d3 = dims
    o = offs_ref[0, :]
    cdt = compute_dtype(x_ref.dtype, Aw_ref.dtype)
    envW, envW1 = _combine_window_tiles(
        win_ref, nb, Aw_ref[...], Aw1_ref[...], Bw_ref[...], Bw1_ref[...], cdt
    )
    env_eT = _gather_windows(o, envW, envW1, wr, cdt, passes).T
    xT = x_ref[...].astype(cdt).T
    wT = w_ref[...].astype(cdt).T
    acc = _tp_accumulate_T(
        lambda i: xT[i * U : (i + 1) * U, :],
        lambda j: env_eT[j * U : (j + 1) * U, :],
        wT, entries, U, d3,
    )
    out_ref[...] = _cat_T(acc, U, eb, cdt).T.astype(out_ref.dtype)
    if maybe_ts:
        # the leading-0e scalar block as its OWN output: downstream consumers
        # (the latent MLP pieces) read [Ep, U] instead of slicing the full
        # [Ep, d3*U] (XLA pays a full-array read per slice), and the two
        # cotangents stay separate instead of a pad+add fusion
        ts = acc[0] if acc[0] is not None else jnp.zeros((U, eb), cdt)
        maybe_ts[0][...] = ts.T.astype(maybe_ts[0].dtype)


def gather_tp_raw_call(x, eA, eB, w, offs_p, win, *, entries, dims, U, eb,
                       wr=None, passes=None, split_scalars=False,
                       scalar_dtype=None):
    """Raw-window twin of :func:`gather_tp_call`: takes the UNcombined
    scatter partials (eA, eB) and reconstructs the window tiles in VMEM.

    ``split_scalars=True``: additionally returns the leading scalar block
    ``out[:, :U]`` as a separate [Ep, U] array (``scalar_dtype`` storage,
    default the compute dtype) — returns (out, tp_scalars)."""
    wr = eb if wr is None else wr
    Ep = x.shape[0]
    nb = Ep // eb
    d1, d2, d3 = dims
    entries = sort_entries_for_pairs(entries)
    out_specs = pl.BlockSpec((eb, d3 * U), lambda b, w_: (b, 0), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((Ep, d3 * U), x.dtype)
    if split_scalars:
        out_specs = [
            out_specs,
            pl.BlockSpec((eb, U), lambda b, w_: (b, 0), memory_space=pltpu.VMEM),
        ]
        out_shape = [
            out_shape,
            jax.ShapeDtypeStruct(
                (Ep, U), scalar_dtype or compute_dtype(x.dtype, eA.dtype)
            ),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((8, eb), lambda b, w_: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((eb, d1 * U), lambda b, w_: (b, 0), memory_space=pltpu.VMEM),
            *_env_pair_specs(d2 * U, wr),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
    )
    kern = functools.partial(
        _gather_tp_raw_kernel, entries=entries, dims=dims, U=U, eb=eb, wr=wr,
        nb=nb, passes=passes,
    )
    return pl.pallas_call(
        kern,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=INTERPRET,
    )(win, offs_p, x, eA, eA, eB, eB, w)


# ---------------------------------------------------------------------------
# embed-fused kernel B (layer 0): the initial tensor features
#   x0[e, i*U+u] = sh[e, dims_map[i]] * w2b[e, irr(dims_map[i])*U+u]
# (the two-body tensor embedding, reference allegro/nn/tensorembed.py:85-96)
# are built ON THE FLY inside the gather+TP kernel from the tiny factors
# (sh [E, d_sh], w2b [E, n_irr*U]) — the [E, d1*U] initial features and their
# [E, d1*U] cotangent never exist in HBM (~4x [E, 288]-sized passes/step at
# production edge counts). ``dims_map`` applies the ladder's backward pruning
# of the layer-0 input irreps as a static row selection.
# ---------------------------------------------------------------------------


def _embed_rows(shT, w2bT, row_specs, U):
    """Lazy per-dim builder of x0 row blocks [U, eb] from the factors."""
    cache = {}

    def rows(i):
        if i not in cache:
            j, irr = row_specs[i]
            cache[i] = shT[j : j + 1, :] * w2bT[irr * U : (irr + 1) * U, :]
        return cache[i]

    return rows


def _gather_tp_embed_raw_kernel(
    win_ref, offs_ref, sh_ref, w2b_ref, Aw_ref, Aw1_ref, Bw_ref, Bw1_ref, w_ref,
    out_ref, *maybe_ts, entries, dims, U, eb, wr, nb, row_specs, passes=None
):
    d1, d2, d3 = dims
    o = offs_ref[0, :]
    cdt = compute_dtype(w2b_ref.dtype, Aw_ref.dtype)
    envW, envW1 = _combine_window_tiles(
        win_ref, nb, Aw_ref[...], Aw1_ref[...], Bw_ref[...], Bw1_ref[...], cdt
    )
    env_eT = _gather_windows(o, envW, envW1, wr, cdt, passes).T
    shT = sh_ref[...].astype(cdt)          # [d_sh, eb] (pre-transposed operand)
    w2bT = w2b_ref[...].astype(cdt).T      # [n_irr*U, eb]
    wT = w_ref[...].astype(cdt).T
    x_rows = _embed_rows(shT, w2bT, row_specs, U)
    acc = _tp_accumulate_T(
        x_rows,
        lambda j: env_eT[j * U : (j + 1) * U, :],
        wT, entries, U, d3,
    )
    out_ref[...] = _cat_T(acc, U, eb, cdt).T.astype(out_ref.dtype)
    if maybe_ts:
        ts = acc[0] if acc[0] is not None else jnp.zeros((U, eb), cdt)
        maybe_ts[0][...] = ts.T.astype(maybe_ts[0].dtype)


def gather_tp_embed_raw_call(
    sh, w2b, eA, eB, w, offs_p, win, *, entries, dims, U, eb, row_specs,
    wr=None, out_dtype=None, passes=None, split_scalars=False,
    scalar_dtype=None,
):
    """sh [Ep, d_sh], w2b [Ep, n_irr*U], raw env pair → out [Ep, d3*U]
    (or (out, tp_scalars [Ep, U]) with ``split_scalars``).

    ``row_specs``: tuple of (sh_dim, irrep) per layer-0 input dim (the
    ladder-pruned selection)."""
    wr = eb if wr is None else wr
    Ep = sh.shape[0]
    nb = Ep // eb
    d1, d2, d3 = dims
    assert d1 == len(row_specs), (d1, row_specs)
    d_sh = sh.shape[1]
    n_cols = w2b.shape[1]
    entries = sort_entries_for_pairs(entries)
    sh_t = sh.T
    out_specs = pl.BlockSpec((eb, d3 * U), lambda b, w_: (b, 0), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((Ep, d3 * U), out_dtype or compute_dtype(w2b.dtype))
    if split_scalars:
        out_specs = [
            out_specs,
            pl.BlockSpec((eb, U), lambda b, w_: (b, 0), memory_space=pltpu.VMEM),
        ]
        out_shape = [
            out_shape,
            jax.ShapeDtypeStruct((Ep, U), scalar_dtype or compute_dtype(w2b.dtype)),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((8, eb), lambda b, w_: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_sh, eb), lambda b, w_: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((eb, n_cols), lambda b, w_: (b, 0), memory_space=pltpu.VMEM),
            *_env_pair_specs(d2 * U, wr),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
    )
    kern = functools.partial(
        _gather_tp_embed_raw_kernel, entries=entries, dims=dims, U=U, eb=eb,
        wr=wr, nb=nb, row_specs=tuple(row_specs), passes=passes,
    )
    return pl.pallas_call(
        kern,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=INTERPRET,
    )(win, offs_p, sh_t, w2b, eA, eA, eB, eB, w)


def _bwd_embed_raw_kernel(
    win_ref, offs_ref, sh_ref, w2b_ref, g_ref, *refs, entries, dims, U, eb, wr,
    nb, row_specs, n_irr, passes=None, with_gts=False
):
    """Backward of the embed-fused gather+TP: (dsh, dw2b, denv pair) in one
    pass — dx never exists; its role is played by in-register [U, eb] blocks
    immediately reduced onto the factors (the unweight_both pattern)."""
    if with_gts:
        gts_ref, Aw_ref, Aw1_ref, Bw_ref, Bw1_ref, w_ref = refs[:6]
        dsh_ref, dw2b_ref, dA_ref, dB_ref = refs[6:]
    else:
        gts_ref = None
        Aw_ref, Aw1_ref, Bw_ref, Bw1_ref, w_ref = refs[:5]
        dsh_ref, dw2b_ref, dA_ref, dB_ref = refs[5:]
    d1, d2, d3 = dims
    d_sh = dsh_ref.shape[0]
    o = offs_ref[0, :]
    cdt = compute_dtype(w2b_ref.dtype, g_ref.dtype, Aw_ref.dtype)
    envW, envW1 = _combine_window_tiles(
        win_ref, nb, Aw_ref[...], Aw1_ref[...], Bw_ref[...], Bw1_ref[...], cdt
    )
    env_eT = _gather_windows(o, envW, envW1, wr, cdt, passes).T
    shT = sh_ref[...].astype(cdt)
    w2bT = w2b_ref[...].astype(cdt).T
    gT = g_ref[...].astype(cdt).T
    if gts_ref is not None:
        gT = jnp.concatenate(
            [gT[:U, :] + gts_ref[...].astype(cdt).T, gT[U:, :]], axis=0
        )
    wT = w_ref[...].astype(cdt).T
    x_rows = _embed_rows(shT, w2bT, row_specs, U)

    # dx[i] = Σ c w[p] g_k env_j — reduced in-register onto (dsh, dw2b)
    dx_acc = [None] * d1
    cur = (-1, -1)
    t = None
    for k, j, i, p, c in sorted((k, j, i, p, c) for (i, j, k, p, c) in entries):
        if (k, j) != cur:
            t = gT[k * U : (k + 1) * U, :] * env_eT[j * U : (j + 1) * U, :]
            cur = (k, j)
        contrib = t * (c * wT[:, p][:, None])
        dx_acc[i] = contrib if dx_acc[i] is None else dx_acc[i] + contrib
    dsh_rows = [None] * d_sh
    dw2b_acc = [None] * n_irr
    for i in range(d1):
        if dx_acc[i] is None:
            continue
        jdim, irr = row_specs[i]
        red = jnp.sum(
            dx_acc[i] * w2bT[irr * U : (irr + 1) * U, :], axis=0, keepdims=True
        )
        dsh_rows[jdim] = red if dsh_rows[jdim] is None else dsh_rows[jdim] + red
        prod = dx_acc[i] * shT[jdim : jdim + 1, :]
        dw2b_acc[irr] = prod if dw2b_acc[irr] is None else dw2b_acc[irr] + prod
    zero_row = jnp.zeros((1, eb), cdt)
    dsh_ref[...] = jnp.concatenate(
        [r if r is not None else zero_row for r in dsh_rows], axis=0
    ).astype(dsh_ref.dtype)
    dw2b_ref[...] = jnp.concatenate(
        [a if a is not None else jnp.zeros((U, eb), cdt) for a in dw2b_acc],
        axis=0,
    ).T.astype(dw2b_ref.dtype)

    # denv[j] = Σ c w[p] x_i g_k — x built on the fly
    denv_acc = [None] * d2
    cur = (-1, -1)
    t = None
    for i, k, j, p, c in sorted((i, k, j, p, c) for (i, j, k, p, c) in entries):
        if (i, k) != cur:
            t = x_rows(i) * gT[k * U : (k + 1) * U, :]
            cur = (i, k)
        contrib = t * (c * wT[:, p][:, None])
        denv_acc[j] = contrib if denv_acc[j] is None else denv_acc[j] + contrib
    vals = _cat_T(denv_acc, U, eb, cdt).T
    sa, sb = _scatter_windows(o, vals, wr, cdt, passes)
    first = _first_visit(win_ref)

    @pl.when(first)
    def _():
        dA_ref[...] = jnp.zeros_like(dA_ref)
        dB_ref[...] = jnp.zeros_like(dB_ref)

    dA_ref[...] = dA_ref[...] + sa.astype(dA_ref.dtype)
    dB_ref[...] = dB_ref[...] + sb.astype(dB_ref.dtype)


def bwd_embed_raw_call(
    sh, w2b, g, eA, eB, w, offs_p, win, *, entries, dims, U, eb, n_rank_rows,
    row_specs, wr=None, passes=None, gts=None,
):
    """→ (dsh [Ep, d_sh], dw2b [Ep, n_irr*U], dA, dB [Nr, d2*U]).
    ``gts`` [Ep, U]: split-scalar-output cotangent folded into g in VMEM."""
    wr = eb if wr is None else wr
    Ep = sh.shape[0]
    nb = Ep // eb
    d1, d2, d3 = dims
    d_sh = sh.shape[1]
    n_cols = w2b.shape[1]
    n_irr = n_cols // U
    sh_t = sh.T
    in_specs = [
        pl.BlockSpec((8, eb), lambda b, w_: (b, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((d_sh, eb), lambda b, w_: (0, b), memory_space=pltpu.VMEM),
        pl.BlockSpec((eb, n_cols), lambda b, w_: (b, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((eb, d3 * U), lambda b, w_: (b, 0), memory_space=pltpu.VMEM),
    ]
    args = [win, offs_p, sh_t, w2b, g]
    if gts is not None:
        in_specs.append(
            pl.BlockSpec((eb, U), lambda b, w_: (b, 0), memory_space=pltpu.VMEM)
        )
        args.append(gts)
    in_specs.extend(_env_pair_specs(d2 * U, wr))
    in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    args.extend([eA, eA, eB, eB, w])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((d_sh, eb), lambda b, w_: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((eb, n_cols), lambda b, w_: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wr, d2 * U), lambda b, w_: (w_[b], 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wr, d2 * U), lambda b, w_: (w_[b] + 1, 0), memory_space=pltpu.VMEM),
        ],
    )
    kern = functools.partial(
        _bwd_embed_raw_kernel, entries=tuple(entries), dims=dims, U=U, eb=eb,
        wr=wr, nb=nb, row_specs=tuple(row_specs), n_irr=n_irr, passes=passes,
        with_gts=gts is not None,
    )
    cdt = compute_dtype(w2b.dtype, g.dtype)
    env_shape = jax.ShapeDtypeStruct((n_rank_rows, d2 * U), cdt)
    dshT, dw2b, dA, dB = pl.pallas_call(
        kern,
        out_shape=[
            jax.ShapeDtypeStruct((d_sh, Ep), cdt),
            jax.ShapeDtypeStruct((Ep, n_cols), cdt),
            env_shape,
            env_shape,
        ],
        grid_spec=grid_spec,
        interpret=INTERPRET,
    )(*args)
    return dshT.T, dw2b, dA, dB


# ---------------------------------------------------------------------------
# kernel C: TP + scatter   denv[r, jU+u] = Σ_{e: rank_e=r} Σ c w[p,u] x[e,iU+u] g[e,kU+u]
# ---------------------------------------------------------------------------


def _tp_scatter_kernel(
    win_ref, offs_ref, x_ref, g_ref, w_ref, outA_ref, outB_ref, *, entries, dims, U, eb, wr, passes=None
):
    d1, d2, d3 = dims
    o = offs_ref[0, :]
    cdt = compute_dtype(x_ref.dtype, g_ref.dtype)
    xT = x_ref[...].astype(cdt).T
    gT = g_ref[...].astype(cdt).T
    wT = w_ref[...].astype(cdt).T
    # per-edge values indexed by the ATOM dim j: entries roles (i -> x, k -> g)
    acc = _tp_accumulate_T(
        lambda i: xT[i * U : (i + 1) * U, :],
        lambda k: gT[k * U : (k + 1) * U, :],
        wT,
        tuple((i, k, j, p, c) for (i, j, k, p, c) in entries),
        U, d2,
    )
    vals = _cat_T(acc, U, eb, cdt).T  # [eb, d2*U]
    sa, sb = _scatter_windows(o, vals, wr, cdt, passes)
    first = _first_visit(win_ref)

    @pl.when(first)
    def _():
        outA_ref[...] = jnp.zeros_like(outA_ref)
        outB_ref[...] = jnp.zeros_like(outB_ref)

    outA_ref[...] = outA_ref[...] + sa.astype(outA_ref.dtype)
    outB_ref[...] = outB_ref[...] + sb.astype(outB_ref.dtype)


def tp_scatter_call(x, g, w, offs_p, win, *, entries, dims, U, eb,
                    n_rank_rows, wr=None, passes=None):
    """x [Ep, d1*U], g [Ep, d3*U], w [P, U] → (dA, dB) each [Na, d2*U]."""
    wr = eb if wr is None else wr
    Ep = x.shape[0]
    nb = Ep // eb
    d1, d2, d3 = dims
    entries = sort_entries_for_pairs(entries, 0, 2)  # reuse x_i * g_k products
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((8, eb), lambda b, w_: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((eb, d1 * U), lambda b, w_: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((eb, d3 * U), lambda b, w_: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((wr, d2 * U), lambda b, w_: (w_[b], 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wr, d2 * U), lambda b, w_: (w_[b] + 1, 0), memory_space=pltpu.VMEM),
        ],
    )
    kern = functools.partial(
        _tp_scatter_kernel, entries=entries, dims=dims, U=U, eb=eb, wr=wr,
        passes=passes,
    )
    # env cotangents accumulate across grid steps — keep them >= f32 even
    # when the per-edge operands are stored bf16
    shape = jax.ShapeDtypeStruct((n_rank_rows, d2 * U), compute_dtype(x.dtype, g.dtype))
    return pl.pallas_call(
        kern,
        out_shape=[shape, shape],
        grid_spec=grid_spec,
        interpret=INTERPRET,
    )(win, offs_p, x, g, w)


# ---------------------------------------------------------------------------
# kernel DW: weight gradient   dw[p, u] = Σ_e Σ_{(i,j,k)∈p} c x_i env_j g_k
# ---------------------------------------------------------------------------


def _gather_dw_kernel(
    win_ref, offs_ref, x_ref, envA_ref, envB_ref, g_ref, out_ref, *, entries, dims, U, eb, wr, n_paths, passes=None
):
    o = offs_ref[0, :]
    cdt = compute_dtype(x_ref.dtype, g_ref.dtype, envA_ref.dtype)
    env_eT = _gather_windows(o, envA_ref[...], envB_ref[...], wr, cdt, passes).T
    xT = x_ref[...].astype(cdt).T
    gT = g_ref[...].astype(cdt).T
    acc = [None] * n_paths
    cur = (-1, -1)
    t = None
    for i, j, k, p, c in entries:
        if (i, j) != cur:
            t = xT[i * U : (i + 1) * U, :] * env_eT[j * U : (j + 1) * U, :]
            cur = (i, j)
        red = c * jnp.sum(
            t * gT[k * U : (k + 1) * U, :], axis=1, keepdims=True
        )  # [U, 1]
        acc[p] = red if acc[p] is None else acc[p] + red

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    for p in range(n_paths):
        if acc[p] is not None:
            out_ref[p, :] = out_ref[p, :] + acc[p][:, 0].astype(out_ref.dtype)


def gather_dw_call(x, envA, envB, g, offs_p, win, *, entries, dims, U, eb,
                   wr=None, passes=None):
    """→ dw [P, U]."""
    wr = eb if wr is None else wr
    Ep = x.shape[0]
    nb = Ep // eb
    d1, d2, d3 = dims
    n_paths = 1 + max(e[3] for e in entries)
    entries = sort_entries_for_pairs(entries)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((8, eb), lambda b, w_: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((eb, d1 * U), lambda b, w_: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wr, d2 * U), lambda b, w_: (w_[b], 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wr, d2 * U), lambda b, w_: (w_[b] + 1, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((eb, d3 * U), lambda b, w_: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_paths, U), lambda b, w_: (0, 0), memory_space=pltpu.VMEM),
    )
    kern = functools.partial(
        _gather_dw_kernel, entries=entries, dims=dims, U=U, eb=eb, wr=wr,
        n_paths=n_paths, passes=passes,
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n_paths, U), compute_dtype(x.dtype, g.dtype)),
        grid_spec=grid_spec,
        interpret=INTERPRET,
    )(win, offs_p, x, envA, envB, g)


# ---------------------------------------------------------------------------
# center-indexed gather/scatter of small per-edge/per-atom fields
# (forces accumulation, per-atom-energy reduction and their VJPs):
# XLA's row gather/scatter on TPU costs ~0.7-0.9 ms per [E]-sized op at
# production edge counts (near-scalar DMA); these kernels ride the block
# plan's rank windows with one-hot MXU products instead. Valid when edge
# centers are the identity rank map (every atom appears as a center —
# checked by Model.precompute_statics / the MD rebuild).
# ---------------------------------------------------------------------------


def combine_scatter_cols(dA, dB, win, eb: int):
    """Column-axis twin of :func:`combine_scatter_outputs` for [C, rows]."""
    cols = dA.shape[1]
    r = jax.lax.broadcasted_iota(jnp.int32, (1, cols), 1)
    w0, wl = win[0], win[-1]
    mA = jnp.logical_and(r >= w0 * eb, r < (wl + 1) * eb)
    mB = jnp.logical_and(r >= (w0 + 1) * eb, r < (wl + 2) * eb)
    zero = jnp.zeros((), dA.dtype)
    return jnp.where(mA, dA, zero) + jnp.where(mB, dB, zero)


def _center_sum_kernel(win_ref, offs_ref, v_ref, outA_ref, outB_ref, *, eb, wr, passes=None):
    o = offs_ref[0, :]
    cdt = compute_dtype(v_ref.dtype)
    v = v_ref[...].astype(cdt)  # [C, eb] feature-major
    oc = o[:, None]
    parts, spec = _split_parts(v, cdt, passes)  # split once for A and B
    if 2 * wr <= 128:  # narrow windows: ONE one-hot product for the pair
        ii = jax.lax.broadcasted_iota(jnp.int32, (eb, 2 * wr), 1)  # [edge, atom]
        s = _dot_parts(ii == oc, parts, spec, right=True)  # [C, 2*wr]
        sa, sb = s[:, :wr], s[:, wr:]
    else:
        ii = jax.lax.broadcasted_iota(jnp.int32, (eb, wr), 1)  # [edge, atom]
        sa = _dot_parts(ii == oc, parts, spec, right=True)
        sb = _dot_parts(ii == (oc - wr), parts, spec, right=True)
    first = _first_visit(win_ref)

    @pl.when(first)
    def _():
        outA_ref[...] = jnp.zeros_like(outA_ref)
        outB_ref[...] = jnp.zeros_like(outB_ref)

    outA_ref[...] = outA_ref[...] + sa.astype(outA_ref.dtype)
    outB_ref[...] = outB_ref[...] + sb.astype(outB_ref.dtype)


def center_sum_call(vT, offs_p, win, *, eb, n_rank_rows, wr=None, passes=None):
    """vT [C, Ep] per-edge values (feature-major) → two window partials
    [C, n_rank_rows]; combine with :func:`combine_scatter_cols`."""
    wr = eb if wr is None else wr
    C, Ep = vT.shape
    nb = Ep // eb
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((8, eb), lambda b, w_: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, eb), lambda b, w_: (0, b), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((C, wr), lambda b, w_: (0, w_[b]), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, wr), lambda b, w_: (0, w_[b] + 1), memory_space=pltpu.VMEM),
        ],
    )
    shape = jax.ShapeDtypeStruct((C, n_rank_rows), compute_dtype(vT.dtype))
    return pl.pallas_call(
        functools.partial(_center_sum_kernel, eb=eb, wr=wr, passes=passes),
        out_shape=[shape, shape],
        grid_spec=grid_spec,
        interpret=INTERPRET,
    )(win, offs_p, vT)


def _center_broadcast_kernel(win_ref, offs_ref, aA_ref, aB_ref, out_ref, *, eb, wr, passes=None):
    o = offs_ref[0, :]
    cdt = compute_dtype(aA_ref.dtype)
    oc = o[None, :]
    if 2 * wr <= 128:  # narrow windows: ONE one-hot product for the pair
        a = jnp.concatenate(
            [aA_ref[...].astype(cdt), aB_ref[...].astype(cdt)], axis=1
        )  # [C, 2*wr]
        ii = jax.lax.broadcasted_iota(jnp.int32, (2 * wr, eb), 0)  # [atom, edge]
        out = _onehot_dot_right(a, ii == oc, cdt, passes)
    else:
        ii = jax.lax.broadcasted_iota(jnp.int32, (wr, eb), 0)  # [atom, edge]
        out = _onehot_dot_right(aA_ref[...].astype(cdt), ii == oc, cdt, passes)
        out = out + _onehot_dot_right(
            aB_ref[...].astype(cdt), ii == (oc - wr), cdt, passes
        )
    out_ref[...] = out.astype(out_ref.dtype)


def center_broadcast_call(aT, offs_p, win, *, eb, Ep, wr=None, passes=None):
    """aT [C, n_rank_rows] per-rank values → per-edge [C, Ep]."""
    wr = eb if wr is None else wr
    C = aT.shape[0]
    nb = Ep // eb
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((8, eb), lambda b, w_: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, wr), lambda b, w_: (0, w_[b]), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, wr), lambda b, w_: (0, w_[b] + 1), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C, eb), lambda b, w_: (0, b), memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_center_broadcast_kernel, eb=eb, wr=wr, passes=passes),
        out_shape=jax.ShapeDtypeStruct((C, Ep), compute_dtype(aT.dtype)),
        grid_spec=grid_spec,
        interpret=INTERPRET,
    )(win, offs_p, aT, aT)


# ---------------------------------------------------------------------------
# kernel A: env build + scatter
#   env[r, jU+u] = Σ_{e: rank_e=r} sh[e, j] * wexp[e, irr(j)*U+u]
# ---------------------------------------------------------------------------


def _env_scatter_kernel(
    win_ref, offs_ref, sh_ref, wexp_ref, outA_ref, outB_ref, *, dim_to_irr, U, eb, wr, passes=None
):
    o = offs_ref[0, :]
    d2 = len(dim_to_irr)
    cdt = compute_dtype(sh_ref.dtype, wexp_ref.dtype)
    shT = sh_ref[...].astype(cdt)          # [d2, eb] (operand pre-transposed:
    # a [Ep, 9] Mosaic operand would be lane-padded 14x in HBM)
    wexpT = wexp_ref[...].astype(cdt).T    # [n_irr*U, eb]
    rows = []
    for j in range(d2):
        irr = dim_to_irr[j]
        rows.append(shT[j : j + 1, :] * wexpT[irr * U : (irr + 1) * U, :])
    vals = jnp.concatenate(rows, axis=0).T  # [eb, d2*U]
    sa, sb = _scatter_windows(o, vals, wr, cdt, passes)
    first = _first_visit(win_ref)

    @pl.when(first)
    def _():
        outA_ref[...] = jnp.zeros_like(outA_ref)
        outB_ref[...] = jnp.zeros_like(outB_ref)

    outA_ref[...] = outA_ref[...] + sa.astype(outA_ref.dtype)
    outB_ref[...] = outB_ref[...] + sb.astype(outB_ref.dtype)


def env_scatter_call(sh, wexp, offs_p, win, *, dim_to_irr, U, eb,
                     n_rank_rows, wr=None, passes=None):
    """sh [Ep, d2], wexp [Ep, n_irr*U] → (envA, envB) each [Na, d2*U]."""
    wr = eb if wr is None else wr
    Ep = sh.shape[0]
    nb = Ep // eb
    d2 = len(dim_to_irr)
    n_irr = max(dim_to_irr) + 1
    sh = sh.T  # [d2, Ep]: narrow arrays enter kernels feature-major
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((8, eb), lambda b, w_: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d2, eb), lambda b, w_: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((eb, n_irr * U), lambda b, w_: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((wr, d2 * U), lambda b, w_: (w_[b], 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wr, d2 * U), lambda b, w_: (w_[b] + 1, 0), memory_space=pltpu.VMEM),
        ],
    )
    kern = functools.partial(
        _env_scatter_kernel, dim_to_irr=tuple(dim_to_irr), U=U, eb=eb, wr=wr,
        passes=passes,
    )
    shape = jax.ShapeDtypeStruct((n_rank_rows, d2 * U), compute_dtype(sh.dtype, wexp.dtype))
    return pl.pallas_call(
        kern,
        out_shape=[shape, shape],
        grid_spec=grid_spec,
        interpret=INTERPRET,
    )(win, offs_p, sh, wexp)


# ---------------------------------------------------------------------------
# kernel D: gather + unweight (the two transposes of kernel A)
#   dsh[e, j]          = Σ_u t[rank_e, jU+u] * wexp[e, irr(j)U+u]
#   dwexp[e, irrU+u]   = Σ_{j: irr(j)=irr} t[rank_e, jU+u] * sh[e, j]
# ---------------------------------------------------------------------------


def _gather_unweight_sh_kernel(
    win_ref, offs_ref, tA_ref, tB_ref, wexp_ref, out_ref, *, dim_to_irr, U, eb, wr, passes=None
):
    o = offs_ref[0, :]
    cdt = compute_dtype(tA_ref.dtype, wexp_ref.dtype)
    t_eT = _gather_windows(o, tA_ref[...], tB_ref[...], wr, cdt, passes).T
    wexpT = wexp_ref[...].astype(cdt).T
    d2 = len(dim_to_irr)
    rows = []
    for j in range(d2):
        irr = dim_to_irr[j]
        prod = t_eT[j * U : (j + 1) * U, :] * wexpT[irr * U : (irr + 1) * U, :]
        rows.append(jnp.sum(prod, axis=0, keepdims=True))  # [1, eb]
    out_ref[...] = jnp.concatenate(rows, axis=0).astype(out_ref.dtype)


def gather_unweight_sh_call(tA, tB, wexp, offs_p, win, *, dim_to_irr, U, eb,
                            wr=None, passes=None):
    """→ dsh [Ep, d2]."""
    wr = eb if wr is None else wr
    Ep = wexp.shape[0]
    nb = Ep // eb
    d2 = len(dim_to_irr)
    n_irr = max(dim_to_irr) + 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((8, eb), lambda b, w_: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wr, d2 * U), lambda b, w_: (w_[b], 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wr, d2 * U), lambda b, w_: (w_[b] + 1, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((eb, n_irr * U), lambda b, w_: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((d2, eb), lambda b, w_: (0, b), memory_space=pltpu.VMEM),
    )
    kern = functools.partial(
        _gather_unweight_sh_kernel, dim_to_irr=tuple(dim_to_irr), U=U, eb=eb,
        wr=wr, passes=passes,
    )
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((d2, Ep), compute_dtype(tA.dtype)),
        grid_spec=grid_spec,
        interpret=INTERPRET,
    )(win, offs_p, tA, tB, wexp)
    return out.T


def _bwd_fused_kernel(
    win_ref, offs_ref, x_ref, g_ref, envA_ref, envB_ref, w_ref,
    *refs, entries, dims, U, eb, wr, n_paths, with_dw, passes=None
):
    """One-pass backward: dx, denv (two windows), dw — sharing the g/x loads
    and the env window gather that three separate kernels would each redo
    (the reference's backward reuses one kernel with permuted index sets,
    ``_flashallegro.py:583-639``; here sharing loads is the bigger win because
    the chip is HBM-bound). ``with_dw=False`` (the MD force path: weights are
    parameters, their cotangent is discarded) skips the per-path reductions —
    a large share of the kernel's VPU work."""
    if with_dw:
        dx_ref, dA_ref, dB_ref, dw_ref = refs
    else:
        dx_ref, dA_ref, dB_ref = refs
        dw_ref = None
    d1, d2, d3 = dims
    o = offs_ref[0, :]
    dtype = compute_dtype(x_ref.dtype, g_ref.dtype, envA_ref.dtype)
    env_eT = _gather_windows(o, envA_ref[...], envB_ref[...], wr, dtype, passes).T
    xT = x_ref[...].astype(dtype).T
    gT = g_ref[...].astype(dtype).T
    wT = w_ref[...].astype(dtype).T

    # dx[i] = Σ c w[p] g_k env_j  — cache g_k * env_j per (k, j) pair
    dx_acc = [None] * d1
    cur = (-1, -1)
    t = None
    for k, j, i, p, c in sorted((k, j, i, p, c) for (i, j, k, p, c) in entries):
        if (k, j) != cur:
            t = gT[k * U : (k + 1) * U, :] * env_eT[j * U : (j + 1) * U, :]
            cur = (k, j)
        contrib = t * (c * wT[:, p][:, None])
        dx_acc[i] = contrib if dx_acc[i] is None else dx_acc[i] + contrib
    dx_ref[...] = _cat_T(dx_acc, U, eb, dtype).T.astype(dx_ref.dtype)

    # denv[j] = Σ c w[p] x_i g_k ;  dw[p] = Σ_e c x_i env_j g_k
    # — cache x_i * g_k per (i, k) pair, reuse it for both
    denv_acc = [None] * d2
    dw_acc = [None] * n_paths
    cur = (-1, -1)
    t = None
    for i, k, j, p, c in sorted((i, k, j, p, c) for (i, j, k, p, c) in entries):
        if (i, k) != cur:
            t = xT[i * U : (i + 1) * U, :] * gT[k * U : (k + 1) * U, :]
            cur = (i, k)
        contrib = t * (c * wT[:, p][:, None])
        denv_acc[j] = contrib if denv_acc[j] is None else denv_acc[j] + contrib
        if with_dw:
            red = c * jnp.sum(
                t * env_eT[j * U : (j + 1) * U, :], axis=1, keepdims=True
            )  # [U, 1]
            dw_acc[p] = red if dw_acc[p] is None else dw_acc[p] + red

    vals = _cat_T(denv_acc, U, eb, dtype).T  # [eb, d2*U]
    sa, sb = _scatter_windows(o, vals, wr, dtype, passes)
    first = _first_visit(win_ref)

    @pl.when(first)
    def _():
        dA_ref[...] = jnp.zeros_like(dA_ref)
        dB_ref[...] = jnp.zeros_like(dB_ref)

    dA_ref[...] = dA_ref[...] + sa.astype(dA_ref.dtype)
    dB_ref[...] = dB_ref[...] + sb.astype(dB_ref.dtype)

    if with_dw:

        @pl.when(pl.program_id(0) == 0)
        def _():
            dw_ref[...] = jnp.zeros_like(dw_ref)

        for p in range(n_paths):
            if dw_acc[p] is not None:
                dw_ref[p, :] = dw_ref[p, :] + dw_acc[p][:, 0].astype(dw_ref.dtype)


def bwd_fused_call(x, g, envA, envB, w, offs_p, win, *, entries, dims, U, eb,
                   n_rank_rows, wr=None, with_dw=True, passes=None):
    """x [Ep,d1U], g [Ep,d3U], env windows, w [P,U]
    → (dx [Ep,d1U], dA, dB [Nr,d2U], dw [P,U] | None).

    ``with_dw=False``: dw is neither computed nor returned (None) — for the
    force/MD path where the weight cotangent is discarded."""
    wr = eb if wr is None else wr
    Ep = x.shape[0]
    nb = Ep // eb
    d1, d2, d3 = dims
    n_paths = 1 + max(e[3] for e in entries)
    in_specs = [
        pl.BlockSpec((8, eb), lambda b, w_: (b, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((eb, d1 * U), lambda b, w_: (b, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((eb, d3 * U), lambda b, w_: (b, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((wr, d2 * U), lambda b, w_: (w_[b], 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((wr, d2 * U), lambda b, w_: (w_[b] + 1, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((eb, d1 * U), lambda b, w_: (b, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((wr, d2 * U), lambda b, w_: (w_[b], 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((wr, d2 * U), lambda b, w_: (w_[b] + 1, 0), memory_space=pltpu.VMEM),
    ]
    cdt = compute_dtype(x.dtype, g.dtype)
    env_shape = jax.ShapeDtypeStruct((n_rank_rows, d2 * U), cdt)
    out_shape = [
        jax.ShapeDtypeStruct((Ep, d1 * U), x.dtype),
        env_shape,
        env_shape,
    ]
    if with_dw:
        out_specs.append(
            pl.BlockSpec((n_paths, U), lambda b, w_: (0, 0), memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((n_paths, U), cdt))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(nb,), in_specs=in_specs, out_specs=out_specs
    )
    kern = functools.partial(
        _bwd_fused_kernel, entries=tuple(entries), dims=dims, U=U, eb=eb,
        wr=wr, n_paths=n_paths, with_dw=with_dw, passes=passes,
    )
    outs = pl.pallas_call(
        kern,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=INTERPRET,
    )(win, offs_p, x, g, envA, envB, w)
    if with_dw:
        return outs
    dx, dA, dB = outs
    return dx, dA, dB, None


def _bwd_fused_raw_kernel(
    win_ref, offs_ref, x_ref, g_ref, *refs, entries, dims, U, eb, wr, nb,
    passes=None, with_gts=False
):
    """Raw-window twin of :func:`_bwd_fused_kernel` with ``with_dw=False``
    semantics (inference scope): env arrives as the uncombined (A, B) pair.
    ``with_gts``: an extra [eb, U] cotangent of the SPLIT scalar output is
    folded into the leading-0e rows of g in VMEM (split_scalars fwd)."""
    if with_gts:
        gts_ref, Aw_ref, Aw1_ref, Bw_ref, Bw1_ref, w_ref = refs[:6]
        dx_ref, dA_ref, dB_ref = refs[6:]
    else:
        gts_ref = None
        Aw_ref, Aw1_ref, Bw_ref, Bw1_ref, w_ref = refs[:5]
        dx_ref, dA_ref, dB_ref = refs[5:]
    d1, d2, d3 = dims
    o = offs_ref[0, :]
    dtype = compute_dtype(x_ref.dtype, g_ref.dtype, Aw_ref.dtype)
    envW, envW1 = _combine_window_tiles(
        win_ref, nb, Aw_ref[...], Aw1_ref[...], Bw_ref[...], Bw1_ref[...], dtype
    )
    env_eT = _gather_windows(o, envW, envW1, wr, dtype, passes).T
    xT = x_ref[...].astype(dtype).T
    gT = g_ref[...].astype(dtype).T
    if gts_ref is not None:
        gT = jnp.concatenate(
            [gT[:U, :] + gts_ref[...].astype(dtype).T, gT[U:, :]], axis=0
        )
    wT = w_ref[...].astype(dtype).T

    dx_acc = [None] * d1
    cur = (-1, -1)
    t = None
    for k, j, i, p, c in sorted((k, j, i, p, c) for (i, j, k, p, c) in entries):
        if (k, j) != cur:
            t = gT[k * U : (k + 1) * U, :] * env_eT[j * U : (j + 1) * U, :]
            cur = (k, j)
        contrib = t * (c * wT[:, p][:, None])
        dx_acc[i] = contrib if dx_acc[i] is None else dx_acc[i] + contrib
    dx_ref[...] = _cat_T(dx_acc, U, eb, dtype).T.astype(dx_ref.dtype)

    denv_acc = [None] * d2
    cur = (-1, -1)
    t = None
    for i, k, j, p, c in sorted((i, k, j, p, c) for (i, j, k, p, c) in entries):
        if (i, k) != cur:
            t = xT[i * U : (i + 1) * U, :] * gT[k * U : (k + 1) * U, :]
            cur = (i, k)
        contrib = t * (c * wT[:, p][:, None])
        denv_acc[j] = contrib if denv_acc[j] is None else denv_acc[j] + contrib

    vals = _cat_T(denv_acc, U, eb, dtype).T
    sa, sb = _scatter_windows(o, vals, wr, dtype, passes)
    first = _first_visit(win_ref)

    @pl.when(first)
    def _():
        dA_ref[...] = jnp.zeros_like(dA_ref)
        dB_ref[...] = jnp.zeros_like(dB_ref)

    dA_ref[...] = dA_ref[...] + sa.astype(dA_ref.dtype)
    dB_ref[...] = dB_ref[...] + sb.astype(dB_ref.dtype)


def bwd_fused_raw_call(x, g, eA, eB, w, offs_p, win, *, entries, dims, U, eb,
                       n_rank_rows, wr=None, passes=None, gts=None):
    """→ (dx [Ep,d1U], dA, dB [Nr,d2U]) from the uncombined env pair.
    ``gts`` [Ep, U]: cotangent of the split scalar output, folded into g's
    leading-0e columns in VMEM."""
    wr = eb if wr is None else wr
    Ep = x.shape[0]
    nb = Ep // eb
    d1, d2, d3 = dims
    in_specs = [
        pl.BlockSpec((8, eb), lambda b, w_: (b, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((eb, d1 * U), lambda b, w_: (b, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((eb, d3 * U), lambda b, w_: (b, 0), memory_space=pltpu.VMEM),
    ]
    args = [win, offs_p, x, g]
    if gts is not None:
        in_specs.append(
            pl.BlockSpec((eb, U), lambda b, w_: (b, 0), memory_space=pltpu.VMEM)
        )
        args.append(gts)
    in_specs.extend(_env_pair_specs(d2 * U, wr))
    in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    args.extend([eA, eA, eB, eB, w])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((eb, d1 * U), lambda b, w_: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wr, d2 * U), lambda b, w_: (w_[b], 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wr, d2 * U), lambda b, w_: (w_[b] + 1, 0), memory_space=pltpu.VMEM),
        ],
    )
    kern = functools.partial(
        _bwd_fused_raw_kernel, entries=tuple(entries), dims=dims, U=U, eb=eb,
        wr=wr, nb=nb, passes=passes, with_gts=gts is not None,
    )
    cdt = compute_dtype(x.dtype, g.dtype)
    env_shape = jax.ShapeDtypeStruct((n_rank_rows, d2 * U), cdt)
    return pl.pallas_call(
        kern,
        out_shape=[
            jax.ShapeDtypeStruct((Ep, d1 * U), x.dtype),
            env_shape,
            env_shape,
        ],
        grid_spec=grid_spec,
        interpret=INTERPRET,
    )(*args)


def _unweight_both_raw_kernel(
    win_ref, offs_ref, tAw_ref, tAw1_ref, tBw_ref, tBw1_ref, sh_ref, wexp_ref,
    dsh_ref, dwexp_ref, *, dim_to_irr, U, eb, wr, nb, passes=None
):
    o = offs_ref[0, :]
    dtype = compute_dtype(tAw_ref.dtype, wexp_ref.dtype, sh_ref.dtype)
    tW, tW1 = _combine_window_tiles(
        win_ref, nb, tAw_ref[...], tAw1_ref[...], tBw_ref[...], tBw1_ref[...], dtype
    )
    t_eT = _gather_windows(o, tW, tW1, wr, dtype, passes).T
    wexpT = wexp_ref[...].astype(dtype).T
    shT = sh_ref[...].astype(dtype)  # operand pre-transposed [d2, eb]
    d2 = len(dim_to_irr)
    n_irr = max(dim_to_irr) + 1
    dsh_rows = []
    acc = [None] * n_irr
    for j in range(d2):
        irr = dim_to_irr[j]
        tj = t_eT[j * U : (j + 1) * U, :]
        dsh_rows.append(
            jnp.sum(tj * wexpT[irr * U : (irr + 1) * U, :], axis=0, keepdims=True)
        )
        prod = tj * shT[j : j + 1, :]
        acc[irr] = prod if acc[irr] is None else acc[irr] + prod
    dsh_ref[...] = jnp.concatenate(dsh_rows, axis=0).astype(dsh_ref.dtype)
    dwexp_ref[...] = jnp.concatenate(acc, axis=0).T.astype(dwexp_ref.dtype)


def unweight_both_raw_call(tA, tB, sh, wexp, offs_p, win, *, dim_to_irr, U,
                           eb, wr=None, passes=None):
    """→ (dsh [Ep, d2], dwexp [Ep, n_irr*U]) from the uncombined denv pair."""
    wr = eb if wr is None else wr
    Ep = sh.shape[0]
    nb = Ep // eb
    d2 = len(dim_to_irr)
    n_irr = max(dim_to_irr) + 1
    sh = sh.T  # [d2, Ep]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((8, eb), lambda b, w_: (b, 0), memory_space=pltpu.VMEM),
            *_env_pair_specs(d2 * U, wr),
            pl.BlockSpec((d2, eb), lambda b, w_: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((eb, n_irr * U), lambda b, w_: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((d2, eb), lambda b, w_: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((eb, n_irr * U), lambda b, w_: (b, 0), memory_space=pltpu.VMEM),
        ],
    )
    kern = functools.partial(
        _unweight_both_raw_kernel, dim_to_irr=tuple(dim_to_irr), U=U, eb=eb,
        wr=wr, nb=nb, passes=passes,
    )
    dshT, dwexp = pl.pallas_call(
        kern,
        out_shape=[
            jax.ShapeDtypeStruct((d2, Ep), compute_dtype(tA.dtype)),
            jax.ShapeDtypeStruct((Ep, n_irr * U), wexp.dtype),
        ],
        grid_spec=grid_spec,
        interpret=INTERPRET,
    )(win, offs_p, tA, tA, tB, tB, sh, wexp)
    return dshT.T, dwexp


def _unweight_both_kernel(
    win_ref, offs_ref, tA_ref, tB_ref, sh_ref, wexp_ref, dsh_ref, dwexp_ref,
    *, dim_to_irr, U, eb, wr, passes=None
):
    """dsh and dwexp in one pass (shared denv-window gather)."""
    o = offs_ref[0, :]
    dtype = compute_dtype(tA_ref.dtype, wexp_ref.dtype, sh_ref.dtype)
    t_eT = _gather_windows(o, tA_ref[...], tB_ref[...], wr, dtype, passes).T
    wexpT = wexp_ref[...].astype(dtype).T
    shT = sh_ref[...].astype(dtype)  # operand pre-transposed [d2, eb]
    d2 = len(dim_to_irr)
    n_irr = max(dim_to_irr) + 1
    dsh_rows = []
    acc = [None] * n_irr
    for j in range(d2):
        irr = dim_to_irr[j]
        tj = t_eT[j * U : (j + 1) * U, :]
        dsh_rows.append(
            jnp.sum(tj * wexpT[irr * U : (irr + 1) * U, :], axis=0, keepdims=True)
        )
        prod = tj * shT[j : j + 1, :]
        acc[irr] = prod if acc[irr] is None else acc[irr] + prod
    dsh_ref[...] = jnp.concatenate(dsh_rows, axis=0).astype(dsh_ref.dtype)
    dwexp_ref[...] = jnp.concatenate(acc, axis=0).T.astype(dwexp_ref.dtype)


def unweight_both_call(tA, tB, sh, wexp, offs_p, win, *, dim_to_irr, U, eb,
                       wr=None, passes=None):
    """→ (dsh [Ep, d2], dwexp [Ep, n_irr*U])."""
    wr = eb if wr is None else wr
    Ep = sh.shape[0]
    nb = Ep // eb
    d2 = len(dim_to_irr)
    n_irr = max(dim_to_irr) + 1
    sh = sh.T  # [d2, Ep]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((8, eb), lambda b, w_: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wr, d2 * U), lambda b, w_: (w_[b], 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wr, d2 * U), lambda b, w_: (w_[b] + 1, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d2, eb), lambda b, w_: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((eb, n_irr * U), lambda b, w_: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((d2, eb), lambda b, w_: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((eb, n_irr * U), lambda b, w_: (b, 0), memory_space=pltpu.VMEM),
        ],
    )
    kern = functools.partial(
        _unweight_both_kernel, dim_to_irr=tuple(dim_to_irr), U=U, eb=eb, wr=wr,
        passes=passes,
    )
    dshT, dwexp = pl.pallas_call(
        kern,
        out_shape=[
            jax.ShapeDtypeStruct((d2, Ep), compute_dtype(tA.dtype)),
            jax.ShapeDtypeStruct((Ep, n_irr * U), wexp.dtype),
        ],
        grid_spec=grid_spec,
        interpret=INTERPRET,
    )(win, offs_p, tA, tB, sh, wexp)
    return dshT.T, dwexp


def _gather_unweight_w_kernel(
    win_ref, offs_ref, tA_ref, tB_ref, sh_ref, out_ref, *, dim_to_irr, U, eb, wr, passes=None
):
    o = offs_ref[0, :]
    cdt = compute_dtype(tA_ref.dtype, sh_ref.dtype)
    t_eT = _gather_windows(o, tA_ref[...], tB_ref[...], wr, cdt, passes).T
    shT = sh_ref[...].astype(cdt)  # operand pre-transposed [d2, eb]
    n_irr = max(dim_to_irr) + 1
    acc = [None] * n_irr
    for j, irr in enumerate(dim_to_irr):
        prod = t_eT[j * U : (j + 1) * U, :] * shT[j : j + 1, :]
        acc[irr] = prod if acc[irr] is None else acc[irr] + prod
    out_ref[...] = jnp.concatenate(acc, axis=0).T.astype(out_ref.dtype)


def gather_unweight_w_call(tA, tB, sh, offs_p, win, *, dim_to_irr, U, eb,
                           wr=None, out_dtype=None, passes=None):
    """→ dwexp [Ep, n_irr*U]. ``out_dtype``: the wexp STORAGE dtype (not
    inferable from the inputs in mixed-precision mode); defaults to the
    compute dtype."""
    wr = eb if wr is None else wr
    Ep = sh.shape[0]
    nb = Ep // eb
    d2 = len(dim_to_irr)
    n_irr = max(dim_to_irr) + 1
    sh = sh.T  # [d2, Ep]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((8, eb), lambda b, w_: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wr, d2 * U), lambda b, w_: (w_[b], 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wr, d2 * U), lambda b, w_: (w_[b] + 1, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d2, eb), lambda b, w_: (0, b), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((eb, n_irr * U), lambda b, w_: (b, 0), memory_space=pltpu.VMEM),
    )
    kern = functools.partial(
        _gather_unweight_w_kernel, dim_to_irr=tuple(dim_to_irr), U=U, eb=eb,
        wr=wr, passes=passes,
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(
            (Ep, n_irr * U), out_dtype or compute_dtype(tA.dtype, sh.dtype)
        ),
        grid_spec=grid_spec,
        interpret=INTERPRET,
    )(win, offs_p, tA, tB, sh)


# ---------------------------------------------------------------------------
# mega kernels: latent MLP + env-weight slice + env scatter in ONE pass
# (the per-layer whole-kernel fusion the reference approximates with
# torch.compile around FlashAllegro; here the latent MLP's hidden/env
# activations never exist in HBM — ~0.5 GB/step of intermediate traffic at
# production edge counts). Inference scope (custom_vjp wrappers in
# fused_primitives; weight cotangents follow the NaN contract).
# ---------------------------------------------------------------------------


def _split2_bf16(x):
    """2-term bf16 decomposition of f32: x ≈ x0 + x1 (16 mantissa bits)."""
    x0 = x.astype(jnp.bfloat16)
    x1 = (x - x0.astype(jnp.float32)).astype(jnp.bfloat16)
    return x0, x1


def _mlp_dot(a, b, dtype, passes, dn=_DN_ROWS):
    """a @ b with an explicit MXU pass-count policy.

    passes >= 6: one HIGHEST dot (Mosaic lowers f32 HIGHEST to the exact
    6-pass bf16-split algorithm). passes == 3: the jax "high" policy written
    out explicitly — a0b0 + a0b1 + a1b0 over 2-term bf16 splits (~1e-7
    relative error, half the MXU streaming cost). Explicit rather than
    Precision.HIGH so interpret-mode tests see the same deterministic bf16
    operand rounding the MXU applies. Non-f32 dtypes always take the exact
    path (f64 tests; bf16 storage is cast up before calling)."""
    if passes < 6 and dtype == jnp.float32:
        a0, a1 = _split2_bf16(a.astype(dtype))
        b0, b1 = _split2_bf16(b.astype(dtype))
        out = jax.lax.dot_general(a0, b0, dn, preferred_element_type=jnp.float32)
        out = out + jax.lax.dot_general(a0, b1, dn, preferred_element_type=jnp.float32)
        out = out + jax.lax.dot_general(a1, b0, dn, preferred_element_type=jnp.float32)
        return out
    return jax.lax.dot_general(
        a.astype(dtype), b.astype(dtype), dn,
        precision=_HIGHEST, preferred_element_type=dtype,
    )


def _mlp_lat(piece_vals, w0_ref, w1_ref, piece_dims, n_hidden, dtype, passes=6):
    """lat = (silu(Σ pieces @ w0-blocks)) @ w1 (n_hidden=1) or the plain
    linear Σ pieces @ w0-blocks (n_hidden=0). Matches ScalarMLP: bias-free,
    SiLU, per-piece block matmul in declaration order; dot precision policy
    via ``passes`` (6 = exact-f32 HIGHEST — reference allow_tf32=false
    parity; 3 = the "high" bf16 split, see _mlp_dot). Returns
    (pre_act | None, lat)."""
    h = None
    off = 0
    w0 = w0_ref[...].astype(dtype)
    for p, d in zip(piece_vals, piece_dims):
        t = _mlp_dot(p.astype(dtype), w0[off : off + d, :], dtype, passes)
        h = t if h is None else h + t
        off += d
    if n_hidden == 0:
        return None, h
    pre = h
    h = jax.nn.silu(pre)
    lat = _mlp_dot(h, w1_ref[...].astype(dtype), dtype, passes)
    return pre, lat


def _latent_env_scatter_kernel(
    win_ref, offs_ref, *refs, piece_dims, dim_to_irr, U, eb, wr, S, n_hidden,
    wexp_dtype, mlp_passes, passes=None
):
    np_ = len(piece_dims)
    piece_refs = refs[:np_]
    sh_ref = refs[np_]
    w0_ref = refs[np_ + 1]
    w1_ref = refs[np_ + 2] if n_hidden else None
    lat_ref, outA_ref, outB_ref = refs[-3:]
    o = offs_ref[0, :]
    cdt = compute_dtype(*(r.dtype for r in piece_refs))
    _, lat = _mlp_lat(
        [r[...] for r in piece_refs], w0_ref, w1_ref, piece_dims, n_hidden,
        cdt, mlp_passes,
    )
    lat_ref[...] = lat[:, :S].astype(lat_ref.dtype)
    wexp = lat[:, S:]
    if wexp_dtype is not None:
        # parity with the unfused path's tensor_dtype cast of the env weights
        wexp = wexp.astype(wexp_dtype).astype(cdt)
    shT = sh_ref[...].astype(cdt)  # [d2, eb] (pre-transposed operand)
    wexpT = wexp.T                 # [n_irr*U, eb]
    d2 = len(dim_to_irr)
    rows = []
    for j in range(d2):
        irr = dim_to_irr[j]
        rows.append(shT[j : j + 1, :] * wexpT[irr * U : (irr + 1) * U, :])
    vals = jnp.concatenate(rows, axis=0).T  # [eb, d2*U]
    sa, sb = _scatter_windows(o, vals, wr, cdt, passes)
    first = _first_visit(win_ref)

    @pl.when(first)
    def _():
        outA_ref[...] = jnp.zeros_like(outA_ref)
        outB_ref[...] = jnp.zeros_like(outB_ref)

    outA_ref[...] = outA_ref[...] + sa.astype(outA_ref.dtype)
    outB_ref[...] = outB_ref[...] + sb.astype(outB_ref.dtype)


def latent_env_scatter_call(
    pieces, sh, w0, w1, offs_p, win, *, dim_to_irr, U, eb, n_rank_rows, S,
    n_hidden, wr=None, wexp_dtype=None, mlp_passes=6, passes=None
):
    """pieces (tuple of [Ep, d_i]), sh [Ep, d2], w0 [Σd_i, H], w1 [H, S+nI*U]
    (or w1=None with n_hidden=0 and w0 [Σd_i, S+nI*U])
    → (lat_scalars [Ep, S], eA, eB [Nr, d2*U])."""
    wr = eb if wr is None else wr
    Ep = sh.shape[0]
    nb = Ep // eb
    d2 = len(dim_to_irr)
    n_irr = max(dim_to_irr) + 1
    piece_dims = tuple(int(p.shape[1]) for p in pieces)
    sh_t = sh.T
    in_specs = [pl.BlockSpec((8, eb), lambda b, w_: (b, 0), memory_space=pltpu.VMEM)]
    for d in piece_dims:
        in_specs.append(
            pl.BlockSpec(
                (eb, d), lambda b, w_: (b, 0), memory_space=pltpu.VMEM
            )
        )
    in_specs.append(
        pl.BlockSpec((d2, eb), lambda b, w_: (0, b), memory_space=pltpu.VMEM)
    )
    in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # w0
    args = [win, offs_p, *pieces, sh_t, w0]
    if n_hidden:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # w1
        args.append(w1)
    out_specs = [
        pl.BlockSpec((eb, S), lambda b, w_: (b, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((wr, d2 * U), lambda b, w_: (w_[b], 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((wr, d2 * U), lambda b, w_: (w_[b] + 1, 0), memory_space=pltpu.VMEM),
    ]
    cdt = compute_dtype(*(p.dtype for p in pieces))
    env_shape = jax.ShapeDtypeStruct((n_rank_rows, d2 * U), cdt)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(nb,), in_specs=in_specs, out_specs=out_specs
    )
    kern = functools.partial(
        _latent_env_scatter_kernel, piece_dims=piece_dims,
        dim_to_irr=tuple(dim_to_irr), U=U, eb=eb, wr=wr, S=S, n_hidden=n_hidden,
        wexp_dtype=wexp_dtype, mlp_passes=mlp_passes, passes=passes,
    )
    return pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((Ep, S), cdt), env_shape, env_shape],
        grid_spec=grid_spec,
        interpret=INTERPRET,
    )(*args)


def _readout_sum_kernel(
    win_ref, offs_ref, *refs, piece_dims, eb, wr, n_hidden, mlp_passes,
    passes=None
):
    """Readout MLP + per-atom energy scatter in one pass: the hidden
    activation [E, H] and the per-edge energy [E, 1] never exist in HBM
    (role of the reference chain FieldMLP('edge_energy') → EdgewiseReduce,
    ``allegro/model/allegro_models.py:238-248``)."""
    np_ = len(piece_dims)
    piece_refs = refs[:np_]
    w0_ref = refs[np_]
    w1_ref = refs[np_ + 1] if n_hidden else None
    outA_ref, outB_ref = refs[-2:]
    o = offs_ref[0, :]
    cdt = compute_dtype(*(r.dtype for r in piece_refs))
    _, e = _mlp_lat(
        [r[...] for r in piece_refs], w0_ref, w1_ref, piece_dims, n_hidden,
        cdt, mlp_passes,
    )  # [eb, 1]
    # [*, 1] energy column: a one-hot MXU product pads the single column to
    # 128 lanes (several wasted tiles per exact pass); a masked VPU
    # reduction does the whole scatter in a couple of passes over
    # [2*wr, eb] — and a where-select + f32 row sum is exact
    m = e.shape[0]
    ii = jax.lax.broadcasted_iota(jnp.int32, (2 * wr, m), 0)
    sel = jnp.where(ii == o[None, :], e[:, 0][None, :], jnp.zeros((), cdt))
    s = jnp.sum(sel, axis=1, keepdims=True)  # [2*wr, 1]
    sa, sb = s[:wr], s[wr:]
    first = _first_visit(win_ref)

    @pl.when(first)
    def _():
        outA_ref[...] = jnp.zeros_like(outA_ref)
        outB_ref[...] = jnp.zeros_like(outB_ref)

    outA_ref[...] = outA_ref[...] + sa.astype(outA_ref.dtype)
    outB_ref[...] = outB_ref[...] + sb.astype(outB_ref.dtype)


def readout_sum_call(pieces, w0, w1, offs_p, win, *, eb, n_rank_rows,
                     n_hidden, wr=None, mlp_passes=6, passes=None):
    """pieces (tuple of [Ep, S_i]), w0 [ΣS_i, H], w1 [H, 1] (or w1=None,
    n_hidden=0, w0 [ΣS_i, 1]) → (eA, eB) per-atom energy window partials
    [Nr, 1]; combine + slice [:n_atoms] outside."""
    wr = eb if wr is None else wr
    Ep = pieces[0].shape[0]
    nb = Ep // eb
    piece_dims = tuple(int(p.shape[1]) for p in pieces)
    in_specs = [pl.BlockSpec((8, eb), lambda b, w_: (b, 0), memory_space=pltpu.VMEM)]
    for d in piece_dims:
        in_specs.append(
            pl.BlockSpec((eb, d), lambda b, w_: (b, 0), memory_space=pltpu.VMEM)
        )
    in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # w0
    args = [win, offs_p, *pieces, w0]
    if n_hidden:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # w1
        args.append(w1)
    out_specs = [
        pl.BlockSpec((wr, 1), lambda b, w_: (w_[b], 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((wr, 1), lambda b, w_: (w_[b] + 1, 0), memory_space=pltpu.VMEM),
    ]
    cdt = compute_dtype(*(p.dtype for p in pieces))
    shape = jax.ShapeDtypeStruct((n_rank_rows, 1), cdt)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(nb,), in_specs=in_specs, out_specs=out_specs
    )
    kern = functools.partial(
        _readout_sum_kernel, piece_dims=piece_dims, eb=eb, wr=wr,
        n_hidden=n_hidden, mlp_passes=mlp_passes, passes=passes,
    )
    return pl.pallas_call(
        kern,
        out_shape=[shape, shape],
        grid_spec=grid_spec,
        interpret=INTERPRET,
    )(*args)


def _readout_bwd_kernel(
    win_ref, offs_ref, *refs, piece_dims, eb, wr, n_hidden, mlp_passes,
    passes=None
):
    """Backward of the fused readout: gathers the per-atom energy cotangent
    to edges, recomputes the MLP forward, and backpropagates to the piece
    cotangents — one pass, no stored activations."""
    np_ = len(piece_dims)
    piece_refs = refs[:np_]
    k = np_
    w0_ref = refs[k]; k += 1
    w1_ref = refs[k] if n_hidden else None
    if n_hidden:
        k += 1
    yA_ref, yB_ref = refs[k : k + 2]
    dpiece_refs = refs[k + 2 :]
    o = offs_ref[0, :]
    cdt = compute_dtype(*(r.dtype for r in piece_refs))
    piece_vals = [r[...] for r in piece_refs]
    pre, _ = _mlp_lat(piece_vals, w0_ref, w1_ref, piece_dims, n_hidden, cdt,
                      mlp_passes)
    # [*, 1] cotangent column: VPU masked select + lane reduce instead of a
    # lane-padded one-hot MXU gather (each row has exactly one hit — exact)
    m = piece_vals[0].shape[0]
    y = jnp.concatenate([yA_ref[...], yB_ref[...]], axis=0)[:, 0]  # [2*wr]
    ii = jax.lax.broadcasted_iota(jnp.int32, (m, 2 * wr), 1)
    e_ct = jnp.sum(
        jnp.where(ii == o[:, None], y[None, :].astype(cdt), jnp.zeros((), cdt)),
        axis=1, keepdims=True,
    )  # [eb, 1]
    _dn_t = (((1,), (1,)), ((), ()))
    if n_hidden:
        dh = _mlp_dot(e_ct, w1_ref[...].astype(cdt), cdt, mlp_passes, dn=_dn_t)
        sig = jax.nn.sigmoid(pre)
        dh = dh * (sig * (1.0 + pre * (1.0 - sig)))
    else:
        dh = e_ct
    w0 = w0_ref[...].astype(cdt)
    off = 0
    for r, d in zip(dpiece_refs, piece_dims):
        dp = _mlp_dot(dh, w0[off : off + d, :], cdt, mlp_passes, dn=_dn_t)
        r[...] = dp.astype(r.dtype)
        off += d


def readout_bwd_call(pieces, w0, w1, y_ct, offs_p, win, *, eb, n_hidden,
                     wr=None, mlp_passes=6, passes=None):
    """y_ct [Nr, 1] per-rank-row cotangent → dpieces tuple [Ep, S_i]."""
    wr = eb if wr is None else wr
    Ep = pieces[0].shape[0]
    nb = Ep // eb
    piece_dims = tuple(int(p.shape[1]) for p in pieces)
    cdt = compute_dtype(*(p.dtype for p in pieces))
    in_specs = [pl.BlockSpec((8, eb), lambda b, w_: (b, 0), memory_space=pltpu.VMEM)]
    for d in piece_dims:
        in_specs.append(
            pl.BlockSpec((eb, d), lambda b, w_: (b, 0), memory_space=pltpu.VMEM)
        )
    in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # w0
    args = [win, offs_p, *pieces, w0]
    if n_hidden:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # w1
        args.append(w1)
    in_specs.append(
        pl.BlockSpec((wr, 1), lambda b, w_: (w_[b], 0), memory_space=pltpu.VMEM)
    )
    in_specs.append(
        pl.BlockSpec((wr, 1), lambda b, w_: (w_[b] + 1, 0), memory_space=pltpu.VMEM)
    )
    args.extend([y_ct, y_ct])
    out_specs = []
    out_shape = []
    for d in piece_dims:
        out_specs.append(
            pl.BlockSpec((eb, d), lambda b, w_: (b, 0), memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((Ep, d), cdt))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(nb,), in_specs=in_specs, out_specs=out_specs
    )
    kern = functools.partial(
        _readout_bwd_kernel, piece_dims=piece_dims, eb=eb, wr=wr,
        n_hidden=n_hidden, mlp_passes=mlp_passes, passes=passes,
    )
    outs = pl.pallas_call(
        kern,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=INTERPRET,
    )(*args)
    return tuple(outs)


def _latent_env_bwd_kernel(
    win_ref, offs_ref, *refs, piece_dims, dim_to_irr, U, eb, wr, S, n_hidden,
    wexp_dtype, nb, mlp_passes, passes=None
):
    """Backward of the mega kernel: recomputes the MLP forward from the saved
    inputs (VMEM-resident, no stored activations), unweights the raw denv
    pair into (dsh, dwexp), and backpropagates through w1/silu/w0 to the
    piece cotangents — all in one pass."""
    np_ = len(piece_dims)
    piece_refs = refs[:np_]
    k = np_
    sh_ref = refs[k]; k += 1
    w0_ref = refs[k]; k += 1
    w1_ref = refs[k] if n_hidden else None
    if n_hidden:
        k += 1
    tAw_ref, tAw1_ref, tBw_ref, tBw1_ref, glat_ref = refs[k : k + 5]
    out_refs = refs[k + 5 :]
    dsh_ref = out_refs[0]
    dpiece_refs = out_refs[1:]
    o = offs_ref[0, :]
    cdt = compute_dtype(*(r.dtype for r in piece_refs))
    piece_vals = [r[...] for r in piece_refs]
    pre, lat = _mlp_lat(piece_vals, w0_ref, w1_ref, piece_dims, n_hidden, cdt,
                        mlp_passes)
    wexp = lat[:, S:]
    if wexp_dtype is not None:
        wexp = wexp.astype(wexp_dtype).astype(cdt)
    tW, tW1 = _combine_window_tiles(
        win_ref, nb, tAw_ref[...], tAw1_ref[...], tBw_ref[...], tBw1_ref[...], cdt
    )
    t_eT = _gather_windows(o, tW, tW1, wr, cdt, passes).T
    shT = sh_ref[...].astype(cdt)
    wexpT = wexp.T
    d2 = len(dim_to_irr)
    n_irr = max(dim_to_irr) + 1
    dsh_rows = []
    acc = [None] * n_irr
    for j in range(d2):
        irr = dim_to_irr[j]
        tj = t_eT[j * U : (j + 1) * U, :]
        dsh_rows.append(
            jnp.sum(tj * wexpT[irr * U : (irr + 1) * U, :], axis=0, keepdims=True)
        )
        prod = tj * shT[j : j + 1, :]
        acc[irr] = prod if acc[irr] is None else acc[irr] + prod
    dsh_ref[...] = jnp.concatenate(dsh_rows, axis=0).astype(dsh_ref.dtype)
    dwexp = jnp.concatenate(acc, axis=0).T  # [eb, n_irr*U]
    dlat = jnp.concatenate([glat_ref[...].astype(cdt), dwexp], axis=1)
    _dn_t = (((1,), (1,)), ((), ()))
    if n_hidden:
        dh = _mlp_dot(dlat, w1_ref[...].astype(cdt), cdt, mlp_passes, dn=_dn_t)
        # d silu(x) = sigmoid(x) * (1 + x * (1 - sigmoid(x)))
        sig = jax.nn.sigmoid(pre)
        dh = dh * (sig * (1.0 + pre * (1.0 - sig)))
    else:
        dh = dlat
    w0 = w0_ref[...].astype(cdt)
    off = 0
    for r, d in zip(dpiece_refs, piece_dims):
        dp = _mlp_dot(dh, w0[off : off + d, :], cdt, mlp_passes, dn=_dn_t)
        r[...] = dp.astype(r.dtype)
        off += d


def latent_env_bwd_call(
    pieces, sh, w0, w1, dA, dB, g_lat, offs_p, win, *, dim_to_irr, U, eb, S,
    n_hidden, wr=None, wexp_dtype=None, mlp_passes=6, passes=None
):
    """→ (dsh [Ep, d2], dpieces tuple) from the raw denv pair + lat-scalar
    cotangent."""
    wr = eb if wr is None else wr
    Ep = sh.shape[0]
    nb = Ep // eb
    d2 = len(dim_to_irr)
    piece_dims = tuple(int(p.shape[1]) for p in pieces)
    sh_t = sh.T
    cdt = compute_dtype(*(p.dtype for p in pieces))
    in_specs = [pl.BlockSpec((8, eb), lambda b, w_: (b, 0), memory_space=pltpu.VMEM)]
    for d in piece_dims:
        in_specs.append(
            pl.BlockSpec((eb, d), lambda b, w_: (b, 0), memory_space=pltpu.VMEM)
        )
    in_specs.append(
        pl.BlockSpec((d2, eb), lambda b, w_: (0, b), memory_space=pltpu.VMEM)
    )
    in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # w0
    args = [win, offs_p, *pieces, sh_t, w0]
    if n_hidden:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # w1
        args.append(w1)
    in_specs.extend(_env_pair_specs(d2 * U, wr))
    in_specs.append(
        pl.BlockSpec((eb, S), lambda b, w_: (b, 0), memory_space=pltpu.VMEM)
    )
    args.extend([dA, dA, dB, dB, g_lat])
    out_specs = [
        pl.BlockSpec((d2, eb), lambda b, w_: (0, b), memory_space=pltpu.VMEM),
    ]
    out_shape = [jax.ShapeDtypeStruct((d2, Ep), cdt)]
    for d in piece_dims:
        out_specs.append(
            pl.BlockSpec((eb, d), lambda b, w_: (b, 0), memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((Ep, d), cdt))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(nb,), in_specs=in_specs, out_specs=out_specs
    )
    kern = functools.partial(
        _latent_env_bwd_kernel, piece_dims=piece_dims,
        dim_to_irr=tuple(dim_to_irr), U=U, eb=eb, wr=wr, S=S, n_hidden=n_hidden,
        wexp_dtype=wexp_dtype, nb=nb, mlp_passes=mlp_passes, passes=passes,
    )
    outs = pl.pallas_call(
        kern,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=INTERPRET,
    )(*args)
    dshT = outs[0]
    return dshT.T, tuple(outs[1:])
