"""The fused env+CG-TP kernel family as true JAX primitives — the trainable
second-generation backend.

Role: the reference accelerates its Contracter with Triton (inference,
``allegro/nn/_strided/_flashallegro.py``) and cuEquivariance (training +
inference, ``_cueq_contracter.py`` — whose kernel fuses the atoms→edges gather
in-CUDA, ``:104-123``). This module is the TPU equivalent with the WHOLE
per-layer dataflow fused (see ``fused_tp`` for the kernels):

    env_scatter(sh, wexp)        -> env   [Nr, d2*U]   (edges→rank-rows)
    gather_tp(x, env, w)         -> out   [Ep, d3*U]   (rank-rows→edges + CG)

``jax.custom_vjp`` forbids reverse-over-reverse, but force training needs
second-order AD. Every function here is multilinear, so the family CLOSES
under differentiation — each JVP term and each transpose is again one of the
six kernels with permuted roles:

    primitive            transpose wrt operand        result primitive
    env_scatter(sh,wexp)  sh                           unweight_sh(t, wexp)
                          wexp                         unweight_w(t, sh)
    gather_tp(x,env,w)    x                            gather_tp(g, env, w)ᵀ
                          env                          tp_scatter(x, g, w)
                          w                            gather_dw(x, env, g)
    tp_scatter(x,g,w)     x                            gather_tp(g, t, w)ᵀ
                          g                            gather_tp(x, t, w)
                          w                            gather_dw(x, t, g)
    gather_dw(x,env,g)    x                            gather_tp(g, env, v)ᵀ
                          env                          tp_scatter(x, g, v)
                          g                            gather_tp(x, env, v)
    unweight_sh(t,wexp)   t                            env_scatter(s, wexp)
                          wexp                         unweight_w(t, s)
    unweight_w(t,sh)      t                            env_scatter(sh, v)
                          sh                           unweight_sh(t, v)

(ᵀ = entries role-swapped (i,j,k)→(k,j,i), dims reversed.)

All primitives take the block plan (``offs`` [NB*8, eb] int32, ``win`` [NB]
int32 — see ``fused_tp.make_block_plan``) as trailing integer operands with
zero tangents.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import core
from jax.interpreters import ad, batching, mlir

from . import fused_tp

try:  # jax>=0.5 moved Primitive
    Primitive = core.Primitive
except AttributeError:  # pragma: no cover
    from jax.extend.core import Primitive  # type: ignore


def _swap_entries(entries):
    """(i,j,k,p,c) -> (k,j,i,p,c): output role moves to the first input."""
    return tuple((k, j, i, p, c) for (i, j, k, p, c) in entries)


def _rev(dims):
    return (dims[2], dims[1], dims[0])


def _sum_tangents(out, parts):
    if not parts:
        return ad.Zero(core.get_aval(out).to_tangent_aval())
    t = parts[0]
    for p in parts[1:]:
        t = t + p
    return t


def _zero_or_none(x):
    return ad.Zero(x.aval) if ad.is_undefined_primal(x) else None


def _cast_ct(val, primal):
    """Cotangents must carry the primal aval's dtype: with bf16 tensor-track
    storage the kernels compute/return f32 (compute_dtype), but stricter JAX
    versions reject transpose outputs whose dtype differs from the primal."""
    dt = primal.aval.dtype
    return val if val.dtype == dt else val.astype(dt)


# ---------------------------------------------------------------------------
# env_scatter: env[r, jU+u] = Σ_{e: rank_e=r} sh[e,j] wexp[e, irr(j)U+u]
# ---------------------------------------------------------------------------

env_scatter_p = Primitive("allegro_fused_env_scatter")


def env_scatter(sh, wexp, offs, win, *, dim_to_irr, U, eb, n_rank_rows,
                passes=None, wr=None):
    return env_scatter_p.bind(
        sh, wexp, offs, win, dim_to_irr=tuple(dim_to_irr), U=U, eb=eb,
        n_rank_rows=n_rank_rows, passes=passes, wr=wr,
    )


@env_scatter_p.def_abstract_eval
def _env_scatter_abs(sh, wexp, offs, win, *, dim_to_irr, U, eb, n_rank_rows,
                     passes=None, wr=None):
    dt = fused_tp.compute_dtype(sh.dtype, wexp.dtype)
    return core.ShapedArray((n_rank_rows, len(dim_to_irr) * U), dt)


def _env_scatter_impl(sh, wexp, offs, win, *, dim_to_irr, U, eb, n_rank_rows,
                      passes=None, wr=None):
    eA, eB = fused_tp.env_scatter_call(
        sh, wexp, offs, win, dim_to_irr=dim_to_irr, U=U, eb=eb,
        n_rank_rows=n_rank_rows, passes=passes, wr=wr,
    )
    return fused_tp.combine_scatter_outputs(eA, eB, win, wr or eb)


env_scatter_p.def_impl(lambda *a, **k: _env_scatter_impl(*a, **k))
mlir.register_lowering(env_scatter_p, mlir.lower_fun(_env_scatter_impl, multiple_results=False))


def _env_scatter_jvp(primals, tangents, **kw):
    sh, wexp, offs, win = primals
    dsh, dwexp, _, _ = tangents
    out = env_scatter(sh, wexp, offs, win, **kw)
    parts = []
    if type(dsh) is not ad.Zero:
        parts.append(env_scatter(dsh, wexp, offs, win, **kw))
    if type(dwexp) is not ad.Zero:
        parts.append(env_scatter(sh, dwexp, offs, win, **kw))
    return out, _sum_tangents(out, parts)


ad.primitive_jvps[env_scatter_p] = _env_scatter_jvp


def _env_scatter_transpose(ct, sh, wexp, offs, win, *, dim_to_irr, U, eb,
                           n_rank_rows, passes=None, wr=None):
    assert not (ad.is_undefined_primal(offs) or ad.is_undefined_primal(win))
    if type(ct) is ad.Zero:
        return (_zero_or_none(sh), _zero_or_none(wexp), None, None)
    kw = dict(dim_to_irr=dim_to_irr, U=U, eb=eb, passes=passes, wr=wr)
    if ad.is_undefined_primal(sh):
        gs = unweight_sh(ct, wexp, offs, win, **kw)
        return (_cast_ct(gs, sh), None, None, None)
    assert ad.is_undefined_primal(wexp)
    gw = unweight_w(ct, sh, offs, win, out_dtype=wexp.aval.dtype, **kw)
    return (None, gw, None, None)


ad.primitive_transposes[env_scatter_p] = _env_scatter_transpose


# ---------------------------------------------------------------------------
# gather_tp: out[e, kU+u] = Σ c w[p,u] x[e, iU+u] env[rank_e, jU+u]
# ---------------------------------------------------------------------------

gather_tp_p = Primitive("allegro_fused_gather_tp")


def gather_tp(x, env, w, offs, win, *, entries, dims, U, eb, passes=None, wr=None):
    return gather_tp_p.bind(
        x, env, w, offs, win, entries=tuple(entries), dims=tuple(dims), U=U,
        eb=eb, passes=passes, wr=wr,
    )


@gather_tp_p.def_abstract_eval
def _gather_tp_abs(x, env, w, offs, win, *, entries, dims, U, eb, passes=None, wr=None):
    return core.ShapedArray((x.shape[0], dims[2] * U), x.dtype)


def _gather_tp_impl(x, env, w, offs, win, *, entries, dims, U, eb, passes=None, wr=None):
    return fused_tp.gather_tp_call(
        x, env, env, w, offs, win, entries=entries, dims=dims, U=U, eb=eb,
        passes=passes, wr=wr,
    )


gather_tp_p.def_impl(lambda *a, **k: _gather_tp_impl(*a, **k))
mlir.register_lowering(gather_tp_p, mlir.lower_fun(_gather_tp_impl, multiple_results=False))


def _gather_tp_jvp(primals, tangents, **kw):
    x, env, w, offs, win = primals
    dx, denv, dw, _, _ = tangents
    out = gather_tp(x, env, w, offs, win, **kw)
    parts = []
    if type(dx) is not ad.Zero:
        parts.append(gather_tp(dx, env, w, offs, win, **kw))
    if type(denv) is not ad.Zero:
        parts.append(gather_tp(x, denv, w, offs, win, **kw))
    if type(dw) is not ad.Zero:
        parts.append(gather_tp(x, env, dw, offs, win, **kw))
    return out, _sum_tangents(out, parts)


ad.primitive_jvps[gather_tp_p] = _gather_tp_jvp


def _gather_tp_transpose(ct, x, env, w, offs, win, *, entries, dims, U, eb,
                         passes=None, wr=None):
    if type(ct) is ad.Zero:
        return (_zero_or_none(x), _zero_or_none(env), _zero_or_none(w), None, None)
    if ad.is_undefined_primal(x):
        gx = gather_tp(
            ct, env, w, offs, win, entries=_swap_entries(entries), dims=_rev(dims),
            U=U, eb=eb, passes=passes, wr=wr,
        )
        return (_cast_ct(gx, x), None, None, None, None)
    if ad.is_undefined_primal(env):
        genv = tp_scatter(
            x, ct, w, offs, win, entries=entries, dims=dims, U=U, eb=eb,
            n_rank_rows=env.aval.shape[0], passes=passes, wr=wr,
        )
        return (None, _cast_ct(genv, env), None, None, None)
    assert ad.is_undefined_primal(w)
    gw = gather_dw(x, env, ct, offs, win, entries=entries, dims=dims, U=U,
                   eb=eb, passes=passes, wr=wr)
    return (None, None, _cast_ct(gw, w), None, None)


ad.primitive_transposes[gather_tp_p] = _gather_tp_transpose


# ---------------------------------------------------------------------------
# tp_scatter: denv[r, jU+u] = Σ_{e: rank_e=r} Σ c w[p,u] x[e,iU+u] g[e,kU+u]
# ---------------------------------------------------------------------------

tp_scatter_p = Primitive("allegro_fused_tp_scatter")


def tp_scatter(x, g, w, offs, win, *, entries, dims, U, eb, n_rank_rows,
               passes=None, wr=None):
    return tp_scatter_p.bind(
        x, g, w, offs, win, entries=tuple(entries), dims=tuple(dims), U=U,
        eb=eb, n_rank_rows=n_rank_rows, passes=passes, wr=wr,
    )


@tp_scatter_p.def_abstract_eval
def _tp_scatter_abs(x, g, w, offs, win, *, entries, dims, U, eb, n_rank_rows,
                    passes=None, wr=None):
    dt = fused_tp.compute_dtype(x.dtype, g.dtype)
    return core.ShapedArray((n_rank_rows, dims[1] * U), dt)


def _tp_scatter_impl(x, g, w, offs, win, *, entries, dims, U, eb, n_rank_rows,
                     passes=None, wr=None):
    dA, dB = fused_tp.tp_scatter_call(
        x, g, w, offs, win, entries=entries, dims=dims, U=U, eb=eb,
        n_rank_rows=n_rank_rows, passes=passes, wr=wr,
    )
    return fused_tp.combine_scatter_outputs(dA, dB, win, wr or eb)


tp_scatter_p.def_impl(lambda *a, **k: _tp_scatter_impl(*a, **k))
mlir.register_lowering(tp_scatter_p, mlir.lower_fun(_tp_scatter_impl, multiple_results=False))


def _tp_scatter_jvp(primals, tangents, **kw):
    x, g, w, offs, win = primals
    dx, dg, dw, _, _ = tangents
    out = tp_scatter(x, g, w, offs, win, **kw)
    parts = []
    if type(dx) is not ad.Zero:
        parts.append(tp_scatter(dx, g, w, offs, win, **kw))
    if type(dg) is not ad.Zero:
        parts.append(tp_scatter(x, dg, w, offs, win, **kw))
    if type(dw) is not ad.Zero:
        parts.append(tp_scatter(x, g, dw, offs, win, **kw))
    return out, _sum_tangents(out, parts)


ad.primitive_jvps[tp_scatter_p] = _tp_scatter_jvp


def _tp_scatter_transpose(ct, x, g, w, offs, win, *, entries, dims, U, eb,
                          n_rank_rows, passes=None, wr=None):
    if type(ct) is ad.Zero:
        return (_zero_or_none(x), _zero_or_none(g), _zero_or_none(w), None, None)
    kw = dict(U=U, eb=eb, passes=passes, wr=wr)
    if ad.is_undefined_primal(x):
        gx = gather_tp(
            g, ct, w, offs, win, entries=_swap_entries(entries), dims=_rev(dims), **kw
        )
        return (_cast_ct(gx, x), None, None, None, None)
    if ad.is_undefined_primal(g):
        gg = gather_tp(x, ct, w, offs, win, entries=entries, dims=dims, **kw)
        return (None, _cast_ct(gg, g), None, None, None)
    assert ad.is_undefined_primal(w)
    gw = gather_dw(x, ct, g, offs, win, entries=entries, dims=dims, **kw)
    return (None, None, _cast_ct(gw, w), None, None)


ad.primitive_transposes[tp_scatter_p] = _tp_scatter_transpose


# ---------------------------------------------------------------------------
# gather_dw: dw[p, u] = Σ_e Σ_{(i,j,k)∈p} c x[e,iU+u] env[rank_e,jU+u] g[e,kU+u]
# ---------------------------------------------------------------------------

gather_dw_p = Primitive("allegro_fused_gather_dw")


def gather_dw(x, env, g, offs, win, *, entries, dims, U, eb, passes=None, wr=None):
    return gather_dw_p.bind(
        x, env, g, offs, win, entries=tuple(entries), dims=tuple(dims), U=U,
        eb=eb, passes=passes, wr=wr,
    )


@gather_dw_p.def_abstract_eval
def _gather_dw_abs(x, env, g, offs, win, *, entries, dims, U, eb, passes=None, wr=None):
    n_paths = 1 + max(e[3] for e in entries)
    return core.ShapedArray((n_paths, U), fused_tp.compute_dtype(x.dtype, g.dtype))


def _gather_dw_impl(x, env, g, offs, win, *, entries, dims, U, eb, passes=None, wr=None):
    return fused_tp.gather_dw_call(
        x, env, env, g, offs, win, entries=entries, dims=dims, U=U, eb=eb,
        passes=passes, wr=wr,
    )


gather_dw_p.def_impl(lambda *a, **k: _gather_dw_impl(*a, **k))
mlir.register_lowering(gather_dw_p, mlir.lower_fun(_gather_dw_impl, multiple_results=False))


def _gather_dw_jvp(primals, tangents, **kw):
    x, env, g, offs, win = primals
    dx, denv, dg, _, _ = tangents
    out = gather_dw(x, env, g, offs, win, **kw)
    parts = []
    if type(dx) is not ad.Zero:
        parts.append(gather_dw(dx, env, g, offs, win, **kw))
    if type(denv) is not ad.Zero:
        parts.append(gather_dw(x, denv, g, offs, win, **kw))
    if type(dg) is not ad.Zero:
        parts.append(gather_dw(x, env, dg, offs, win, **kw))
    return out, _sum_tangents(out, parts)


ad.primitive_jvps[gather_dw_p] = _gather_dw_jvp


def _gather_dw_transpose(ct, x, env, g, offs, win, *, entries, dims, U, eb,
                         passes=None, wr=None):
    if type(ct) is ad.Zero:
        return (_zero_or_none(x), _zero_or_none(env), _zero_or_none(g), None, None)
    kw = dict(U=U, eb=eb, passes=passes, wr=wr)
    if ad.is_undefined_primal(x):
        gx = gather_tp(
            g, env, ct, offs, win, entries=_swap_entries(entries), dims=_rev(dims), **kw
        )
        return (_cast_ct(gx, x), None, None, None, None)
    if ad.is_undefined_primal(env):
        genv = tp_scatter(
            x, g, ct, offs, win, entries=entries, dims=dims,
            n_rank_rows=env.aval.shape[0], **kw,
        )
        return (None, _cast_ct(genv, env), None, None, None)
    assert ad.is_undefined_primal(g)
    gg = gather_tp(x, env, ct, offs, win, entries=entries, dims=dims, **kw)
    return (None, None, _cast_ct(gg, g), None, None)


ad.primitive_transposes[gather_dw_p] = _gather_dw_transpose


# ---------------------------------------------------------------------------
# unweight_sh: dsh[e, j] = Σ_u t[rank_e, jU+u] wexp[e, irr(j)U+u]
# ---------------------------------------------------------------------------

unweight_sh_p = Primitive("allegro_fused_unweight_sh")


def unweight_sh(t, wexp, offs, win, *, dim_to_irr, U, eb, passes=None, wr=None):
    return unweight_sh_p.bind(
        t, wexp, offs, win, dim_to_irr=tuple(dim_to_irr), U=U, eb=eb,
        passes=passes, wr=wr,
    )


@unweight_sh_p.def_abstract_eval
def _unweight_sh_abs(t, wexp, offs, win, *, dim_to_irr, U, eb, passes=None, wr=None):
    return core.ShapedArray(
        (wexp.shape[0], len(dim_to_irr)), fused_tp.compute_dtype(t.dtype)
    )


def _unweight_sh_impl(t, wexp, offs, win, *, dim_to_irr, U, eb, passes=None, wr=None):
    return fused_tp.gather_unweight_sh_call(
        t, t, wexp, offs, win, dim_to_irr=dim_to_irr, U=U, eb=eb, passes=passes, wr=wr
    )


unweight_sh_p.def_impl(lambda *a, **k: _unweight_sh_impl(*a, **k))
mlir.register_lowering(unweight_sh_p, mlir.lower_fun(_unweight_sh_impl, multiple_results=False))


def _unweight_sh_jvp(primals, tangents, **kw):
    t, wexp, offs, win = primals
    dt, dwexp, _, _ = tangents
    out = unweight_sh(t, wexp, offs, win, **kw)
    parts = []
    if type(dt) is not ad.Zero:
        parts.append(unweight_sh(dt, wexp, offs, win, **kw))
    if type(dwexp) is not ad.Zero:
        parts.append(unweight_sh(t, dwexp, offs, win, **kw))
    return out, _sum_tangents(out, parts)


ad.primitive_jvps[unweight_sh_p] = _unweight_sh_jvp


def _unweight_sh_transpose(ct, t, wexp, offs, win, *, dim_to_irr, U, eb,
                           passes=None, wr=None):
    if type(ct) is ad.Zero:
        return (_zero_or_none(t), _zero_or_none(wexp), None, None)
    kw = dict(dim_to_irr=dim_to_irr, U=U, eb=eb, passes=passes, wr=wr)
    if ad.is_undefined_primal(t):
        gt = env_scatter(ct, wexp, offs, win, n_rank_rows=t.aval.shape[0], **kw)
        return (_cast_ct(gt, t), None, None, None)
    assert ad.is_undefined_primal(wexp)
    gw = unweight_w(t, ct, offs, win, out_dtype=wexp.aval.dtype, **kw)
    return (None, gw, None, None)


ad.primitive_transposes[unweight_sh_p] = _unweight_sh_transpose


# ---------------------------------------------------------------------------
# unweight_w: dwexp[e, irrU+u] = Σ_{j: irr(j)=irr} t[rank_e, jU+u] sh[e, j]
# ---------------------------------------------------------------------------

unweight_w_p = Primitive("allegro_fused_unweight_w")


def unweight_w(t, sh, offs, win, *, dim_to_irr, U, eb, out_dtype=None,
               passes=None, wr=None):
    return unweight_w_p.bind(
        t, sh, offs, win, dim_to_irr=tuple(dim_to_irr), U=U, eb=eb,
        out_dtype=None if out_dtype is None else str(out_dtype), passes=passes, wr=wr,
    )


@unweight_w_p.def_abstract_eval
def _unweight_w_abs(t, sh, offs, win, *, dim_to_irr, U, eb, out_dtype=None,
                    passes=None, wr=None):
    n_irr = max(dim_to_irr) + 1
    dt = fused_tp.compute_dtype(t.dtype) if out_dtype is None else jnp.dtype(out_dtype)
    return core.ShapedArray((sh.shape[0], n_irr * U), dt)


def _unweight_w_impl(t, sh, offs, win, *, dim_to_irr, U, eb, out_dtype=None,
                     passes=None, wr=None):
    return fused_tp.gather_unweight_w_call(
        t, t, sh, offs, win, dim_to_irr=dim_to_irr, U=U, eb=eb,
        out_dtype=None if out_dtype is None else jnp.dtype(out_dtype),
        passes=passes, wr=wr,
    )


unweight_w_p.def_impl(lambda *a, **k: _unweight_w_impl(*a, **k))
mlir.register_lowering(unweight_w_p, mlir.lower_fun(_unweight_w_impl, multiple_results=False))


def _unweight_w_jvp(primals, tangents, **kw):
    t, sh, offs, win = primals
    dt, dsh, _, _ = tangents
    out = unweight_w(t, sh, offs, win, **kw)
    parts = []
    if type(dt) is not ad.Zero:
        parts.append(unweight_w(dt, sh, offs, win, **kw))
    if type(dsh) is not ad.Zero:
        parts.append(unweight_w(t, dsh, offs, win, **kw))
    return out, _sum_tangents(out, parts)


ad.primitive_jvps[unweight_w_p] = _unweight_w_jvp


def _unweight_w_transpose(ct, t, sh, offs, win, *, dim_to_irr, U, eb,
                          out_dtype=None, passes=None, wr=None):
    if type(ct) is ad.Zero:
        return (_zero_or_none(t), _zero_or_none(sh), None, None)
    kw = dict(dim_to_irr=dim_to_irr, U=U, eb=eb, passes=passes, wr=wr)
    if ad.is_undefined_primal(t):
        gt = env_scatter(sh, ct, offs, win, n_rank_rows=t.aval.shape[0], **kw)
        return (_cast_ct(gt, t), None, None, None)
    assert ad.is_undefined_primal(sh)
    gs = unweight_sh(t, ct, offs, win, **kw)
    return (None, _cast_ct(gs, sh), None, None)


ad.primitive_transposes[unweight_w_p] = _unweight_w_transpose


# ---------------------------------------------------------------------------
# center_scatter / center_gather: atom-indexed segment-sum over sorted edge
# centers and its transpose (per-atom → per-edge broadcast), as rank-window
# Pallas kernels. Requires the identity rank map (every atom is a center, so
# rank r == atom r — validated where the plan is precomputed). Replaces
# XLA's slow TPU row scatter/gather for forces accumulation and per-atom
# energy reduction; the pair is closed under transposition (arbitrary-order
# AD for force training).
# ---------------------------------------------------------------------------

center_scatter_p = Primitive("allegro_center_scatter")
center_gather_p = Primitive("allegro_center_gather")


def center_scatter(vals, offs, win, *, eb, n_atoms, passes=None, wr=None):
    """vals [Ep, C] per-edge → [n_atoms, C] sums over each edge's center."""
    return center_scatter_p.bind(vals, offs, win, eb=eb, n_atoms=n_atoms,
                                 passes=passes, wr=wr)


def center_gather(atom_vals, offs, win, *, eb, n_edges, passes=None, wr=None):
    """atom_vals [n_atoms, C] → per-edge [n_edges, C] (value of each edge's
    center atom; padded sentinel edges read garbage rank rows — mask/ignore).

    ``passes=3`` pins the one-hot split exact — REQUIRED for position
    gathers: positions are O(cell)-magnitude, so a dropped split term puts
    ~2^-17·|cell| of noise on every edge vector (≫ the 5e-5 force
    tolerance); feature-magnitude consumers may follow the global policy."""
    return center_gather_p.bind(atom_vals, offs, win, eb=eb, n_edges=n_edges,
                                passes=passes, wr=wr)


@center_scatter_p.def_abstract_eval
def _center_scatter_abs(vals, offs, win, *, eb, n_atoms, passes=None, wr=None):
    return core.ShapedArray((n_atoms, vals.shape[1]), fused_tp.compute_dtype(vals.dtype))


@center_gather_p.def_abstract_eval
def _center_gather_abs(atom_vals, offs, win, *, eb, n_edges, passes=None, wr=None):
    return core.ShapedArray(
        (n_edges, atom_vals.shape[1]), fused_tp.compute_dtype(atom_vals.dtype)
    )


def _center_scatter_impl(vals, offs, win, *, eb, n_atoms, passes=None, wr=None):
    sA, sB = fused_tp.center_sum_call(
        vals.T, offs, win, eb=eb,
        n_rank_rows=fused_tp.num_rank_rows(n_atoms, wr or eb), passes=passes,
        wr=wr,
    )
    comb = fused_tp.combine_scatter_cols(sA, sB, win, wr or eb)
    return comb[:, :n_atoms].T


def _center_gather_impl(atom_vals, offs, win, *, eb, n_edges, passes=None, wr=None):
    n_rank = fused_tp.num_rank_rows(atom_vals.shape[0], wr or eb)
    aT = jnp.pad(atom_vals.T, ((0, 0), (0, n_rank - atom_vals.shape[0])))
    return fused_tp.center_broadcast_call(
        aT, offs, win, eb=eb, Ep=n_edges, passes=passes, wr=wr
    ).T


for p, impl in (
    (center_scatter_p, _center_scatter_impl),
    (center_gather_p, _center_gather_impl),
):
    p.def_impl(functools.partial(lambda f, *a, **k: f(*a, **k), impl))
    mlir.register_lowering(p, mlir.lower_fun(impl, multiple_results=False))


def _center_scatter_jvp(primals, tangents, **kw):
    vals, offs, win = primals
    dv = tangents[0]
    out = center_scatter(vals, offs, win, **kw)
    parts = [] if type(dv) is ad.Zero else [center_scatter(dv, offs, win, **kw)]
    return out, _sum_tangents(out, parts)


def _center_gather_jvp(primals, tangents, **kw):
    av, offs, win = primals
    dv = tangents[0]
    out = center_gather(av, offs, win, **kw)
    parts = [] if type(dv) is ad.Zero else [center_gather(dv, offs, win, **kw)]
    return out, _sum_tangents(out, parts)


ad.primitive_jvps[center_scatter_p] = _center_scatter_jvp
ad.primitive_jvps[center_gather_p] = _center_gather_jvp


def _center_scatter_transpose(ct, vals, offs, win, *, eb, n_atoms, passes=None, wr=None):
    if type(ct) is ad.Zero:
        return (_zero_or_none(vals), None, None)
    assert ad.is_undefined_primal(vals)
    gv = center_gather(ct, offs, win, eb=eb, n_edges=vals.aval.shape[0],
                       passes=passes, wr=wr)
    return (_cast_ct(gv, vals), None, None)


def _center_gather_transpose(ct, atom_vals, offs, win, *, eb, n_edges,
                             passes=None, wr=None):
    if type(ct) is ad.Zero:
        return (_zero_or_none(atom_vals), None, None)
    assert ad.is_undefined_primal(atom_vals)
    gv = center_scatter(ct, offs, win, eb=eb, n_atoms=atom_vals.aval.shape[0],
                        passes=passes, wr=wr)
    return (_cast_ct(gv, atom_vals), None, None)


ad.primitive_transposes[center_scatter_p] = _center_scatter_transpose
ad.primitive_transposes[center_gather_p] = _center_gather_transpose


# ---------------------------------------------------------------------------
# perm_rows: static row permutation with a KNOWN inverse. jnp.take would
# transpose to an XLA scatter-add (~0.7 ms at production edge counts — the
# op this exists to avoid); with the inverse given, the transpose is just the
# inverse permutation's take. Used to route the neighbor-side force scatter
# through the rank-window kernels via a neighbor-sorted block plan.
# ---------------------------------------------------------------------------

perm_rows_p = Primitive("allegro_perm_rows")


def perm_rows(x, perm, perm_inv):
    """x [N, C] → x[perm] — differentiable, with transpose = take(ct, perm_inv)."""
    return perm_rows_p.bind(x, perm, perm_inv)


@perm_rows_p.def_abstract_eval
def _perm_rows_abs(x, perm, perm_inv):
    return core.ShapedArray((perm.shape[0],) + x.shape[1:], x.dtype)


def _perm_rows_impl(x, perm, perm_inv):
    return jnp.take(x, perm, axis=0)


perm_rows_p.def_impl(_perm_rows_impl)
mlir.register_lowering(perm_rows_p, mlir.lower_fun(_perm_rows_impl, multiple_results=False))


def _perm_rows_jvp(primals, tangents):
    x, perm, perm_inv = primals
    dx = tangents[0]
    out = perm_rows(x, perm, perm_inv)
    parts = [] if type(dx) is ad.Zero else [perm_rows(dx, perm, perm_inv)]
    return out, _sum_tangents(out, parts)


ad.primitive_jvps[perm_rows_p] = _perm_rows_jvp


def _perm_rows_transpose(ct, x, perm, perm_inv):
    if type(ct) is ad.Zero:
        return (_zero_or_none(x), None, None)
    assert ad.is_undefined_primal(x)
    # valid for true permutations (bijections): Σ_e ct[e]·x[perm[e]] as a
    # function of x has gradient ct[perm_inv]
    return (_cast_ct(perm_rows(ct, perm_inv, perm), x), None, None)


ad.primitive_transposes[perm_rows_p] = _perm_rows_transpose


# ---------------------------------------------------------------------------
# batching: lax.map fallback (the model path never vmaps these; tests may)
# ---------------------------------------------------------------------------


def _map_batcher(bind_fn, n_primal):
    def batcher(args, bdims, **kw):
        B = next(x.shape[d] for x, d in zip(args, bdims) if d is not None)
        moved = []
        for x, d in zip(args, bdims):
            if d is None:
                moved.append(jnp.broadcast_to(x, (B,) + x.shape))
            else:
                moved.append(jnp.moveaxis(x, d, 0))

        def one(xs):
            return bind_fn(*xs, **kw)

        return jax.lax.map(one, tuple(moved)), 0

    return batcher


batching.primitive_batchers[env_scatter_p] = _map_batcher(env_scatter, 2)
batching.primitive_batchers[gather_tp_p] = _map_batcher(gather_tp, 3)
batching.primitive_batchers[tp_scatter_p] = _map_batcher(tp_scatter, 3)
batching.primitive_batchers[gather_dw_p] = _map_batcher(gather_dw, 3)
batching.primitive_batchers[unweight_sh_p] = _map_batcher(unweight_sh, 2)
batching.primitive_batchers[unweight_w_p] = _map_batcher(unweight_w, 2)
batching.primitive_batchers[center_scatter_p] = _map_batcher(center_scatter, 1)
batching.primitive_batchers[center_gather_p] = _map_batcher(center_gather, 1)
batching.primitive_batchers[perm_rows_p] = _map_batcher(perm_rows, 1)


# ---------------------------------------------------------------------------
# the layer-level entry point
# ---------------------------------------------------------------------------


def fused_layer(x, sh, wexp, w, offs, win, *, entries, dims, U, eb, dim_to_irr,
                n_rank_rows, passes=None, wr=None):
    """One Allegro layer's tensor-track update, fully fused.

    x [Ep, d1*U] tensor features; sh [Ep, d2] basis; wexp [Ep, n_irr*U]
    env weights (irr-major, scatter_factor pre-applied); w [P, U] path
    weights. Returns [Ep, d3*U].
    """
    env = env_scatter(
        sh, wexp, offs, win, dim_to_irr=dim_to_irr, U=U, eb=eb,
        n_rank_rows=n_rank_rows, passes=passes, wr=wr,
    )
    return gather_tp(x, env, w, offs, win, entries=entries, dims=dims, U=U,
                     eb=eb, passes=passes, wr=wr)


# ---------------------------------------------------------------------------
# inference fast path: fused one-pass backward (custom_vjp, first-order only)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11, 12, 13))
def fused_layer_infer(x, sh, wexp, w, offs, win, entries, dims, U, eb, dim_to_irr,
                      n_rank_rows, passes=None, wr=None):
    """Same math as ``fused_layer`` but with a ONE-PASS fused backward:
    (dx, denv, dw) from one kernel sharing the g/x loads and env gather, then
    (dsh, dwexp) from one kernel sharing the denv gather — the HBM-bound
    chip's analogue of FlashAllegro's shared-kernel backward
    (``_flashallegro.py:583-639``). First-order AD only (the role of the
    reference's inference-scoped Triton backend); training uses the primitive
    path (``fused_layer``), which supports arbitrary-order AD.

    Environment arrays stay in RAW (A, B) window-partial form end to end —
    consumers reconstruct tiles in VMEM (``fused_tp._combine_window_tiles``)
    instead of paying three full [n_rank_rows, d2*U] passes per combine."""
    eA, eB = fused_tp.env_scatter_call(
        sh, wexp, offs, win, dim_to_irr=dim_to_irr, U=U, eb=eb,
        n_rank_rows=n_rank_rows, passes=passes, wr=wr,
    )
    return fused_tp.gather_tp_raw_call(
        x, eA, eB, w, offs, win, entries=entries, dims=dims, U=U, eb=eb,
        passes=passes, wr=wr,
    )


def _fli_fwd(x, sh, wexp, w, offs, win, entries, dims, U, eb, dim_to_irr,
             n_rank_rows, passes=None, wr=None):
    eA, eB = fused_tp.env_scatter_call(
        sh, wexp, offs, win, dim_to_irr=dim_to_irr, U=U, eb=eb,
        n_rank_rows=n_rank_rows, passes=passes, wr=wr,
    )
    out = fused_tp.gather_tp_raw_call(
        x, eA, eB, w, offs, win, entries=entries, dims=dims, U=U, eb=eb,
        passes=passes, wr=wr,
    )
    return out, (x, sh, wexp, w, eA, eB, offs, win)


def _fli_bwd(entries, dims, U, eb, dim_to_irr, n_rank_rows, passes, wr, res, g):
    import numpy as np

    x, sh, wexp, w, eA, eB, offs, win = res
    # with_dw=False: fused_layer_infer is the inference/MD backend — the
    # weight cotangent is discarded by the force call, and skipping the
    # per-path in-kernel reductions is a large VPU saving in the hottest
    # kernel. dw is returned as NaN so accidental parameter training on the
    # inference backend fails LOUDLY instead of silently (training uses the
    # `fused` primitive backend, which computes real weight grads).
    dx, dA, dB = fused_tp.bwd_fused_raw_call(
        x, g, eA, eB, w, offs, win, entries=entries, dims=dims, U=U, eb=eb,
        n_rank_rows=n_rank_rows, passes=passes, wr=wr,
    )
    dw = jnp.full(w.shape, jnp.nan, fused_tp.compute_dtype(w.dtype))
    dsh, dwexp = fused_tp.unweight_both_raw_call(
        dA, dB, sh, wexp, offs, win, dim_to_irr=dim_to_irr, U=U, eb=eb,
        passes=passes, wr=wr,
    )
    zoffs = np.zeros(offs.shape, jax.dtypes.float0)
    zwin = np.zeros(win.shape, jax.dtypes.float0)
    # cotangent dtypes must equal the primal dtypes (bf16 storage mode:
    # kernels return f32 compute_dtype, but w/x may be stored bf16)
    if dx.dtype != x.dtype:
        dx = dx.astype(x.dtype)
    if dsh.dtype != sh.dtype:
        dsh = dsh.astype(sh.dtype)
    if dwexp.dtype != wexp.dtype:
        dwexp = dwexp.astype(wexp.dtype)
    if dw.dtype != w.dtype:
        dw = dw.astype(w.dtype)
    return (dx, dsh, dwexp, dw, zoffs, zwin)


fused_layer_infer.defvjp(_fli_fwd, _fli_bwd)


# ---------------------------------------------------------------------------
# mega-layer inference ops (custom_vjp, first-order, raw-window env pair):
#   mega_latent_env: latent MLP + env-weight slice + env scatter, one kernel
#   gather_tp_infer: env gather + CG-TP with the one-pass fused dx/denv bwd
# The (eA, eB) pair is a closed convention between these two ops: cotangents
# wrt (eA, eB) are returned AS the scatter-window partials (dA, dB) and
# consumed through the same 4-view combine — never mix with other consumers.
# Weight cotangents are NaN by design (inference scope; train with `fused`).
# ---------------------------------------------------------------------------


def _f0_like(a):
    import numpy as np

    return np.zeros(a.shape, jax.dtypes.float0)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11, 12, 13, 14)
)
def mega_latent_env(pieces, sh, w0, w1, offs, win,
                    dim_to_irr, U, eb, n_rank_rows, S, wexp_dtype,
                    mlp_passes=6, passes=None, wr=None):
    n_hidden = 1 if w1 is not None else 0
    return fused_tp.latent_env_scatter_call(
        pieces, sh, w0, w1, offs, win, dim_to_irr=dim_to_irr, U=U, eb=eb,
        n_rank_rows=n_rank_rows, S=S, n_hidden=n_hidden, wexp_dtype=wexp_dtype,
        mlp_passes=mlp_passes, passes=passes, wr=wr,
    )


def _mle_fwd(pieces, sh, w0, w1, offs, win, dim_to_irr, U, eb, n_rank_rows, S,
             wexp_dtype, mlp_passes=6, passes=None, wr=None):
    out = mega_latent_env(
        pieces, sh, w0, w1, offs, win, dim_to_irr, U, eb, n_rank_rows, S,
        wexp_dtype, mlp_passes, passes, wr,
    )
    return out, (pieces, sh, w0, w1, offs, win)


def _mle_bwd(dim_to_irr, U, eb, n_rank_rows, S, wexp_dtype, mlp_passes, passes,
             wr, res, ct):
    pieces, sh, w0, w1, offs, win = res
    g_lat, dA, dB = ct
    n_hidden = 1 if w1 is not None else 0
    dsh, dpieces = fused_tp.latent_env_bwd_call(
        pieces, sh, w0, w1, dA, dB, g_lat, offs, win, dim_to_irr=dim_to_irr,
        U=U, eb=eb, S=S, n_hidden=n_hidden, wexp_dtype=wexp_dtype,
        mlp_passes=mlp_passes, passes=passes, wr=wr,
    )
    dpieces = tuple(_cast_ct(dp, _Aval(p)) for dp, p in zip(dpieces, pieces))
    dw0 = jnp.full(w0.shape, jnp.nan, fused_tp.compute_dtype(w0.dtype))
    dw1 = None if w1 is None else jnp.full(
        w1.shape, jnp.nan, fused_tp.compute_dtype(w1.dtype)
    )
    return (dpieces, _cast_ct(dsh, _Aval(sh)), dw0, dw1,
            _f0_like(offs), _f0_like(win))


class _Aval:
    """Tiny adapter so _cast_ct (which expects .aval.dtype) works on values."""

    def __init__(self, x):
        self.aval = x


mega_latent_env.defvjp(_mle_fwd, _mle_bwd)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11, 12, 13, 14)
)
def gather_tp_infer(x, eA, eB, w, offs, win, entries, dims, U, eb, n_rank_rows,
                    passes=None, split_scalars=False, scalar_dtype=None,
                    wr=None):
    """``split_scalars``: additionally return the leading-0e scalar block as
    its own [Ep, U] array — (out, tp_scalars). Saves the consumer a full
    [Ep, d3*U] read per slice AND keeps the two cotangents separate (the bwd
    kernel folds the scalar cotangent into g in VMEM) instead of XLA's
    pad+add fusion over the full array."""
    return fused_tp.gather_tp_raw_call(
        x, eA, eB, w, offs, win, entries=entries, dims=dims, U=U, eb=eb,
        passes=passes, split_scalars=split_scalars, scalar_dtype=scalar_dtype,
        wr=wr,
    )


def _gti_fwd(x, eA, eB, w, offs, win, entries, dims, U, eb, n_rank_rows,
             passes=None, split_scalars=False, scalar_dtype=None, wr=None):
    out = gather_tp_infer(x, eA, eB, w, offs, win, entries, dims, U, eb,
                          n_rank_rows, passes, split_scalars, scalar_dtype, wr)
    return out, (x, eA, eB, w, offs, win)


def _gti_bwd(entries, dims, U, eb, n_rank_rows, passes, split_scalars,
             scalar_dtype, wr, res, ct):
    x, eA, eB, w, offs, win = res
    if split_scalars:
        g, gts = ct
    else:
        g, gts = ct, None
    dx, dA, dB = fused_tp.bwd_fused_raw_call(
        x, g, eA, eB, w, offs, win, entries=entries, dims=dims, U=U, eb=eb,
        n_rank_rows=n_rank_rows, passes=passes, gts=gts, wr=wr,
    )
    dw = jnp.full(w.shape, jnp.nan, fused_tp.compute_dtype(w.dtype))
    return (_cast_ct(dx, _Aval(x)), dA, dB, dw, _f0_like(offs), _f0_like(win))


gather_tp_infer.defvjp(_gti_fwd, _gti_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def env_scatter_infer(sh, wexp, offs, win, dim_to_irr, U, eb, n_rank_rows,
                      passes=None, wr=None):
    """(eA, eB) from explicit env weights (layer-0 path when the producing
    projection is not mega-fused)."""
    return fused_tp.env_scatter_call(
        sh, wexp, offs, win, dim_to_irr=dim_to_irr, U=U, eb=eb,
        n_rank_rows=n_rank_rows, passes=passes, wr=wr,
    )


def _esi_fwd(sh, wexp, offs, win, dim_to_irr, U, eb, n_rank_rows, passes=None,
             wr=None):
    out = env_scatter_infer(sh, wexp, offs, win, dim_to_irr, U, eb,
                            n_rank_rows, passes, wr)
    return out, (sh, wexp, offs, win)


def _esi_bwd(dim_to_irr, U, eb, n_rank_rows, passes, wr, res, ct):
    sh, wexp, offs, win = res
    dA, dB = ct
    dsh, dwexp = fused_tp.unweight_both_raw_call(
        dA, dB, sh, wexp, offs, win, dim_to_irr=dim_to_irr, U=U, eb=eb,
        passes=passes, wr=wr,
    )
    return (_cast_ct(dsh, _Aval(sh)), _cast_ct(dwexp, _Aval(wexp)),
            _f0_like(offs), _f0_like(win))


env_scatter_infer.defvjp(_esi_fwd, _esi_bwd)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17)
)
def gather_tp_embed_infer(sh, w2b, eA, eB, w, offs, win, entries, dims, U, eb,
                          n_rank_rows, row_specs, out_dtype, passes=None,
                          split_scalars=False, scalar_dtype=None, wr=None):
    """Layer-0 gather+TP with the two-body tensor embedding fused IN-KERNEL:
    the initial tensor features x0[e, i*U+u] = sh[e, j_i] * w2b[e, irr_i*U+u]
    (reference ``allegro/nn/tensorembed.py:85-96``) are built on the fly from
    the small factors — the [E, d1*U] x0 and its cotangent never exist in HBM.
    Inference scope (one-pass fused backward; NaN weight cotangent)."""
    return fused_tp.gather_tp_embed_raw_call(
        sh, w2b, eA, eB, w, offs, win, entries=entries, dims=dims, U=U, eb=eb,
        row_specs=row_specs, out_dtype=out_dtype, passes=passes,
        split_scalars=split_scalars, scalar_dtype=scalar_dtype, wr=wr,
    )


def _gtei_fwd(sh, w2b, eA, eB, w, offs, win, entries, dims, U, eb,
              n_rank_rows, row_specs, out_dtype, passes=None,
              split_scalars=False, scalar_dtype=None, wr=None):
    out = gather_tp_embed_infer(
        sh, w2b, eA, eB, w, offs, win, entries, dims, U, eb, n_rank_rows,
        row_specs, out_dtype, passes, split_scalars, scalar_dtype, wr,
    )
    return out, (sh, w2b, eA, eB, w, offs, win)


def _gtei_bwd(entries, dims, U, eb, n_rank_rows, row_specs, out_dtype, passes,
              split_scalars, scalar_dtype, wr, res, ct):
    sh, w2b, eA, eB, w, offs, win = res
    if split_scalars:
        g, gts = ct
    else:
        g, gts = ct, None
    dsh, dw2b, dA, dB = fused_tp.bwd_embed_raw_call(
        sh, w2b, g, eA, eB, w, offs, win, entries=entries, dims=dims, U=U,
        eb=eb, n_rank_rows=n_rank_rows, row_specs=row_specs, passes=passes,
        gts=gts, wr=wr,
    )
    dw = jnp.full(w.shape, jnp.nan, fused_tp.compute_dtype(w.dtype))
    return (_cast_ct(dsh, _Aval(sh)), _cast_ct(dw2b, _Aval(w2b)), dA, dB,
            _cast_ct(dw, _Aval(w)), _f0_like(offs), _f0_like(win))


gather_tp_embed_infer.defvjp(_gtei_fwd, _gtei_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def readout_sum_infer(pieces, w0, w1, offs, win, eb, n_rank_rows, n_atoms,
                      n_hidden, mlp_passes=6, wr=None):
    # NOTE: the per-atom ENERGY scatter (and its backward gather) is pinned
    # exact (passes=3) regardless of the one-hot policy — energies are the
    # primary observable and the [*, 1] products cost nothing extra.
    """Fused readout: the per-edge readout MLP and the edges→atoms energy
    scatter run as one kernel (the hidden activation and the per-edge energy
    never exist in HBM) — the reference chain FieldMLP('edge_energy') →
    EdgewiseReduce (``allegro/model/allegro_models.py:238-248``), kernelized.
    Inference scope: weight cotangents are NaN by design (train with the
    XLA readout, whose math is identical)."""
    eA, eB = fused_tp.readout_sum_call(
        pieces, w0, w1, offs, win, eb=eb, n_rank_rows=n_rank_rows,
        n_hidden=n_hidden, mlp_passes=mlp_passes, passes=3, wr=wr,
    )
    combined = fused_tp.combine_scatter_outputs(eA, eB, win, wr or eb)
    return combined[:n_atoms]


def _rsi_fwd(pieces, w0, w1, offs, win, eb, n_rank_rows, n_atoms, n_hidden,
             mlp_passes=6, wr=None):
    out = readout_sum_infer(pieces, w0, w1, offs, win, eb, n_rank_rows,
                            n_atoms, n_hidden, mlp_passes, wr)
    return out, (pieces, w0, w1, offs, win)


def _rsi_bwd(eb, n_rank_rows, n_atoms, n_hidden, mlp_passes, wr, res, g):
    pieces, w0, w1, offs, win = res
    y_ct = jnp.zeros((n_rank_rows, 1), fused_tp.compute_dtype(g.dtype))
    y_ct = y_ct.at[:n_atoms].set(g.astype(y_ct.dtype))
    dpieces = fused_tp.readout_bwd_call(
        pieces, w0, w1, y_ct, offs, win, eb=eb, n_hidden=n_hidden,
        mlp_passes=mlp_passes, passes=3, wr=wr,
    )
    dpieces = tuple(_cast_ct(dp, _Aval(p)) for dp, p in zip(dpieces, pieces))
    dw0 = jnp.full(w0.shape, jnp.nan, fused_tp.compute_dtype(w0.dtype))
    dw1 = None if w1 is None else jnp.full(
        w1.shape, jnp.nan, fused_tp.compute_dtype(w1.dtype)
    )
    return (dpieces, dw0, dw1, _f0_like(offs), _f0_like(win))


readout_sum_infer.defvjp(_rsi_fwd, _rsi_bwd)
