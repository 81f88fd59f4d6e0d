"""The fused CG tensor product as true JAX primitives — the TRAINABLE kernel
backend (role of the reference's cuEquivariance backend, which supports
training AND inference, ``docs/guide/accelerations.rst`` feature table).

``jax.custom_vjp`` forbids reverse-over-reverse, but force training needs
∂/∂θ of a force loss — second-order AD through the kernels. The TP
``out[k] = Σ c·w[p]·a[i]·b[j]`` is TRILINEAR, so its derivative family closes
under differentiation: every JVP term and every transpose is again a TP with
permuted entry roles (or the triple-product weight reduction). Registering
the ops as primitives with

- an abstract eval + Pallas lowering,
- a JVP rule (sum of three permuted TPs — linear in each tangent),
- a transpose rule per linear operand (permuted TP / weight reduction),
- a batching rule (batch folds into the row axis; per-batch weights unroll),

gives arbitrary-order AD for free. The kernels themselves are those of
``pallas_contract``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import core
from jax.interpreters import ad, batching, mlir

from .pallas_contract import (
    _run_gradw,
    _run_tp,
    _swap_a_out,
    _swap_b_out,
    sparse_entries,
)

try:  # jax>=0.5 moved Primitive
    Primitive = core.Primitive
except AttributeError:  # pragma: no cover
    from jax.extend.core import Primitive  # type: ignore


def _sorted(entries):
    return tuple(sorted(entries, key=lambda e: (e[0], e[1], e[2])))


def _perm_gradw_a(entries):
    """(i,j,k,p,c) -> output indexed by i with inputs (b→j, g→k)."""
    return _sorted((j, k, i, p, c) for (i, j, k, p, c) in entries)


def _perm_gradw_b(entries):
    return _sorted((i, k, j, p, c) for (i, j, k, p, c) in entries)


# --- tp primitive: out[k,r,l] = sum c w[p,l] a[i,r,l] b[j,r,l] ---

tp_p = Primitive("allegro_tp")


def tp(a, b, w, *, entries, dims: Tuple[int, int, int], block: int = 64):
    return tp_p.bind(a, b, w, entries=entries, io_dims=dims, block=block)


@tp_p.def_abstract_eval
def _tp_abstract(a, b, w, *, entries, io_dims, block):
    return core.ShapedArray((io_dims[2], a.shape[1], a.shape[2]), a.dtype)


def _tp_impl(a, b, w, *, entries, io_dims, block):
    return _run_tp(a, b, w, entries, io_dims[2], block)


tp_p.def_impl(lambda *args, **kw: _tp_impl(*args, **kw))
mlir.register_lowering(tp_p, mlir.lower_fun(_tp_impl, multiple_results=False))


def _tp_jvp(primals, tangents, *, entries, io_dims, block):
    a, b, w = primals
    da, db, dw = tangents
    out = tp(a, b, w, entries=entries, dims=io_dims, block=block)
    parts = []
    if type(da) is not ad.Zero:
        parts.append(tp(da, b, w, entries=entries, dims=io_dims, block=block))
    if type(db) is not ad.Zero:
        parts.append(tp(a, db, w, entries=entries, dims=io_dims, block=block))
    if type(dw) is not ad.Zero:
        parts.append(tp(a, b, dw, entries=entries, dims=io_dims, block=block))
    if not parts:
        t = ad.Zero(core.get_aval(out).to_tangent_aval())
    else:
        t = parts[0]
        for p_ in parts[1:]:
            t = t + p_
    return out, t


ad.primitive_jvps[tp_p] = _tp_jvp


def _tp_transpose(ct, a, b, w, *, entries, io_dims, block):
    """Exactly one operand is linear (undefined) in a transposition pass."""
    d_a, d_b, d_out = io_dims
    if type(ct) is ad.Zero:
        z = ad.Zero
        return (
            ad.Zero(a.aval) if ad.is_undefined_primal(a) else None,
            ad.Zero(b.aval) if ad.is_undefined_primal(b) else None,
            ad.Zero(w.aval) if ad.is_undefined_primal(w) else None,
        )
    if ad.is_undefined_primal(a):
        ga = tp(ct, b, w, entries=_swap_a_out(entries), dims=(d_out, d_b, d_a), block=block)
        return ga, None, None
    if ad.is_undefined_primal(b):
        gb = tp(a, ct, w, entries=_swap_b_out(entries), dims=(d_a, d_out, d_b), block=block)
        return None, gb, None
    assert ad.is_undefined_primal(w)
    gw = tp_gradw(a, b, ct, entries=entries, dims=io_dims, block=block)
    return None, None, gw


ad.primitive_transposes[tp_p] = _tp_transpose


# --- gradw primitive: gw[p,l] = sum_r c a[i,r,l] b[j,r,l] g[k,r,l] ---

gradw_p = Primitive("allegro_tp_gradw")


def tp_gradw(a, b, g, *, entries, dims: Tuple[int, int, int], block: int = 64):
    return gradw_p.bind(a, b, g, entries=entries, io_dims=dims, block=block)


@gradw_p.def_abstract_eval
def _gradw_abstract(a, b, g, *, entries, io_dims, block):
    n_paths = 1 + max(e[3] for e in entries)
    return core.ShapedArray((n_paths, a.shape[2]), a.dtype)


def _gradw_impl(a, b, g, *, entries, io_dims, block):
    n_paths = 1 + max(e[3] for e in entries)
    return _run_gradw(a, b, g, n_paths, entries, block)


gradw_p.def_impl(lambda *args, **kw: _gradw_impl(*args, **kw))
mlir.register_lowering(gradw_p, mlir.lower_fun(_gradw_impl, multiple_results=False))


def _gradw_jvp(primals, tangents, *, entries, io_dims, block):
    a, b, g = primals
    da, db, dg = tangents
    out = tp_gradw(a, b, g, entries=entries, dims=io_dims, block=block)
    parts = []
    if type(da) is not ad.Zero:
        parts.append(tp_gradw(da, b, g, entries=entries, dims=io_dims, block=block))
    if type(db) is not ad.Zero:
        parts.append(tp_gradw(a, db, g, entries=entries, dims=io_dims, block=block))
    if type(dg) is not ad.Zero:
        parts.append(tp_gradw(a, b, dg, entries=entries, dims=io_dims, block=block))
    if not parts:
        t = ad.Zero(core.get_aval(out).to_tangent_aval())
    else:
        t = parts[0]
        for p_ in parts[1:]:
            t = t + p_
    return out, t


ad.primitive_jvps[gradw_p] = _gradw_jvp


def _gradw_transpose(ct, a, b, g, *, entries, io_dims, block):
    """gw[p,l] = Σ_r c a_i b_j g_k — cotangent t[P, l] flows back as a TP
    with t in the weight slot and the remaining two arrays as inputs."""
    d_a, d_b, d_out = io_dims
    if ad.is_undefined_primal(a):
        ga = tp(b, g, ct, entries=_perm_gradw_a(entries), dims=(d_b, d_out, d_a), block=block)
        return ga, None, None
    if ad.is_undefined_primal(b):
        gb = tp(a, g, ct, entries=_perm_gradw_b(entries), dims=(d_a, d_out, d_b), block=block)
        return None, gb, None
    assert ad.is_undefined_primal(g)
    gg = tp(a, b, ct, entries=entries, dims=io_dims, block=block)
    return None, None, gg


ad.primitive_transposes[gradw_p] = _gradw_transpose


# --- batching (vmap): fold batch into rows; batched weights unroll ---


def _move_batch_to_rows(x, bdim):
    """[..., B at bdim, ...] of [d, R, L] → [d, B*R, L]."""
    x = jnp.moveaxis(x, bdim, 1)  # [d, B, R, L]
    d, B, R, L = x.shape
    return x.reshape(d, B * R, L), B, R


def _tp_batch(args, bdims, *, entries, io_dims, block):
    a, b, w = args
    ba, bb, bw = bdims
    if bw is not None:
        # per-batch weights: fall back to a lax.map over the batch
        B = (a.shape[ba] if ba is not None else b.shape[bb] if bb is not None else w.shape[bw])

        def one(args1):
            a1, b1, w1 = args1
            return tp(a1, b1, w1, entries=entries, dims=io_dims, block=block)

        a_ = jnp.moveaxis(a, ba, 0) if ba is not None else jnp.broadcast_to(a, (B,) + a.shape)
        b_ = jnp.moveaxis(b, bb, 0) if bb is not None else jnp.broadcast_to(b, (B,) + b.shape)
        w_ = jnp.moveaxis(w, bw, 0)
        return jax.lax.map(one, (a_, b_, w_)), 0
    # shared weights: batch rides the row axis
    B = a.shape[ba] if ba is not None else b.shape[bb]
    if ba is None:
        a = jnp.broadcast_to(a[:, None], (a.shape[0], B) + a.shape[1:])
        ba = 1
    if bb is None:
        b = jnp.broadcast_to(b[:, None], (b.shape[0], B) + b.shape[1:])
        bb = 1
    a2, B, R = _move_batch_to_rows(a, ba)
    b2, _, _ = _move_batch_to_rows(b, bb)
    out = tp(a2, b2, w, entries=entries, dims=io_dims, block=block)
    out = out.reshape(io_dims[2], B, R, out.shape[-1])
    return out, 1


batching.primitive_batchers[tp_p] = _tp_batch


def _gradw_batch(args, bdims, *, entries, io_dims, block):
    a, b, g = args

    def one(args1):
        a1, b1, g1 = args1
        return tp_gradw(a1, b1, g1, entries=entries, dims=io_dims, block=block)

    B = next(x.shape[d] for x, d in zip(args, bdims) if d is not None)
    moved = []
    for x, d in zip(args, bdims):
        if d is None:
            moved.append(jnp.broadcast_to(x, (B,) + x.shape))
        else:
            moved.append(jnp.moveaxis(x, d, 0))
    return jax.lax.map(one, tuple(moved)), 0


batching.primitive_batchers[gradw_p] = _gradw_batch
