"""Fused env+TP primitive family: forward, first- and second-order AD vs an
einsum/segment-sum oracle (interpret mode, CPU).

The oracle mirrors the reference Contracter semantics
(``allegro/nn/_strided/_contract.py:185-251``): scatter edges→atoms, gather
back, sparse-CG contract. Here atoms are rank-space rows (dense renumbering of
atoms-with-edges) — identical math, different row indexing.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from allegro_tpu.lib.irreps import Irreps
from allegro_tpu.nn.allegro import compute_irreps_ladder
from allegro_tpu.nn.contract import enumerate_instructions, pack_w3j
from allegro_tpu.ops import fused_primitives as fp
from allegro_tpu.ops import fused_tp
from allegro_tpu.ops.pallas_contract import sparse_entries

pytestmark = pytest.mark.slow

EB = 128
U = 8
N_ATOMS = 40
E_REAL = 300


@pytest.fixture(scope="module", autouse=True)
def _interpret():
    old = fused_tp.INTERPRET
    fused_tp.INTERPRET = True
    yield
    fused_tp.INTERPRET = old


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(1)
    irreps_sh = Irreps("1x0e+1x1o+1x2e")
    allowed = Irreps("1x0e+1x0o+1x1e+1x1o+1x2e+1x2o")
    ladder = compute_irreps_ladder(irreps_sh, allowed, 2)
    ins = enumerate_instructions(ladder[0], irreps_sh, ladder[1])
    w3j = pack_w3j(ladder[0], irreps_sh, ladder[1], ins)
    entries = sparse_entries(w3j)
    P, d1, d2, d3 = w3j.shape
    dims = (d1, d2, d3)
    n_irr = len(irreps_sh)
    dim_to_irr = []
    for k, sl in enumerate(irreps_sh.slices()):
        dim_to_irr.extend([k] * (sl.stop - sl.start))
    dim_to_irr = tuple(dim_to_irr)

    # centers with gaps (edge-less atoms) + sentinel padding, sorted
    centers_real = np.sort(rng.choice(np.arange(0, N_ATOMS, 2), size=E_REAL))
    Ep = -(-E_REAL // EB) * EB
    centers = np.concatenate([centers_real, np.full(Ep - E_REAL, N_ATOMS)]).astype(
        np.int32
    )
    Nr = fused_tp.num_rank_rows(N_ATOMS, EB)
    cj = jnp.asarray(centers)
    win, offs = fused_tp.make_block_plan(cj, EB)

    neq = centers[1:] != centers[:-1]
    ranks = jnp.asarray(np.concatenate([[0], np.cumsum(neq)]).astype(np.int32))

    def mkarr(*shape):
        a = rng.randn(*shape).astype(np.float64)
        a[E_REAL:] = 0.0
        return jnp.asarray(a)

    x = mkarr(Ep, d1 * U)
    sh = mkarr(Ep, d2)
    wexp = mkarr(Ep, n_irr * U)
    w = jnp.asarray(rng.randn(P, U))

    kw = dict(entries=entries, dims=dims, U=U, eb=EB)
    ekw = dict(dim_to_irr=dim_to_irr, U=U, eb=EB, n_rank_rows=Nr)

    def fused(x, sh, wexp, w):
        return fp.fused_layer(
            x, sh, wexp, w, offs, win, entries=entries, dims=dims, U=U, eb=EB,
            dim_to_irr=dim_to_irr, n_rank_rows=Nr,
        )

    def oracle(x, sh, wexp, w):
        # env build: weighted SH scattered to rank rows
        vals_cols = []
        for j in range(d2):
            irr = dim_to_irr[j]
            vals_cols.append(sh[:, j : j + 1] * wexp[:, irr * U : (irr + 1) * U])
        vals = jnp.concatenate(vals_cols, axis=1)  # [Ep, d2*U]
        env = jax.ops.segment_sum(vals, ranks, num_segments=Nr)
        env_e = jnp.take(env, ranks, axis=0)
        out = jnp.zeros((x.shape[0], d3 * U), x.dtype)
        for i, j, k, p, c in entries:
            out = out.at[:, k * U : (k + 1) * U].add(
                c
                * w[p][None, :]
                * x[:, i * U : (i + 1) * U]
                * env_e[:, j * U : (j + 1) * U]
            )
        # padded rows: x is zero there, so out is zero — match kernel exactly
        return out

    return dict(
        fused=fused, oracle=oracle, x=x, sh=sh, wexp=wexp, w=w, Ep=Ep, kw=kw,
        ekw=ekw, offs=offs, win=win,
    )


def test_forward_matches_oracle(setup):
    got = setup["fused"](setup["x"], setup["sh"], setup["wexp"], setup["w"])
    want = setup["oracle"](setup["x"], setup["sh"], setup["wexp"], setup["w"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-10)


def test_first_order_grads(setup):
    args = (setup["x"], setup["sh"], setup["wexp"], setup["w"])

    def loss(f):
        def g(*a):
            out = f(*a)
            return jnp.sum(out * out) + jnp.sum(out[:, :U] ** 3)

        return g

    got = jax.grad(loss(setup["fused"]), argnums=(0, 1, 2, 3))(*args)
    want = jax.grad(loss(setup["oracle"]), argnums=(0, 1, 2, 3))(*args)
    for g1, g2, name in zip(got, want, ("x", "sh", "wexp", "w")):
        np.testing.assert_allclose(
            np.asarray(g1), np.asarray(g2), atol=1e-9, err_msg=f"grad wrt {name}"
        )


def test_second_order_force_style(setup):
    """∂/∂w of a loss on ∂out/∂sh — the force-training pattern (reverse over
    reverse), exercising the transpose-of-transpose closure."""
    x, sh, wexp, w = setup["x"], setup["sh"], setup["wexp"], setup["w"]

    def force_loss(f):
        def fl(w_):
            def e(sh_):
                out = f(x, sh_, wexp, w_)
                return jnp.sum(out * out)

            frc = jax.grad(e)(sh)
            return jnp.sum(frc * frc)

        return fl

    got = jax.grad(force_loss(setup["fused"]))(w)
    want = jax.grad(force_loss(setup["oracle"]))(w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-9, atol=1e-9)


def test_jvp_matches(setup):
    args = (setup["x"], setup["sh"], setup["wexp"], setup["w"])
    tangents = jax.tree.map(lambda a: jnp.ones_like(a) * 0.7, args)
    o1, t1 = jax.jvp(setup["fused"], args, tangents)
    o2, t2 = jax.jvp(setup["oracle"], args, tangents)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-10)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), atol=1e-9)


def test_onehot_passes_kwarg_controls_split(setup):
    """Per-call ``passes`` beats the module default: the reduced 2-pass
    gather must diverge from the exact 3-pass result, and an explicit
    passes=3 must be exact even when the process default says 2 (the
    serialized ``onehot_passes`` model field rides this kwarg)."""
    f32 = lambda a: a.astype(jnp.float32)  # the split only applies to f32
    x, sh, wexp, w = map(f32, (setup["x"], setup["sh"], setup["wexp"], setup["w"]))
    kw, ekw = setup["kw"], setup["ekw"]
    offs, win = setup["offs"], setup["win"]
    import allegro_tpu.ops.fused_tp as ft

    eA, eB = ft.env_scatter_call(sh, wexp, offs, win, **ekw)
    env = ft.combine_scatter_outputs(eA, eB, win, EB)
    exact = ft.gather_tp_call(x, env, env, w, offs, win, passes=3, **kw)
    reduced = ft.gather_tp_call(x, env, env, w, offs, win, passes=2, **kw)
    old = ft.ONEHOT_PASSES
    ft.ONEHOT_PASSES = 2
    try:
        pinned = ft.gather_tp_call(x, env, env, w, offs, win, passes=3, **kw)
    finally:
        ft.ONEHOT_PASSES = old
    np.testing.assert_allclose(np.asarray(pinned), np.asarray(exact), atol=0)
    dev = float(np.abs(np.asarray(reduced) - np.asarray(exact)).max())
    scale = float(np.abs(np.asarray(exact)).max())
    assert 0 < dev / scale < 1e-4, f"2-pass rel dev {dev / scale:.2e}"
