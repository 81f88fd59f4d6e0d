"""Narrow-window (wr < eb) plan consistency: every kernel of the fused family
must produce identical results under a wr=eb plan and a narrow wr=eb/2 plan
(same math, different window blocking — the wr=64 fast path halves the MXU
cost of every one-hot window product at the production eb=128).

Interpret mode on CPU; the silicon verdict (eb=512/wr=64, 1.42x) is the
wired flagship default, recorded in the driver bench JSON."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import allegro_tpu.ops.fused_tp as ft

pytestmark = pytest.mark.slow


@pytest.fixture(autouse=True)
def _interpret_mode():
    ft.INTERPRET = True
    yield
    ft.INTERPRET = False


EB = 16
WR = 8
N_ATOMS = 37
U = 8
D1, D2, D3 = 3, 3, 4
N_IRR = 2
DIM_TO_IRR = (0, 0, 1)
ENTRIES = ((0, 0, 0, 0, 1.0), (1, 1, 1, 1, 0.5), (2, 2, 2, 2, 0.25),
           (1, 2, 3, 3, 0.7))


@pytest.fixture(scope="module")
def plans():
    rng = np.random.RandomState(0)
    centers = np.sort(rng.randint(0, N_ATOMS, size=150)).astype(np.int32)
    out = {}
    for wr in (EB, WR):
        win, offs, Ep = ft.make_block_plan_np(centers, EB, N_ATOMS, wr=wr)
        out[wr] = dict(
            win=jnp.asarray(win), offs=jnp.asarray(offs),
            nr=ft.num_rank_rows(N_ATOMS, wr), wr=wr,
        )
    out["Ep"] = Ep
    out["rng"] = np.random.RandomState(1)
    return out


def _both(plans, fn):
    """Run fn(plan) for wr=eb and wr=eb/2, assert allclose, return the pair.

    Tolerance: the two plans group f32 window partial sums differently
    (one concatenated product vs an A+B pair), so equality is to f32
    accumulation rounding, not bitwise."""
    a = fn(plans[EB])
    b = fn(plans[WR])
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-5, atol=1e-5)
    return a, b


def _env_pair(plans, p, sh, wexp):
    return ft.env_scatter_call(
        sh, wexp, p["offs"], p["win"], dim_to_irr=DIM_TO_IRR, U=U, eb=EB,
        n_rank_rows=p["nr"], wr=p["wr"],
    )


def test_scatter_gather_roundtrip(plans):
    rng = plans["rng"]
    Ep = plans["Ep"]
    x = jnp.asarray(rng.randn(Ep, D1 * U), jnp.float32)
    g = jnp.asarray(rng.randn(Ep, D3 * U), jnp.float32)
    w = jnp.asarray(rng.randn(4, U), jnp.float32)

    def run(p):
        dA, dB = ft.tp_scatter_call(
            x, g, w, p["offs"], p["win"], entries=ENTRIES, dims=(D1, D2, D3),
            U=U, eb=EB, n_rank_rows=p["nr"], wr=p["wr"],
        )
        env = ft.combine_scatter_outputs(dA, dB, p["win"], p["wr"])
        out = ft.gather_tp_raw_call(
            x, dA, dB, w, p["offs"], p["win"], entries=ENTRIES,
            dims=(D1, D2, D3), U=U, eb=EB, wr=p["wr"], split_scalars=True,
        )
        gt = ft.gather_tp_call(
            x, env, env, w, p["offs"], p["win"], entries=ENTRIES,
            dims=(D1, D2, D3), U=U, eb=EB, wr=p["wr"],
        )
        return env[: N_ATOMS], out[0], out[1], gt

    _both(plans, run)


def test_env_and_unweight(plans):
    rng = plans["rng"]
    Ep = plans["Ep"]
    sh = jnp.asarray(rng.randn(Ep, D2), jnp.float32)
    wexp = jnp.asarray(rng.randn(Ep, N_IRR * U), jnp.float32)

    def run(p):
        eA, eB = _env_pair(plans, p, sh, wexp)
        dsh, dwexp = ft.unweight_both_raw_call(
            eA, eB, sh, wexp, p["offs"], p["win"], dim_to_irr=DIM_TO_IRR,
            U=U, eb=EB, wr=p["wr"],
        )
        env = ft.combine_scatter_outputs(eA, eB, p["win"], p["wr"])
        dsh2, dwexp2 = ft.unweight_both_call(
            env, env, sh, wexp, p["offs"], p["win"], dim_to_irr=DIM_TO_IRR,
            U=U, eb=EB, wr=p["wr"],
        )
        dsh3 = ft.gather_unweight_sh_call(
            env, env, wexp, p["offs"], p["win"], dim_to_irr=DIM_TO_IRR,
            U=U, eb=EB, wr=p["wr"],
        )
        dw3 = ft.gather_unweight_w_call(
            env, env, sh, p["offs"], p["win"], dim_to_irr=DIM_TO_IRR,
            U=U, eb=EB, wr=p["wr"],
        )
        return env[: N_ATOMS], dsh, dwexp, dsh2, dwexp2, dsh3, dw3

    _both(plans, run)


def test_bwd_fused_and_dw(plans):
    rng = plans["rng"]
    Ep = plans["Ep"]
    x = jnp.asarray(rng.randn(Ep, D1 * U), jnp.float32)
    g = jnp.asarray(rng.randn(Ep, D3 * U), jnp.float32)
    gts = jnp.asarray(rng.randn(Ep, U), jnp.float32)
    sh = jnp.asarray(rng.randn(Ep, D2), jnp.float32)
    wexp = jnp.asarray(rng.randn(Ep, N_IRR * U), jnp.float32)
    w = jnp.asarray(rng.randn(4, U), jnp.float32)

    def run(p):
        eA, eB = _env_pair(plans, p, sh, wexp)
        dx, dA, dB = ft.bwd_fused_raw_call(
            x, g, eA, eB, w, p["offs"], p["win"], entries=ENTRIES,
            dims=(D1, D2, D3), U=U, eb=EB, n_rank_rows=p["nr"], wr=p["wr"],
            gts=gts,
        )
        env = ft.combine_scatter_outputs(eA, eB, p["win"], p["wr"])
        dx2, dA2, dB2, dw2 = ft.bwd_fused_call(
            x, g, env, env, w, p["offs"], p["win"], entries=ENTRIES,
            dims=(D1, D2, D3), U=U, eb=EB, n_rank_rows=p["nr"], wr=p["wr"],
        )
        dw = ft.gather_dw_call(
            x, env, env, g, p["offs"], p["win"], entries=ENTRIES,
            dims=(D1, D2, D3), U=U, eb=EB, wr=p["wr"],
        )
        denv = ft.combine_scatter_outputs(dA, dB, p["win"], p["wr"])
        denv2 = ft.combine_scatter_outputs(dA2, dB2, p["win"], p["wr"])
        return dx, denv[: N_ATOMS], dx2, denv2[: N_ATOMS], dw2, dw

    _both(plans, run)


def test_embed_fused(plans):
    rng = plans["rng"]
    Ep = plans["Ep"]
    D_SH = D2
    row_specs = ((0, 0), (1, 0), (2, 1))
    sh = jnp.asarray(rng.randn(Ep, D_SH), jnp.float32)
    w2b = jnp.asarray(rng.randn(Ep, N_IRR * U), jnp.float32)
    g = jnp.asarray(rng.randn(Ep, D3 * U), jnp.float32)
    wexp = jnp.asarray(rng.randn(Ep, N_IRR * U), jnp.float32)
    w = jnp.asarray(rng.randn(4, U), jnp.float32)

    def run(p):
        eA, eB = _env_pair(plans, p, sh, wexp)
        out = ft.gather_tp_embed_raw_call(
            sh, w2b, eA, eB, w, p["offs"], p["win"], entries=ENTRIES,
            dims=(D1, D2, D3), U=U, eb=EB, row_specs=row_specs, wr=p["wr"],
            split_scalars=True,
        )
        dsh, dw2b, dA, dB = ft.bwd_embed_raw_call(
            sh, w2b, g, eA, eB, w, p["offs"], p["win"], entries=ENTRIES,
            dims=(D1, D2, D3), U=U, eb=EB, n_rank_rows=p["nr"],
            row_specs=row_specs, wr=p["wr"],
        )
        denv = ft.combine_scatter_outputs(dA, dB, p["win"], p["wr"])
        return out[0], out[1], dsh, dw2b, denv[: N_ATOMS]

    _both(plans, run)


def test_center_ops(plans):
    rng = plans["rng"]
    Ep = plans["Ep"]
    vT = jnp.asarray(rng.randn(8, Ep), jnp.float32)

    def run(p):
        sA, sB = ft.center_sum_call(
            vT, p["offs"], p["win"], eb=EB, n_rank_rows=p["nr"], wr=p["wr"]
        )
        s = ft.combine_scatter_cols(sA, sB, p["win"], p["wr"])
        out = ft.center_broadcast_call(
            s, p["offs"], p["win"], eb=EB, Ep=Ep, wr=p["wr"]
        )
        return s[:, : N_ATOMS], out

    _both(plans, run)


def test_mega_and_readout(plans):
    rng = plans["rng"]
    Ep = plans["Ep"]
    S, H = 16, 16
    sh = jnp.asarray(rng.randn(Ep, D2), jnp.float32)
    p0 = jnp.asarray(rng.randn(Ep, S), jnp.float32)
    p1 = jnp.asarray(rng.randn(Ep, U), jnp.float32)
    w0 = jnp.asarray(rng.randn(S + U, H) * 0.3, jnp.float32)
    w1 = jnp.asarray(rng.randn(H, S + N_IRR * U) * 0.3, jnp.float32)
    g_lat = jnp.asarray(rng.randn(Ep, S), jnp.float32)
    r0 = jnp.asarray(rng.randn(S + U, H) * 0.3, jnp.float32)
    r1 = jnp.asarray(rng.randn(H, 1) * 0.3, jnp.float32)

    def run(p):
        lat, mA, mB = ft.latent_env_scatter_call(
            (p0, p1), sh, w0, w1, p["offs"], p["win"], dim_to_irr=DIM_TO_IRR,
            U=U, eb=EB, n_rank_rows=p["nr"], S=S, n_hidden=1, wr=p["wr"],
        )
        dsh, dpieces = ft.latent_env_bwd_call(
            (p0, p1), sh, w0, w1, mA, mB, g_lat, p["offs"], p["win"],
            dim_to_irr=DIM_TO_IRR, U=U, eb=EB, S=S, n_hidden=1, wr=p["wr"],
        )
        env = ft.combine_scatter_outputs(mA, mB, p["win"], p["wr"])
        rA, rB = ft.readout_sum_call(
            (p0, p1), r0, r1, p["offs"], p["win"], eb=EB, n_rank_rows=p["nr"],
            n_hidden=1, wr=p["wr"],
        )
        e = ft.combine_scatter_outputs(rA, rB, p["win"], p["wr"])
        y_ct = jnp.ones((p["nr"], 1), jnp.float32)
        dp = ft.readout_bwd_call(
            (p0, p1), r0, r1, y_ct, p["offs"], p["win"], eb=EB, n_hidden=1,
            wr=p["wr"],
        )
        return (lat, env[: N_ATOMS], dsh, *dpieces, e[: N_ATOMS], *dp)

    _both(plans, run)


def test_model_window_rows_equivalence():
    """Full force call: a model built with window_rows=eb/2 (narrow plan
    armed via precompute_statics → data[FUSED_WR]) matches the classic-plan
    model to f32 accumulation rounding."""
    from allegro_tpu.data import batch_frames, keys, to_jax
    from allegro_tpu.data.neighborlist import neighbor_list
    from allegro_tpu.model import AllegroModel

    rng = np.random.RandomState(3)
    n_atoms = 12
    pos = rng.randn(n_atoms, 3) * 1.2
    frame = {
        keys.POSITIONS: pos,
        keys.ATOM_TYPES: rng.randint(0, 3, n_atoms).astype(np.int32),
    }
    fr = neighbor_list(frame, 2.5)
    b = batch_frames([fr], n_atoms=n_atoms + 2, n_frames=1, edge_multiple=16)
    data = to_jax(b, dtype=np.float64)

    kw = dict(
        r_max=2.5, type_names=["A", "B", "C"], l_max=2, parity=True,
        num_layers=2, num_scalar_features=16, num_tensor_features=4,
        scalar_embed_mlp_hidden_layers_width=16,
        allegro_mlp_hidden_layers_width=16,
        readout_mlp_hidden_layers_width=16,
        avg_num_neighbors=6.0, model_dtype="float64",
        tp_kernel_backend="fused_infer", fused_block_edges=EB,
    )
    m_classic = AllegroModel(**kw)
    m_narrow = AllegroModel(**kw, window_rows=WR)
    d_classic = m_classic.precompute_statics(data)
    d_narrow = m_narrow.precompute_statics(data)
    assert keys.FUSED_WR in d_narrow, "narrow plan should validate here"
    assert d_narrow[keys.FUSED_WR].shape == (WR,)
    assert keys.FUSED_WR not in d_classic
    params = m_classic.init(0, d_classic)
    out_c = m_classic.apply_with_derivatives(params, d_classic)
    out_n = m_narrow.apply_with_derivatives(params, d_narrow)
    np.testing.assert_allclose(
        np.asarray(out_c[keys.TOTAL_ENERGY]),
        np.asarray(out_n[keys.TOTAL_ENERGY]), rtol=1e-9, atol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(out_c[keys.FORCES]), np.asarray(out_n[keys.FORCES]),
        rtol=1e-8, atol=1e-9,
    )


def test_validator_rejects_sparse_plans():
    # 2 edges per atom: a 16-edge block spans ~8 ranks starting anywhere in
    # [0, wr) — fine at wr=8 only if every block's span fits 2*wr and win is
    # contiguous; ONE edge per atom must violate the narrow-window bound.
    centers = np.arange(200, dtype=np.int32)  # 1 edge per atom: span = eb
    with pytest.raises(ValueError):
        ft.make_block_plan_np(centers, EB, 256, wr=4)
