"""Profile the fused env+TP kernel pipeline vs the round-1 paths, real chip.

Per-layer dataflow compared at flagship bench scale (default 4096 atoms,
~103k edges, U=32, layer-0 dims (9,9,9), P=11):

  old (round-1 pallas): env_weighter -> segment_sum+take -> pack -> packed TP
  fused               : env_scatter -> combine -> gather_tp   (no [E,U,d] env!)

Usage: python scripts/profile_fused.py [n_atoms] [eb]
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
from allegro_tpu.ops import fused_tp
from allegro_tpu.ops.pallas_contract import (
    PallasTPBackend,
    pack_edge_major,
    sparse_entries,
)

N_ATOMS = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
EB = int(sys.argv[2]) if len(sys.argv) > 2 else 256
U = 32
AVG_NEIGH = 25.3
E = int(N_ATOMS * AVG_NEIGH)
Ep = -(-E // EB) * EB
ITERS = 30


def device_time(name, fn, *args, iters=ITERS):
    """ms per iteration, chained on-device in one dispatch (see profile_tp)."""

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

    s = loop(jnp.float32(0.0), args)
    jax.block_until_ready(s)
    best = float("inf")
    for trial in (1.0, 2.0, 3.0):
        t0 = time.perf_counter()
        s = loop(jnp.float32(trial * 1e-9), args)
        jax.block_until_ready(s)
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    print(f"{name:52s} {best:8.3f} ms")
    return best


def main():
    print(f"device={jax.devices()[0]}  N={N_ATOMS} E={E} Ep={Ep} EB={EB} U={U}")
    irreps_sh = Irreps("1x0e+1x1o+1x2e")
    allowed = Irreps("1x0e+1x0o+1x1e+1x1o+1x2e+1x2o")
    ladder = compute_irreps_ladder(irreps_sh, allowed, 2)
    ins = enumerate_instructions(ladder[0], irreps_sh, ladder[1])
    w3j = pack_w3j(ladder[0], irreps_sh, ladder[1], ins)
    entries = sparse_entries(w3j)
    P, d1, d2, d3 = w3j.shape
    dims = (d1, d2, d3)
    n_irr = len(irreps_sh)
    print(f"layer0: P={P} dims={dims} nnz={len(entries)}")

    rng = np.random.RandomState(0)
    centers_np = np.sort(rng.randint(0, N_ATOMS, E))
    centers = jnp.asarray(
        np.concatenate([centers_np, np.full(Ep - E, N_ATOMS)]).astype(np.int32)
    )
    Na = fused_tp.num_rank_rows(N_ATOMS, EB)

    x_flat = jnp.asarray(rng.randn(Ep, d1 * U), jnp.float32)
    g_flat = jnp.asarray(rng.randn(Ep, d3 * U), jnp.float32)
    sh = jnp.asarray(rng.randn(Ep, d2), jnp.float32)
    wexp = jnp.asarray(rng.randn(Ep, n_irr * U), jnp.float32)
    wmat = jnp.asarray(rng.randn(P, U), jnp.float32)

    dim_to_irr = []
    for k_, sl in enumerate(irreps_sh.slices()):
        dim_to_irr.extend([k_] * (sl.stop - sl.start))
    dim_to_irr = tuple(dim_to_irr)

    # --- block plan ---
    def plan(c):
        return fused_tp.make_block_plan(c, EB)

    win, offs_p = plan(centers)
    device_time("block plan (cumsum etc.)", plan, centers)

    # --- fused forward: env_scatter + combine + gather_tp ---
    def fused_fwd(sh, wexp, x):
        eA, eB_ = fused_tp.env_scatter_call(
            sh, wexp, offs_p, win, dim_to_irr=dim_to_irr, U=U, eb=EB, n_rank_rows=Na
        )
        env = fused_tp.combine_scatter_outputs(eA, eB_, win, EB)
        return fused_tp.gather_tp_call(
            x, env, env, wmat, offs_p, win, entries=entries, dims=dims, U=U, eb=EB
        )

    device_time("FUSED fwd (env_scatter+combine+gather_tp)", fused_fwd, sh, wexp, x_flat)

    # pieces
    def piece_env(sh, wexp):
        eA, eB_ = fused_tp.env_scatter_call(
            sh, wexp, offs_p, win, dim_to_irr=dim_to_irr, U=U, eb=EB, n_rank_rows=Na
        )
        return fused_tp.combine_scatter_outputs(eA, eB_, win, EB)

    env = piece_env(sh, wexp)
    device_time("  env_scatter+combine", piece_env, sh, wexp)
    device_time(
        "  gather_tp",
        lambda x, env: fused_tp.gather_tp_call(
            x, env, env, wmat, offs_p, win, entries=entries, dims=dims, U=U, eb=EB
        ),
        x_flat,
        env,
    )

    # --- fused backward pieces ---
    swapped = tuple((k, j, i, p, c) for (i, j, k, p, c) in entries)
    device_time(
        "  bwd dx (gather_tp swapped)",
        lambda g, env: fused_tp.gather_tp_call(
            g, env, env, wmat, offs_p, win, entries=swapped, dims=(d3, d2, d1), U=U, eb=EB
        ),
        g_flat,
        env,
    )

    def bwd_denv(x, g):
        dA, dB = fused_tp.tp_scatter_call(
            x, g, wmat, offs_p, win, entries=entries, dims=dims, U=U, eb=EB, n_rank_rows=Na
        )
        return fused_tp.combine_scatter_outputs(dA, dB, win, EB)

    denv = bwd_denv(x_flat, g_flat)
    device_time("  bwd denv (tp_scatter+combine)", bwd_denv, x_flat, g_flat)
    device_time(
        "  bwd dw (gather_dw)",
        lambda x, g, env: fused_tp.gather_dw_call(
            x, env, env, g, offs_p, win, entries=entries, dims=dims, U=U, eb=EB
        ),
        x_flat,
        g_flat,
        env,
    )
    device_time(
        "  bwd dsh (gather_unweight_sh)",
        lambda denv, wexp: fused_tp.gather_unweight_sh_call(
            denv, denv, wexp, offs_p, win, dim_to_irr=dim_to_irr, U=U, eb=EB
        ),
        denv,
        wexp,
    )
    device_time(
        "  bwd dwexp (gather_unweight_w)",
        lambda denv, sh: fused_tp.gather_unweight_w_call(
            denv, denv, sh, offs_p, win, dim_to_irr=dim_to_irr, U=U, eb=EB
        ),
        denv,
        sh,
    )

    def fused_fwd_bwd(sh, wexp, x, g):
        env = piece_env(sh, wexp)
        out = fused_tp.gather_tp_call(
            x, env, env, wmat, offs_p, win, entries=entries, dims=dims, U=U, eb=EB
        )
        dx = fused_tp.gather_tp_call(
            g, env, env, wmat, offs_p, win, entries=swapped, dims=(d3, d2, d1), U=U, eb=EB
        )
        denv = bwd_denv(x, g)
        dw = fused_tp.gather_dw_call(
            x, env, env, g, offs_p, win, entries=entries, dims=dims, U=U, eb=EB
        )
        dsh = fused_tp.gather_unweight_sh_call(
            denv, denv, wexp, offs_p, win, dim_to_irr=dim_to_irr, U=U, eb=EB
        )
        dwexp = fused_tp.gather_unweight_w_call(
            denv, denv, sh, offs_p, win, dim_to_irr=dim_to_irr, U=U, eb=EB
        )
        return out, dx, dw, dsh, dwexp

    device_time("FUSED fwd+bwd (6 kernels + 2 combines)", fused_fwd_bwd, sh, wexp, x_flat, g_flat)

    # --- round-1 path for comparison ---
    backend = PallasTPBackend(w3j)
    rtoi = jnp.asarray(
        np.repeat(np.eye(n_irr), [2 * int(mi.ir.l) + 1 for mi in irreps_sh], axis=1),
        jnp.float32,
    )
    x1 = jnp.asarray(rng.randn(Ep, U, d1), jnp.float32)
    x1p = pack_edge_major(x1)

    def old_layer(sh, wexp, x1p):
        wl = wexp.reshape(Ep, U, n_irr)
        weighted = jnp.einsum("eui,id,ed->eud", wl, rtoi, sh)  # env weighter
        flat = weighted.reshape(Ep, -1)
        env_atoms = jax.ops.segment_sum(flat, centers, num_segments=N_ATOMS + 1)
        env_edges = jnp.take(env_atoms, centers, axis=0).reshape(Ep, U, d2)
        x2p = pack_edge_major(env_edges)
        return backend.contract_packed(x1p, x2p, wmat.T, U=U)

    device_time("OLD fwd (weighter+segsum+take+pack+packedTP)", old_layer, sh, wexp, x1p)

    def old_vjp(sh, wexp, x1p):
        out, vjp = jax.vjp(old_layer, sh, wexp, x1p)
        return vjp(jnp.ones_like(out))

    device_time("OLD fwd+bwd (jax.vjp)", old_vjp, sh, wexp, x1p)


if __name__ == "__main__" and "--extra" not in sys.argv:
    main()


def extra():
    """Fused-backward kernels + layout transposes + custom_vjp layer timing."""
    import functools
    from allegro_tpu.ops import fused_primitives as fp

    irreps_sh = Irreps("1x0e+1x1o+1x2e")
    allowed = Irreps("1x0e+1x0o+1x1e+1x1o+1x2e+1x2o")
    ladder = compute_irreps_ladder(irreps_sh, allowed, 2)
    ins = enumerate_instructions(ladder[0], irreps_sh, ladder[1])
    w3j = pack_w3j(ladder[0], irreps_sh, ladder[1], ins)
    entries = sparse_entries(w3j)
    P, d1, d2, d3 = w3j.shape
    dims = (d1, d2, d3)
    n_irr = len(irreps_sh)
    rng = np.random.RandomState(0)
    centers_np = np.sort(rng.randint(0, N_ATOMS, E))
    centers = jnp.asarray(
        np.concatenate([centers_np, np.full(Ep - E, N_ATOMS)]).astype(np.int32)
    )
    Na = fused_tp.num_rank_rows(N_ATOMS, EB)
    win, offs_p = fused_tp.make_block_plan(centers, EB)
    x = jnp.asarray(rng.randn(Ep, d1 * U), jnp.float32)
    g = jnp.asarray(rng.randn(Ep, d3 * U), jnp.float32)
    sh = jnp.asarray(rng.randn(Ep, d2), jnp.float32)
    wexp = jnp.asarray(rng.randn(Ep, n_irr * U), jnp.float32)
    wmat = jnp.asarray(rng.randn(P, U), jnp.float32)
    dim_to_irr = tuple(
        k for k, sl in enumerate(irreps_sh.slices()) for _ in range(sl.stop - sl.start)
    )

    env = fused_tp.combine_scatter_outputs(
        *fused_tp.env_scatter_call(
            sh, wexp, offs_p, win, dim_to_irr=dim_to_irr, U=U, eb=EB, n_rank_rows=Na
        ),
        win, EB,
    )
    device_time(
        "bwd_fused (dx+denv+dw one kernel)",
        lambda x, g, env: fused_tp.bwd_fused_call(
            x, g, env, env, wmat, offs_p, win, entries=entries, dims=dims, U=U,
            eb=EB, n_rank_rows=Na,
        ),
        x, g, env,
    )
    denv = env
    device_time(
        "unweight_both (dsh+dwexp one kernel)",
        lambda denv, sh, wexp: fused_tp.unweight_both_call(
            denv, denv, sh, wexp, offs_p, win, dim_to_irr=dim_to_irr, U=U, eb=EB
        ),
        denv, sh, wexp,
    )

    infer = functools.partial(
        fp.fused_layer_infer, entries=None
    )  # placeholder; call positionally below

    def layer_infer(x, sh, wexp):
        return fp.fused_layer_infer(
            x, sh, wexp, wmat, offs_p, win, entries, dims, U, EB, dim_to_irr, Na
        )

    device_time("fused_layer_infer fwd", layer_infer, x, sh, wexp)

    def layer_infer_vjp(x, sh, wexp):
        out, vjp = jax.vjp(layer_infer, x, sh, wexp)
        return vjp(jnp.ones_like(out))

    device_time("fused_layer_infer fwd+bwd (custom_vjp)", layer_infer_vjp, x, sh, wexp)

    # layout transposes of the integration layer
    x3 = jnp.asarray(rng.randn(Ep, U, d1), jnp.float32)
    device_time(
        "entry transpose [E,U,d]->[E,d*U]",
        lambda a: a.transpose(0, 2, 1).reshape(Ep, d1 * U),
        x3,
    )
    wexp_u = jnp.asarray(rng.randn(Ep, U * n_irr), jnp.float32)
    device_time(
        "wexp swap [E,U*n]->[E,n*U]",
        lambda a: a.reshape(Ep, U, n_irr).swapaxes(1, 2).reshape(Ep, n_irr * U),
        wexp_u,
    )


if "--extra" in sys.argv:
    extra()
