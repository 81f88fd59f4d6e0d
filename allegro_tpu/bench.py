"""Benchmark: the BASELINE.md metric set on the flagship model.

(Repo-root shim lives in bench.py; this module is the implementation.)

Prints ONE JSON line. Headline metric: µs/atom per MD force call
(energy+forces) at float32 — the BASELINE.md north-star (< 1 µs/atom/step
target on v5p-8; this runs on whatever single chip is available). The JSON
also carries the other two BASELINE.md metrics:

- ``train_samples_per_sec``: full jitted train step (Adam, energy+force loss,
  second-order AD through the force) on aspirin-scale molecular frames,
  mirroring the reference tutorial recipe (`configs/tutorial.yaml:8-64`).
- ``force_mae_vs_f64``: end-to-end force parity of the on-chip f32 fused
  path vs this repo's float64 einsum oracle evaluated on CPU in a clean
  subprocess (the reference asserts 5e-5 f32 consistency,
  ``tests/model/test_allegro.py:72-74``).

Env knobs: BENCH_N_ATOMS, BENCH_BACKEND, BENCH_SKIP_EXTRA=1 (headline only),
BENCH_REMAT=1 (per-layer remat — required near the single-chip memory
ceiling).
"""

import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

class _SkipEnrichment(Exception):
    """Raised inside an enrichment block's try to skip it cleanly when the
    headline deadline (BENCH_HEADLINE_DEADLINE_S) has passed."""


_FLAGSHIP = dict(
    r_max=4.0,
    type_names=["A", "B", "C"],
    l_max=2,
    parity=True,
    num_layers=2,
    num_scalar_features=64,
    num_tensor_features=32,
    per_type_energy_scales=1.0,
    per_type_energy_shifts=0.0,
)


def _crystal_frame(n_atoms, r_max, seed=0):
    from allegro_tpu.data import keys
    from allegro_tpu.data.neighborlist import neighbor_list

    rng = np.random.RandomState(seed)
    side = int(round(n_atoms ** (1 / 3)))
    n_atoms = side**3
    spacing = 2.2
    grid = (
        np.stack(np.meshgrid(*(np.arange(side),) * 3, indexing="ij"), axis=-1)
        .reshape(-1, 3)
        .astype(np.float64)
    )
    pos = grid * spacing + 0.1 * rng.randn(n_atoms, 3)
    frame = {
        keys.POSITIONS: pos,
        keys.ATOM_TYPES: rng.randint(0, 3, n_atoms).astype(np.int32),
        keys.CELL: np.eye(3) * (side * spacing),
        keys.PBC: np.ones(3, dtype=bool),
    }
    return neighbor_list(frame, r_max), n_atoms


def _flagship_model(avg_num_neighbors, backend, r_max=4.0, remat=False,
                    tensor_dtype=None, precision=None, fused_eb=None):
    from allegro_tpu.model import AllegroModel

    if tensor_dtype is None:
        tensor_dtype = os.environ.get("BENCH_TENSOR_DTYPE") or None
    if tensor_dtype in ("none", "float32"):
        tensor_dtype = None
    extra = {}
    if precision is None:  # e.g. "high": 3-pass bf16 split for the dots
        precision = os.environ.get("BENCH_PRECISION") or None
    if precision:
        extra["precision"] = precision
    # eb=512 + narrow wr: big edge blocks amortize the per-grid-step cost and
    # the narrow window keeps every one-hot product at one MXU K-tile
    # (1.27x kernel-suite, 1.42x end-to-end: 2.89 -> 2.04 us/atom at 4k f32
    # with wr=64). r5 window sweep on silicon (4k, both tracks): wr=32 is the
    # floor of the win (f32 2.04->2.00, bf16 1.905->1.866); wr=16 collapses
    # to 3.52 (per-window fixed cost dominates); eb=1024 is a wash (2.03).
    # precompute_statics silently degrades wr to eb if the edge distribution
    # rejects the narrow plan (never at crystal density).
    #
    # INFERENCE ONLY: the trainable `fused` backend derives its plans
    # in-graph (no precompute_statics → no FUSED_WR narrow window), so big
    # eb just multiplies the classic one-hot MACs/edge by eb/128 — measured
    # 2x train slowdown at eb=512 (r5). Train benches pass fused_eb
    # explicitly to keep the module-default classic plan.
    extra["fused_block_edges"] = fused_eb or int(
        os.environ.get("BENCH_FUSED_EB", "512")
    )
    wr_env = int(os.environ.get("BENCH_WINDOW_ROWS", "32")) or None
    extra["window_rows"] = (
        wr_env if wr_env and wr_env < extra["fused_block_edges"] else None
    )
    return AllegroModel(
        **_FLAGSHIP,
        **extra,
        avg_num_neighbors=avg_num_neighbors,
        model_dtype="float32",
        tp_kernel_backend=backend,
        remat=remat,
        tensor_dtype=tensor_dtype,
        # memory-lean layout past the remat threshold (avoids a 2.6 GB
        # features-cotangent relayout copy at >2M edges)
        features_layout="flat_dim_major" if remat else None,
    )


def run_benchmark_stage(config, workdir):
    """CLI stage wrapper: `python -m allegro_tpu benchmark -c config.yaml`."""
    bcfg = dict(config.get("benchmark", {}))
    result = run_benchmark(
        n_atoms=int(bcfg.get("n_atoms", 4096)),
        r_max=float(bcfg.get("r_max", 4.0)),
        backend=bcfg.get("tp_kernel_backend"),
        verbose=True,
    )
    print(json.dumps(result))
    return result


def run_benchmark(n_atoms=4096, r_max=4.0, iters=None, warmup=3, verbose=False, backend=None):
    import jax

    from allegro_tpu.data import batch_frames, keys, to_jax

    t_stage = time.time()

    def _v(msg):
        if verbose:
            print(f"  [hl +{time.time() - t_stage:6.1f}s] {msg}", file=sys.stderr)
            sys.stderr.flush()

    t0 = time.time()
    frame, n_atoms = _crystal_frame(n_atoms, r_max)
    n_edges = frame[keys.EDGE_INDEX].shape[1]
    if verbose:
        print(
            f"neighbor list: {n_edges} edges ({n_edges / n_atoms:.1f}/atom) "
            f"in {time.time() - t0:.1f}s",
            file=sys.stderr,
        )
    # pad edges to the fused edge-block multiple AT BATCH TIME so the model
    # never pays in-graph pads/slices on the per-edge arrays (E == Ep)
    eb_pad = int(os.environ.get("BENCH_FUSED_EB", "512"))
    batch_np = batch_frames([frame], n_frames=1, edge_multiple=max(eb_pad, 128))

    if backend is None:
        backend = os.environ.get("BENCH_BACKEND")
    if backend is None:
        # the fused kernels never materialize per-edge environment arrays in
        # HBM — fastest measured AND what fits large single-chip systems
        backend = "fused_infer"
    remat = os.environ.get("BENCH_REMAT", "auto")
    if remat == "auto":
        # activation cotangents dominate beyond ~40k atoms on a 16 GB chip;
        # past that, per-layer remat + whole-energy checkpoint (+ bf16
        # tensor storage via BENCH_TENSOR_DTYPE) bound the residual set
        remat_flag = n_atoms > 40000
    else:
        remat_flag = remat == "1"
    # past the single-chip f32 ceiling (~60k atoms / 16 GB), bf16 tensor-track
    # storage is what fits the 100k-atom north-star system; keep f32-exact
    # below it (override either way with BENCH_TENSOR_DTYPE)
    tensor_dtype = "bfloat16" if (n_atoms > 60000 and "BENCH_TENSOR_DTYPE" not in os.environ) else None
    model = _flagship_model(
        n_edges / n_atoms, backend, r_max, remat=remat_flag, tensor_dtype=tensor_dtype
    )
    if remat_flag:
        import dataclasses as _dc

        model = _dc.replace(model, checkpoint_energy=True)
    # position-independent per-edge statics (edge types, fused block plan):
    # computed once per neighbor list, like a real MD loop would — on the
    # HOST batch, before upload (a device→host readback over the TPU tunnel
    # costs minutes, measured r5)
    batch = to_jax(model.precompute_statics(batch_np), dtype=np.float32)
    _v("statics+upload done")
    params = model.init(0, batch)
    jax.block_until_ready(params)
    _v("init done")

    # NOTE timing methodology: each step's input depends on the previous
    # step's output (like a real MD loop), and a scalar VALUE is fetched at
    # the end — `block_until_ready` is unreliable through remote-tunnel
    # backends, and identical repeated calls can be deduped. This measures
    # amortized per-step device time honestly.
    @jax.jit
    def force_step(params, batch, d):
        b = dict(batch)
        b[keys.POSITIONS] = batch[keys.POSITIONS] + d
        out = model.apply_with_derivatives(params, b)
        return 1e-4 * out[keys.FORCES]

    import jax.numpy as jnp

    d = jnp.zeros_like(batch[keys.POSITIONS])
    t0 = time.time()
    d = force_step(params, batch, d)
    _ = float(d.sum())
    if verbose:
        print(f"compile+first step: {time.time() - t0:.1f}s", file=sys.stderr)
    for _ in range(warmup):
        d = force_step(params, batch, d)
    # drain the warmup chain BEFORE timing the host sync, so sync_ms measures
    # one round trip and not ~warmup pending steps (ADVICE r3)
    jax.block_until_ready(d)
    t0 = time.time()
    _ = float(d.sum())
    sync_ms = (time.time() - t0) * 1e3  # end-of-chain host sync round trip
    if iters is None:
        # the tunnel's host sync costs ~tens of ms per round trip; pick the
        # chain length so that ONE end-of-chain sync is <~1% of the timed
        # window (at 4k atoms / ~14 ms steps this is ~150 iters; big systems
        # keep the short chain). Estimate step time from a 5-step chain.
        t0 = time.time()
        for _ in range(5):
            d = force_step(params, batch, d)
        _ = float(d.sum())
        est_ms = max((time.time() - t0) * 1e3 / 5, 1e-3)
        iters = int(min(300, max(20, 100 * sync_ms / est_ms)))
    t0 = time.time()
    for _ in range(iters):
        d = force_step(params, batch, d)
    _ = float(d.sum())  # forces completion of the whole chain
    dt = (time.time() - t0) / iters
    us_per_atom = dt / n_atoms * 1e6
    _v(f"timing loop done ({iters} iters)")

    # headline deadline: from here on the VALUE exists and every remaining
    # block is optional enrichment (fwd split, copy roofline, cost analysis,
    # trace). Skip what doesn't fit so a degraded tunnel can't starve the
    # stage registry of the global budget (r4 postmortem: one lost stage is
    # recoverable, a lost record is not).
    deadline_s = float(os.environ.get("BENCH_HEADLINE_DEADLINE_S", "0")) or None
    skipped_enrichment = []

    def _fits(name):
        if deadline_s is not None and time.time() - t_stage > deadline_s:
            skipped_enrichment.append(name)
            _v(f"skip {name} (headline deadline {deadline_s:.0f}s passed)")
            return False
        return True

    # per-phase split: energy-only forward vs the full force call (fwd+bwd) —
    # the VERDICT-r2 "per-phase breakdown" signal
    @jax.jit
    def fwd_step(params, batch, d):
        b = dict(batch)
        b[keys.POSITIONS] = batch[keys.POSITIONS] + d
        out = model.apply(params, b)
        return 1e-12 * out[keys.TOTAL_ENERGY].sum() * jnp.ones_like(d)

    fwd_ms = None
    try:
        if not _fits("fwd_split"):
            raise _SkipEnrichment
        d2 = jnp.zeros_like(batch[keys.POSITIONS])
        d2 = fwd_step(params, batch, d2)
        _ = float(d2.sum())
        t0 = time.time()
        for _ in range(max(iters // 2, 3)):
            d2 = fwd_step(params, batch, d2)
        _ = float(d2.sum())
        fwd_ms = (time.time() - t0) / max(iters // 2, 3) * 1e3
    except Exception:
        pass
    _v("fwd split done")

    # measured on-device copy bandwidth: the roofline denominator for the
    # HBM-bound kernels (copy reads+writes 2 bytes per byte of array).
    # Median of 5 chains with one end-of-chain sync each — the round-3 one-
    # shot measurement spread 27–418 GB/s across runs, making any roofline
    # claim meaningless (VERDICT r3 weak #1).
    copy_gbps = None
    copy_gbps_spread = None
    try:
        if not _fits("copy_bandwidth"):
            raise _SkipEnrichment
        big = jnp.zeros((512 * 1024 * 1024 // 4,), jnp.float32)  # 512 MB

        @jax.jit
        def bump(x):
            return x + 1.0

        big = bump(big)
        jax.block_until_ready(big)
        samples = []
        n_copy = 40
        for _ in range(5):
            t0 = time.time()
            for _ in range(n_copy):
                big = bump(big)
            jax.block_until_ready(big)
            samples.append(2 * big.nbytes * n_copy / (time.time() - t0) / 1e9)
        samples.sort()
        copy_gbps = samples[len(samples) // 2]
        copy_gbps_spread = (samples[0], samples[-1])
        del big
    except Exception:
        pass
    _v("copy-bandwidth done")

    # modeled HBM traffic of one force call: XLA's own HLO cost analysis
    # ("bytes accessed" sums operand+result bytes per op — for the Pallas
    # custom-calls that is exactly the kernel I/O model, no cache-reuse
    # credit). roofline_frac ≈ 1 would mean every byte moves at the measured
    # copy bandwidth; < 1 means compute/latency-bound phases or idle gaps.
    modeled_gb = None
    roofline_frac = None
    try:
        if not _fits("cost_analysis"):
            raise _SkipEnrichment
        ca = (
            force_step
            .lower(params, batch, jnp.zeros_like(batch[keys.POSITIONS]))
            .compile()
            .cost_analysis()
        )
        if ca:
            ba = ca.get("bytes accessed")
            if ba:
                modeled_gb = float(ba) / 1e9
                if copy_gbps:
                    roofline_frac = modeled_gb / (dt * copy_gbps)
    except Exception:
        pass
    _v("cost-analysis done")

    # on-chip per-op attribution of the step (VERDICT r3 #1): where the time
    # goes — pallas kernels vs XLA matmuls vs relayout copies — plus the
    # top-10 named ops. Skipped when profiling is unavailable.
    breakdown = None
    if os.environ.get("BENCH_TRACE", "1") == "1" and _fits("trace"):
        try:
            from .utils.traceops import capture_step_breakdown

            def _run(n, _d=[d]):
                for _ in range(n):
                    _d[0] = force_step(params, batch, _d[0])
                jax.block_until_ready(_d[0])

            breakdown = capture_step_breakdown(_run, iters=10)
        except Exception as e:
            breakdown = {"error": str(e)[:200]}
        _v("trace capture done")

    target = 1.0  # us/atom/step north-star (BASELINE.md)
    from .ops import fused_tp as _ft

    # record which fused paths ACTUALLY ran (VERDICT r3 #4: the bench's
    # fallback retries flip env kill-switches — a silent fallback must flip a
    # flag here instead of changing what the headline means invisibly)
    mega_on = (
        backend == "fused_infer"
        and os.environ.get("ALLEGRO_NO_MEGA") != "1"
        and os.environ.get("ALLEGRO_TP_BYPASS") != "1"
    )
    readout_on = (
        backend == "fused_infer"
        and os.environ.get("ALLEGRO_NO_FUSED_READOUT") != "1"
        and keys.CENTER_RANK_IDENTITY in batch
    )
    # the tensor embed always emits the factor form (EDGE_FEATURE_WEIGHTS)
    # the embed-fused layer-0 kernel consumes; it is live whenever mega is
    embed_l0_on = mega_on
    extra = {
        "n_atoms": int(n_atoms),
        "n_edges": int(n_edges),
        "l_max": 2,
        "num_layers": 2,
        "num_tensor_features": 32,
        "backend": backend,
        "remat": bool(remat_flag),
        # report the RESOLVED storage dtype: _flagship_model falls back to
        # the BENCH_TENSOR_DTYPE env var when the local choice is None, and
        # the JSON must describe what actually ran
        "tensor_dtype": str(
            (model.builder_kwargs or {}).get("tensor_dtype") or "float32"
        ),
        "step_ms": round(dt * 1e3, 3),
        "fwd_ms": round(fwd_ms, 3) if fwd_ms is not None else None,
        "copy_GBps": round(copy_gbps, 1) if copy_gbps is not None else None,
        "copy_GBps_minmax": [round(x, 1) for x in copy_gbps_spread]
        if copy_gbps_spread
        else None,
        "hbm_model_GB": round(modeled_gb, 3) if modeled_gb is not None else None,
        "roofline_frac": round(roofline_frac, 3)
        if roofline_frac is not None
        else None,
        "timing_iters": int(iters),
        "onehot_passes": _ft.ONEHOT_PASSES,
        "precision": (model.builder_kwargs or {}).get("precision") or "highest",
        "mega": bool(mega_on),
        "fused_readout": bool(readout_on),
        "embed_fused_l0": bool(embed_l0_on),
        "fused_block_edges": _fused_eb(model),
        # the wr actually in force (plan-validated; None = classic wr = eb)
        "window_rows": (
            int(batch[keys.FUSED_WR].shape[0])
            if keys.FUSED_WR in batch
            else None
        ),
        "features_layout": (model.builder_kwargs or {}).get("features_layout")
        or "strided",
        "device": str(jax.devices()[0]),
    }
    if breakdown is not None:
        extra["trace"] = breakdown
    if skipped_enrichment:
        extra["headline_enrichment_skipped"] = skipped_enrichment
    return {
        "metric": "md_force_call_us_per_atom",
        "value": round(us_per_atom, 4),
        "unit": "us/atom/step",
        "vs_baseline": round(target / us_per_atom, 4),
        "extra": extra,
    }


def _fused_eb(model):
    """The edge-block size the fused backends will use for this model."""
    try:
        from .nn import allegro as _alleg

        return int(
            (model.builder_kwargs or {}).get("fused_block_edges")
            or _alleg.FUSED_BLOCK_EDGES
        )
    except Exception:
        return None


def run_streamed_benchmark(
    n_atoms=100000, r_max=4.0, n_chunks=8, tensor_dtype=None, iters=None,
    verbose=False,
):
    """µs/atom for a streamed (center-chunked) force call — EXACT f32 storage
    at the 100k-atom north-star size on one chip (VERDICT r4 #3: the
    monolithic f32 step compile-OOMs at ~97k on 16 GB even with remat).
    Strict locality makes the chunked evaluation arithmetically identical to
    the monolithic one (tests/md/test_streaming.py); peak activation memory
    is ~1/n_chunks, so no remat and no bf16 track are needed."""
    import jax
    import jax.numpy as jnp

    from allegro_tpu.data import batch_frames, keys, to_jax
    from allegro_tpu.md.streaming import make_streamed_energy_forces_fn, build_chunks

    t0 = time.time()
    frame, n_atoms = _crystal_frame(n_atoms, r_max)
    n_edges = frame[keys.EDGE_INDEX].shape[1]
    eb_pad = int(os.environ.get("BENCH_FUSED_EB", "512"))
    # statics/chunks on the HOST batch, then one upload (device readbacks
    # over the TPU tunnel cost minutes, measured r5)
    batch_np = batch_frames([frame], n_frames=1, edge_multiple=max(eb_pad, 128))
    if verbose:
        print(
            f"streamed neighbor list: {n_edges} edges in {time.time() - t0:.1f}s",
            file=sys.stderr,
        )
    model = _flagship_model(
        n_edges / n_atoms, "fused_infer", r_max, remat=False,
        tensor_dtype=tensor_dtype or "none",
    )
    t0 = time.time()
    stacked = build_chunks(batch_np, model, n_chunks)
    if verbose:
        print(f"chunk build ({n_chunks}): {time.time() - t0:.1f}s", file=sys.stderr)
    batch = to_jax(model.precompute_statics(batch_np), dtype=np.float32)
    params = model.init(0, batch)
    ef = make_streamed_energy_forces_fn(model, params, stacked)
    # explicit jit args: closed-over chunk statics would be HLO constants —
    # hundreds of MB at 100k atoms, overflowing the tunnel's remote-compile
    # request (HTTP 413, measured r5)
    stacked_dev = jax.device_put(stacked)

    @jax.jit
    def force_step(pos, d, params, stacked_dev):
        e, f = ef(pos + d, params, stacked_dev)
        return 1e-4 * f

    pos = batch[keys.POSITIONS]
    d = jnp.zeros_like(pos)
    t0 = time.time()
    d = force_step(pos, d, params, stacked_dev)
    _ = float(d.sum())
    if verbose:
        print(f"streamed compile+first: {time.time() - t0:.1f}s", file=sys.stderr)
    for _ in range(2):
        d = force_step(pos, d, params, stacked_dev)
    _ = float(d.sum())
    if iters is None:
        iters = 10 if n_atoms > 50000 else 40
    t0 = time.time()
    for _ in range(iters):
        d = force_step(pos, d, params, stacked_dev)
    _ = float(d.sum())
    us_per_atom = (time.time() - t0) / iters / n_atoms * 1e6
    return {
        "us_per_atom": round(us_per_atom, 4),
        "n_atoms": int(n_atoms),
        "n_chunks": int(n_chunks),
        "tensor_dtype": tensor_dtype or "float32",
        "timing_iters": int(iters),
    }


def run_streamed_subprocess(n_atoms, n_chunks=8, timeout=1800, env_extra=None):
    """Streamed bench in a CLEAN subprocess (OOM isolation, same rationale as
    ``run_bench_subprocess``)."""
    env = dict(os.environ)
    env.update(env_extra or {})
    proc = subprocess.run(
        [
            sys.executable, "-m", "allegro_tpu.bench",
            "--streamed", str(n_atoms), str(n_chunks),
        ],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=timeout,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"streamed subprocess rc={proc.returncode}: "
            + (proc.stdout.strip().splitlines() or [""])[-1][-200:]
            + (proc.stderr.strip().splitlines() or [""])[-1][-200:]
        )
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except ValueError:
            continue
    raise RuntimeError("streamed subprocess printed no JSON line")


def _scanned_samples_per_sec(step_fn, params, opt_state, steps, batch_size,
                             label, verbose, calls=3):
    """Samples/s of ``jax.lax.scan`` over jitted train steps.

    ONE dispatch per ``steps`` optimizer steps: at ~1 ms/step device time the
    per-call host→device dispatch over the TPU tunnel is the same order as
    the step itself and varies run to run (measured r5: 7.2k vs 11.1k
    samples/s for the identical program on the same chip) — scanning on
    device removes it. This is also the production shape of a TPU training
    loop: trace once, let the device run the epoch.

    ``step_fn(params, opt_state) -> (params, opt_state, loss)`` must be pure.
    """
    import jax

    @jax.jit
    def run(params, opt_state):
        def body(carry, _):
            p, o = carry
            p, o, loss = step_fn(p, o)
            return (p, o), loss

        (p, o), losses = jax.lax.scan(
            body, (params, opt_state), None, length=steps
        )
        return p, o, losses[-1]

    t0 = time.time()
    params, opt_state, loss = run(params, opt_state)
    _ = float(loss)
    if verbose:
        print(f"{label} compile+first scan({steps}): {time.time() - t0:.1f}s",
              file=sys.stderr)
    t0 = time.time()
    for _ in range(calls):
        params, opt_state, loss = run(params, opt_state)
    _ = float(loss)  # chain: each call consumes the previous params
    return batch_size / ((time.time() - t0) / (calls * steps))


def run_train_bench(batch_size=16, steps=100, verbose=False):
    """Train samples/sec: jitted Adam step with energy+force loss (the
    second-order-AD path the reference trains with) on 21-atom frames."""
    import jax
    import jax.numpy as jnp
    import optax

    from allegro_tpu.data import batch_frames, keys, to_jax
    from allegro_tpu.data.datasets import synthetic_molecular_frames

    frames = synthetic_molecular_frames(batch_size, n_atoms=21, spread=3.0)
    from allegro_tpu.data.neighborlist import neighbor_list

    frames = [neighbor_list(f, 4.0) for f in frames]
    # edge count from the HOST batch (a device readback over the TPU tunnel
    # can cost minutes when the link degrades, measured r5)
    batch_np = batch_frames(frames, n_frames=batch_size)
    n_edges = int(batch_np[keys.EDGE_MASK].sum())
    batch = to_jax(batch_np, dtype=np.float32)
    model = _flagship_model(
        max(n_edges / (21 * batch_size), 1.0), backend="fused", r_max=4.0,
        fused_eb=128,  # classic train plan — see _flagship_model note
    )
    params = model.init(0, batch)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    f_true = batch[keys.FORCES]
    e_true = batch[keys.TOTAL_ENERGY].reshape(-1)

    def step(params, opt_state):
        def loss_fn(p):
            out = model.apply_with_derivatives(params=p, data=batch)
            fmask = batch[keys.NODE_MASK].astype(jnp.float32)[:, None]
            floss = jnp.sum(fmask * (out[keys.FORCES] - f_true) ** 2) / jnp.sum(fmask) / 3
            eloss = jnp.mean((out[keys.TOTAL_ENERGY].reshape(-1) - e_true) ** 2)
            return floss + eloss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    return _scanned_samples_per_sec(
        step, params, opt_state, steps, batch_size, "train", verbose
    )


def run_train_bench_1k(batch_size=4, n_atoms=1000, steps=20, verbose=False):
    """Train samples/sec at PRODUCTION system size (VERDICT r3 #7): periodic
    ~1k-atom cells, batch 4 (~100k edges/batch), energy+force loss through
    the trainable `fused` primitive backend (second-order AD through forces
    — the reference's cuEq-accelerated training role,
    ``docs/guide/accelerations.rst``). The tutorial-parity number
    (``run_train_bench``) stays: 21-atom molecular frames, batch 16."""
    import jax
    import jax.numpy as jnp
    import optax

    from allegro_tpu.data import batch_frames, keys, to_jax

    frames = []
    for s in range(batch_size):
        f, na = _crystal_frame(n_atoms, 4.0, seed=200 + s)
        frames.append(f)
    batch_np = batch_frames(frames, n_frames=batch_size)
    n_edges = int(batch_np[keys.EDGE_MASK].sum())
    batch = to_jax(batch_np, dtype=np.float32)
    model = _flagship_model(
        n_edges / (na * batch_size), backend="fused", r_max=4.0,
        fused_eb=128,  # classic train plan — see _flagship_model note
    )
    params = model.init(0, batch)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    f_true = jnp.zeros_like(batch[keys.POSITIONS])
    e_true = jnp.zeros((batch_size,), jnp.float32)

    def step(params, opt_state):
        def loss_fn(p):
            out = model.apply_with_derivatives(params=p, data=batch)
            fmask = batch[keys.NODE_MASK].astype(jnp.float32)[:, None]
            floss = jnp.sum(fmask * (out[keys.FORCES] - f_true) ** 2) / jnp.sum(fmask) / 3
            eloss = jnp.mean((out[keys.TOTAL_ENERGY].reshape(-1) - e_true) ** 2)
            return floss + eloss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    if verbose:
        print(f"train-1k: {n_edges} edges/batch", file=sys.stderr)
    return _scanned_samples_per_sec(
        step, params, opt_state, steps, batch_size, "train-1k", verbose
    )


def run_lmax3_bench(n_atoms=4096, r_max=4.0, iters=40, warmup=2, verbose=False):
    """µs/atom for the l_max=3 full-parity deep stack — BASELINE.json config 3
    ("l_max=3 deep stack with full parity channels"), the O(l_max^6) stress
    case (`/root/reference/docs/guide/allegro_model.rst:13`)."""
    import jax
    import jax.numpy as jnp

    from allegro_tpu.data import batch_frames, keys, to_jax
    from allegro_tpu.model import AllegroModel

    frame, n_atoms = _crystal_frame(n_atoms, r_max)
    n_edges = frame[keys.EDGE_INDEX].shape[1]
    batch_np = batch_frames([frame], n_frames=1)
    # same memory policy as the headline bench: past the single-chip f32
    # ceiling, per-layer remat + whole-energy checkpoint + bf16 tensor track
    big = n_atoms > 20000  # l_max=3 tensor track is ~2.3x wider than l_max=2
    extra = {}
    if os.environ.get("BENCH_PRECISION"):
        extra["precision"] = os.environ["BENCH_PRECISION"]
    model = AllegroModel(
        r_max=r_max,
        type_names=["A", "B", "C"],
        l_max=3,
        parity=True,
        num_layers=2,
        num_scalar_features=64,
        num_tensor_features=32,
        per_type_energy_scales=1.0,
        per_type_energy_shifts=0.0,
        avg_num_neighbors=n_edges / n_atoms,
        model_dtype="float32",
        tp_kernel_backend=os.environ.get("BENCH_BACKEND", "fused_infer"),
        remat=big,
        checkpoint_energy=big,
        tensor_dtype="bfloat16" if big else None,
        **extra,
    )
    batch = to_jax(model.precompute_statics(batch_np), dtype=np.float32)
    params = model.init(0, batch)

    @jax.jit
    def force_step(params, batch, d):
        b = dict(batch)
        b[keys.POSITIONS] = batch[keys.POSITIONS] + d
        out = model.apply_with_derivatives(params, b)
        return 1e-4 * out[keys.FORCES]

    d = jnp.zeros_like(batch[keys.POSITIONS])
    t0 = time.time()
    d = force_step(params, batch, d)
    _ = float(d.sum())
    if verbose:
        print(f"lmax3 compile+first: {time.time() - t0:.1f}s", file=sys.stderr)
    for _ in range(warmup):
        d = force_step(params, batch, d)
    _ = float(d.sum())
    t0 = time.time()
    for _ in range(iters):
        d = force_step(params, batch, d)
    _ = float(d.sum())
    return (time.time() - t0) / iters / n_atoms * 1e6


def run_train_stress_bench(batch_size=4, n_atoms=64, steps=50, verbose=False):
    """Train samples/sec on a multi-species PERIODIC batch with a stress term
    in the loss — BASELINE.json config 2 ("multi-species periodic training
    with stress"). Second-order AD through forces AND the strain derivative."""
    import jax
    import jax.numpy as jnp
    import optax

    from allegro_tpu.data import batch_frames, keys, to_jax

    frames = []
    for s in range(batch_size):
        f, _ = _crystal_frame(n_atoms, 4.0, seed=100 + s)
        frames.append(f)
    batch_np = batch_frames(frames, n_frames=batch_size)
    n_edges = int(batch_np[keys.EDGE_MASK].sum())
    batch = to_jax(batch_np, dtype=np.float32)
    model = _flagship_model(
        n_edges / (n_atoms * batch_size), backend="fused", r_max=4.0,
        fused_eb=128,  # classic train plan — see _flagship_model note
    )
    params = model.init(0, batch)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    f_true = batch[keys.FORCES] if keys.FORCES in batch else jnp.zeros_like(
        batch[keys.POSITIONS]
    )
    e_true = batch[keys.TOTAL_ENERGY].reshape(-1) if keys.TOTAL_ENERGY in batch else jnp.zeros((batch_size,), jnp.float32)
    s_true = jnp.zeros((batch_size, 3, 3), jnp.float32)

    def step(params, opt_state):
        def loss_fn(p):
            out = model.apply_with_derivatives(params=p, data=batch)
            fmask = batch[keys.NODE_MASK].astype(jnp.float32)[:, None]
            floss = jnp.sum(fmask * (out[keys.FORCES] - f_true) ** 2) / jnp.sum(fmask) / 3
            eloss = jnp.mean((out[keys.TOTAL_ENERGY].reshape(-1) - e_true) ** 2)
            sloss = jnp.mean((out[keys.STRESS] - s_true) ** 2)
            return floss + eloss + 0.1 * sloss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    return _scanned_samples_per_sec(
        step, params, opt_state, steps, batch_size, "stress-train", verbose
    )


def run_kernel_smoke(n_atoms=512, verbose=False):
    """On-silicon kernel smoke tier (VERDICT r3 #6): Mosaic-compile and run
    every fused kernel family member the flagship step uses — mega latent+env,
    embed-fused layer 0, gather_tp (split-scalars), fused readout, the
    one-pass fused backward, the center/perm force-path kernels — at the
    flagship block shapes (eb, column counts; Mosaic legality depends on the
    block, not the edge count), and assert force parity against the einsum
    backend ON THE SAME CHIP. Also runs one grad step through the trainable
    `fused` primitive backend. Returns "ok" or raises — run as a bench
    preamble so a Mosaic regression fails LOUDLY instead of silently
    downgrading the headline via the env-var fallbacks.
    """
    import jax
    import jax.numpy as jnp

    from allegro_tpu.data import batch_frames, keys, to_jax

    frame, n_atoms = _crystal_frame(n_atoms, 4.0, seed=3)
    n_edges = frame[keys.EDGE_INDEX].shape[1]
    batch_np = batch_frames([frame], n_frames=1)
    batch = to_jax(batch_np, dtype=np.float32)
    # both models pinned to the fully EXACT policy (HIGHEST dots, 3-pass
    # one-hot) regardless of the bench's headline policy: the smoke detects
    # Mosaic miscompiles — the reduced-policy accuracy is validated by the
    # parity harness separately, and mixing policies here would blur the
    # pass/fail line
    from allegro_tpu.ops import fused_tp as _ft

    old_passes = _ft.ONEHOT_PASSES
    _ft.set_onehot_passes(3)
    try:
        fused = _flagship_model(
            n_edges / n_atoms, "fused_infer", tensor_dtype="none",
            precision="highest",
        )
        oracle = _flagship_model(
            n_edges / n_atoms, "einsum", tensor_dtype="none", precision="highest"
        )
        b_f = to_jax(fused.precompute_statics(batch_np), dtype=np.float32)
        params = fused.init(0, b_f)
        out_f = jax.jit(lambda p, b: fused.apply_with_derivatives(p, b))(params, b_f)
        out_o = jax.jit(lambda p, b: oracle.apply_with_derivatives(p, b))(params, batch)
    finally:
        _ft.ONEHOT_PASSES = old_passes
    f_f = np.asarray(out_f[keys.FORCES], np.float64)[:n_atoms]
    f_o = np.asarray(out_o[keys.FORCES], np.float64)[:n_atoms]
    scale = max(float(np.abs(f_o).max()), 1e-6)
    rel = float(np.abs(f_f - f_o).max()) / scale
    assert rel < 1e-5, f"fused_infer vs einsum force mismatch: rel {rel:.2e}"
    ea_f = np.asarray(out_f[keys.PER_ATOM_ENERGY], np.float64)[:n_atoms].ravel()
    ea_o = np.asarray(out_o[keys.PER_ATOM_ENERGY], np.float64)[:n_atoms].ravel()
    np.testing.assert_allclose(ea_f, ea_o, rtol=5e-5, atol=5e-5)

    # trainable backend: one grad through the primitive kernels
    train = _flagship_model(n_edges / n_atoms, "fused", tensor_dtype="none")
    b_t = to_jax(train.precompute_statics(batch_np), dtype=np.float32)

    def loss(p):
        out = train.apply_with_derivatives(p, b_t)
        return jnp.sum(out[keys.FORCES] ** 2) * 1e-4

    g = jax.jit(jax.grad(loss))(params)
    bad = [
        k for k, v in jax.tree_util.tree_leaves_with_path(g)
        if not bool(np.isfinite(np.asarray(v)).all())
    ]
    assert not bad, f"non-finite grads through fused primitives: {bad[:3]}"
    if verbose:
        print(f"kernel smoke ok: force rel {rel:.2e}", file=sys.stderr)
    return "ok"


def _save_pytree(path, tree):
    import jax

    leaves, _ = jax.tree_util.tree_flatten(tree)
    np.savez(path, **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)})


def _load_leaves_into(tree, path):
    import jax

    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    new = [data[f"leaf_{i}"] for i in range(len(leaves))]
    assert len(new) == len(leaves)
    return jax.tree_util.tree_unflatten(treedef, new)


def run_parity(n_atoms=512, verbose=False, onehot_passes=None, precision=None):
    """Force MAE of the on-chip f32 fused path vs the f64 einsum oracle
    (computed on CPU x64 in a clean subprocess; same params, same edges).

    ``onehot_passes``: explicitly pin the one-hot split policy for THIS
    measurement (2 = the bench headline policy, 3 = exact). The driver bench
    reports both, so a precision regression in the exact path stays visible
    even while the headline runs reduced-pass (VERDICT r3 weak #2).
    """
    import jax

    from allegro_tpu.data import batch_frames, keys, to_jax
    from allegro_tpu.ops import fused_tp as _ft

    old_passes = _ft.ONEHOT_PASSES
    if onehot_passes is not None:
        _ft.set_onehot_passes(onehot_passes)
    try:
        return _run_parity_inner(n_atoms, verbose, precision)
    finally:
        _ft.ONEHOT_PASSES = old_passes


def run_policy_parity(
    n_atoms=512, tensor_dtype=None, onehot_passes=None, precision=None,
    verbose=False,
):
    """Force parity of a given precision POLICY vs the f64 oracle, reported
    in the reference's own acceptance form: elementwise
    ``|Δf| <= atol + rtol·|f_ref|`` with rtol = atol = 5e-5
    (``/root/reference/tests/model/test_allegro.py:72-74`` compiled-model
    tolerance). Returns a dict with mae, rel, the allclose pass/fail, and the
    margin (max over components of ``|Δf| - rtol·|f_ref|``; pass iff
    margin <= atol). Used to qualify the 100k-atom policy (bf16 tensor-track
    storage) — VERDICT r3 #2."""
    from allegro_tpu.ops import fused_tp as _ft

    old_passes = _ft.ONEHOT_PASSES
    if onehot_passes is not None:
        _ft.set_onehot_passes(onehot_passes)
    try:
        mae, rel, margin = _run_parity_inner(
            n_atoms, verbose, precision, tensor_dtype=tensor_dtype,
            want_margin=True,
        )
    finally:
        _ft.ONEHOT_PASSES = old_passes
    atol = rtol = 5e-5
    return {
        "tensor_dtype": tensor_dtype or "float32",
        "force_mae_vs_f64": float(f"{mae:.3e}"),
        "force_mae_vs_f64_rel": float(f"{rel:.3e}"),
        "allclose_margin": float(f"{margin:.3e}"),
        "allclose_atol_rtol": atol,
        "reference_allclose_pass": bool(margin <= atol),
    }


def _run_parity_inner(n_atoms, verbose, precision=None, tensor_dtype=None,
                      want_margin=False):
    import jax

    from allegro_tpu.data import batch_frames, keys, to_jax

    frame, n_atoms = _crystal_frame(n_atoms, 4.0, seed=7)
    n_edges = frame[keys.EDGE_INDEX].shape[1]
    batch_np = batch_frames([frame], n_frames=1)
    model = _flagship_model(
        n_edges / n_atoms, backend="fused_infer", precision=precision,
        tensor_dtype=tensor_dtype or "none",
    )
    batch = to_jax(model.precompute_statics(batch_np), dtype=np.float32)
    params = model.init(0, batch)
    out = jax.jit(lambda p, b: model.apply_with_derivatives(p, b))(params, batch)
    f32 = np.asarray(out[keys.FORCES], np.float64)[:n_atoms]

    f64 = _oracle_forces_cached(params, n_atoms)[:n_atoms]
    mae = float(np.abs(f32 - f64).mean())
    frms = float(np.sqrt((f64**2).mean()))
    if want_margin:
        # reference acceptance form: pass iff max(|Δf| - rtol·|f_ref|) <= atol
        margin = float((np.abs(f32 - f64) - 5e-5 * np.abs(f64)).max())
        return mae, mae / frms, margin
    return mae, mae / frms


_ORACLE_CACHE = {}


def _oracle_forces_cached(params, n_atoms):
    """f64 einsum-oracle forces for the parity frame, via the clean CPU-x64
    subprocess (``_oracle_main``) — cached in-process AND on disk keyed by
    the params content hash + n_atoms. The three driver parity stages
    (headline policy, exact policy, bf16-track policy) all init the same
    seed-0 params, so without the cache each pays the ~60 s oracle run for
    byte-identical output (round-4 postmortem: serial bench stages blew the
    driver budget)."""
    import hashlib

    import jax

    h = hashlib.sha256()
    h.update(str(int(n_atoms)).encode())
    # ONE device_get for the whole tree: per-leaf np.asarray pays a tunnel
    # round trip each (minutes total when the link degrades, measured r5)
    params = jax.device_get(params)
    for leaf in jax.tree_util.tree_leaves(params):
        a = np.ascontiguousarray(np.asarray(leaf))
        h.update(a.dtype.str.encode())
        h.update(str(a.shape).encode())
        h.update(a.tobytes())
    key = h.hexdigest()
    if key in _ORACLE_CACHE:
        return _ORACLE_CACHE[key]

    cache_dir = os.environ.get("BENCH_ORACLE_CACHE", "/root/.allegro_oracle")
    cache_file = os.path.join(cache_dir, f"{key}.npy")
    if os.path.exists(cache_file):
        f64 = np.load(cache_file)
        _ORACLE_CACHE[key] = f64
        return f64

    with tempfile.TemporaryDirectory() as td:
        pfile = os.path.join(td, "params.npz")
        ofile = os.path.join(td, "forces.npy")
        _save_pytree(pfile, params)
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["JAX_ENABLE_X64"] = "true"
        env["BENCH_ORACLE_N"] = str(n_atoms)
        proc = subprocess.run(
            [sys.executable, "-m", "allegro_tpu.bench", "--oracle", pfile, ofile],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            env=env,
            capture_output=True,
            text=True,
            timeout=1200,
        )
        if proc.returncode != 0:
            raise RuntimeError(
                f"oracle subprocess failed rc={proc.returncode}:\n"
                + proc.stdout[-1500:] + proc.stderr[-1500:]
            )
        f64 = np.load(ofile)
    _ORACLE_CACHE[key] = f64
    try:
        os.makedirs(cache_dir, exist_ok=True)
        # np.save APPENDS ".npy" to paths without it — name the tmp file
        # *.npy so os.replace finds it (the r4 form silently never installed
        # the cache and every driver run re-paid the ~60s oracle subprocess)
        tmp = cache_file + f".{os.getpid()}.tmp.npy"
        np.save(tmp, f64)
        os.replace(tmp, cache_file)
    except OSError:
        pass  # disk cache is best-effort
    return f64


def _oracle_main(params_file, out_file):
    """Subprocess body: f64 einsum forces on CPU with the saved params."""
    import sys as _sys

    _sys.path = [p for p in _sys.path if ".axon_site" not in p]
    import jax

    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_default_matmul_precision", "highest")

    from allegro_tpu.data import batch_frames, keys, to_jax

    n = int(os.environ.get("BENCH_ORACLE_N", "512"))
    frame, n_atoms = _crystal_frame(n, 4.0, seed=7)
    n_edges = frame[keys.EDGE_INDEX].shape[1]
    batch = to_jax(batch_frames([frame], n_frames=1), dtype=np.float64)
    from allegro_tpu.model import AllegroModel

    model = AllegroModel(
        **_FLAGSHIP,
        avg_num_neighbors=n_edges / n_atoms,
        model_dtype="float64",
        tp_kernel_backend="einsum",
    )
    params = model.init(0, batch)
    params = _load_leaves_into(params, params_file)
    params = jax.tree.map(lambda x: np.asarray(x, np.float64), params)
    out = model.apply_with_derivatives(params, batch)
    np.save(out_file, np.asarray(out[keys.FORCES], np.float64))


def run_lmax3_subprocess(n_atoms, timeout=2400):
    """Run the l_max=3 bench in a CLEAN subprocess: a RESOURCE_EXHAUSTED at
    the O(l_max^6) 100k scale poisons the tunnel backend for every later
    stage of the same process (observed round 4) — isolation keeps the
    driver bench's remaining stages healthy."""
    env = dict(os.environ)
    env.pop("BENCH_SKIP_EXTRA", None)
    proc = subprocess.run(
        [sys.executable, "-m", "allegro_tpu.bench", "--lmax3", str(n_atoms)],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=timeout,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            (proc.stdout.strip().splitlines() or [""])[-1][-200:]
            + (proc.stderr.strip().splitlines() or [""])[-1][-200:]
        )
    return float(proc.stdout.strip().splitlines()[-1])


def run_bench_subprocess(n_atoms, timeout=1800, env_extra=None):
    """Run ``run_benchmark`` (headline-only, no trace) in a CLEAN subprocess
    and return its result dict. For bench stages that probe the single-chip
    memory ceiling: an OOM inside this process would poison the tunnel
    backend for every later stage (observed round 4), so isolation + a hard
    timeout keep the record safe. Inherits ``ALLEGRO_CHIP_LOCK_HELD`` so the
    child shares the chip lock re-entrantly."""
    env = dict(os.environ)
    env["BENCH_SKIP_EXTRA"] = "1"
    env["BENCH_TRACE"] = "0"
    env["BENCH_N_ATOMS"] = str(int(n_atoms))
    env.update(env_extra or {})
    proc = subprocess.run(
        [sys.executable, "-m", "allegro_tpu.bench"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=timeout,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"bench subprocess rc={proc.returncode}: "
            + (proc.stdout.strip().splitlines() or [""])[-1][-200:]
            + (proc.stderr.strip().splitlines() or [""])[-1][-200:]
        )
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except ValueError:
            continue
    raise RuntimeError("bench subprocess printed no JSON line")


def _setup_compile_cache():
    import jax as _jax

    os.makedirs("/root/.jax_cache", exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


if __name__ == "__main__":
    if "--oracle" in sys.argv:
        i = sys.argv.index("--oracle")
        _oracle_main(sys.argv[i + 1], sys.argv[i + 2])
        sys.exit(0)
    _setup_compile_cache()
    if "--streamed" in sys.argv:
        i = sys.argv.index("--streamed")
        n = int(sys.argv[i + 1])
        k = int(sys.argv[i + 2]) if len(sys.argv) > i + 2 else 8
        print(json.dumps(run_streamed_benchmark(n_atoms=n, n_chunks=k,
                                                verbose="-v" in sys.argv)))
        sys.exit(0)
    if "--lmax3" in sys.argv:
        i = sys.argv.index("--lmax3")
        n = int(sys.argv[i + 1])
        print(run_lmax3_bench(n_atoms=n, iters=10 if n > 20000 else 40))
        sys.exit(0)
    verbose = "-v" in sys.argv
    n = int(os.environ.get("BENCH_N_ATOMS", "4096"))
    result = run_benchmark(n_atoms=n, verbose=verbose)
    if os.environ.get("BENCH_SKIP_EXTRA", "0") != "1":
        try:
            result["extra"]["train_samples_per_sec"] = round(
                run_train_bench(verbose=verbose), 2
            )
        except Exception as e:  # keep the headline metric even if a stage dies
            result["extra"]["train_samples_per_sec_error"] = str(e)[:300]
        try:
            mae, rel = run_parity(verbose=verbose)
            result["extra"]["force_mae_vs_f64"] = float(f"{mae:.3e}")
            result["extra"]["force_mae_vs_f64_rel"] = float(f"{rel:.3e}")
        except Exception as e:
            result["extra"]["force_mae_error"] = str(e)[:300]
    print(json.dumps(result))
