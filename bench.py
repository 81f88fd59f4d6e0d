"""Driver benchmark entry point: prints the metric JSON line (last line wins).

Implementation lives in allegro_tpu.bench (usable from the CLI as the
`benchmark` stage too). The JSON carries the headline µs/atom/step metric
plus the other BASELINE.md metrics (train samples/sec, force-MAE parity vs
the f64 oracle, the 100k-atom north-star size) in the "extra" block.

Budget discipline (round-4 postmortem: the driver killed a 30+ min serial
pipeline at rc=124 and the single end-of-run JSON line was lost — the round
recorded NOTHING):

- The headline 4k stage runs first and its JSON line is printed and flushed
  IMMEDIATELY. Every later stage is optional enrichment.
- After each completed extra stage an updated superset JSON line is printed
  (the driver parses the LAST JSON line, so a kill at any point keeps
  everything completed so far).
- A global deadline (``BENCH_BUDGET_S``, default 1200 s) is checked before
  each stage against that stage's estimated cost; stages that don't fit are
  skipped and recorded as such in ``extra.stages``.
- Stages that can poison the tunnel backend on OOM (the big-system f32 and
  l_max=3 configurations) run in clean subprocesses with their own timeouts.
"""

import json
import os
import sys
import time

T_START = time.time()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1200"))


def _remaining():
    return BUDGET_S - (time.time() - T_START)


def _log(msg):
    sys.stderr.write(f"[bench +{time.time() - T_START:7.1f}s] {msg}\n")
    sys.stderr.flush()


# persistent compilation cache: repeated driver runs skip the (minutes-long)
# remote XLA compile
try:
    import jax

    os.makedirs("/root/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

# Headline precision policy: the driver bench runs the one-hot MXU products
# with the 2-pass bf16 split (~7.6e-6 relative force error — 6x tighter than
# the reference's own f32 compiled-model tolerance of 5e-5,
# /root/reference/tests/model/test_allegro.py:72-74) instead of the exact
# 3-pass split. The library default stays exact; this is recorded in the
# JSON "extra" block and the force-MAE parity below is measured under BOTH
# settings. Override with ALLEGRO_ONEHOT_PASSES=3.
HEADLINE_ONEHOT_PASSES = int(os.environ.get("ALLEGRO_ONEHOT_PASSES", "2"))

# Headline matmul policy: "high" = explicit 3-pass bf16 split for the model's
# dots (XLA MLPs AND the in-kernel mega/readout MLPs). Measured headline-
# policy force parity vs f64: 9.2e-7 abs / 2.7e-5 rel — under the reference's
# f32 tolerance of 5e-5 on both counts
# (/root/reference/tests/model/test_allegro.py:72-74). Exact-3-pass +
# "highest" parity is ALSO reported each run (force_mae_vs_f64_exact*).
# Override with BENCH_PRECISION=highest.
os.environ.setdefault("BENCH_PRECISION", "high")

from allegro_tpu.bench import (  # noqa: E402
    run_bench_subprocess,
    run_benchmark,
    run_kernel_smoke,
    run_lmax3_bench,
    run_lmax3_subprocess,
    run_parity,
    run_policy_parity,
    run_streamed_subprocess,
    run_train_bench,
    run_train_bench_1k,
    run_train_stress_bench,
)
from allegro_tpu.ops import fused_tp as _fused_tp  # noqa: E402
from allegro_tpu.utils.chiplock import chip_lock  # noqa: E402

# explicit setter, not env-var import-order coupling (ADVICE r3)
_fused_tp.set_onehot_passes(HEADLINE_ONEHOT_PASSES)


def _benchmark_with_fallback(n_atoms, verbose):
    """Headline bench; if the mega-kernel path fails on this chip/toolchain,
    fall back to the plain fused kernels so the driver still records a
    number. Each retry flips an explicit builder kwarg via env default and
    records the flip in the JSON (never silently changes the metric)."""
    try:
        return run_benchmark(n_atoms=n_atoms, verbose=verbose)
    except Exception as e:
        if os.environ.get("ALLEGRO_NO_MEGA") == "1":
            if os.environ.get("ALLEGRO_NO_FUSED_READOUT") == "1":
                raise
            _log(f"fused path failed again ({e!r}); retrying ALLEGRO_NO_FUSED_READOUT=1")
            os.environ["ALLEGRO_NO_FUSED_READOUT"] = "1"
            out = run_benchmark(n_atoms=n_atoms, verbose=verbose)
            out["extra"]["readout_fallback_error"] = str(e)[:300]
            return out
        _log(f"mega path failed ({e!r}); retrying ALLEGRO_NO_MEGA=1")
        os.environ["ALLEGRO_NO_MEGA"] = "1"
        out = _benchmark_with_fallback(n_atoms, verbose)
        out["extra"]["mega_fallback_error"] = str(e)[:300]
        return out


# ---------------------------------------------------------------------------
# Stage registry (VERDICT r4 #10): each extra stage declares
# (name, estimated_cost_s, fn). fn(result, verbose, budget_s) mutates
# result["extra"]. A stage only STARTS if the remaining global budget covers
# its estimate; subprocess stages additionally pass the remaining budget as
# their hard timeout. Cost estimates are cold-cache worst cases; with the
# warm persistent XLA cache, stages run in seconds.
# ---------------------------------------------------------------------------


def _stage_100k(result, verbose, budget_s):
    # the BASELINE.md headline metric is defined AT 100k atoms — record the
    # north-star system size in the same JSON line (bf16 tensor-track storage
    # auto-selected; its reference-criterion parity is recorded by the
    # policy_parity_bf16_track stage below)
    big = _benchmark_with_fallback(100000, verbose)
    result["extra"]["us_per_atom_100k"] = big["value"]
    result["extra"]["n_atoms_100k"] = big["extra"]["n_atoms"]
    result["extra"]["step_ms_100k"] = big["extra"]["step_ms"]
    result["extra"]["tensor_dtype_100k"] = big["extra"]["tensor_dtype"]


def _stage_policy_parity(result, verbose, budget_s):
    # qualify the 100k-atom policy (bf16 tensor-track storage + the headline
    # passes/precision) against the reference's own acceptance criterion:
    # elementwise allclose at rtol = atol = 5e-5
    # (/root/reference/tests/model/test_allegro.py:72-74)
    result["extra"]["policy_parity_bf16_track"] = run_policy_parity(
        tensor_dtype="bfloat16",
        onehot_passes=HEADLINE_ONEHOT_PASSES,
        verbose=verbose,
    )


def _stage_4k_bf16(result, verbose, budget_s):
    # the 4k flagship with bf16 tensor-track storage: the f32 headline step
    # is bandwidth-saturated (roofline_frac ~1.1), so halving the tensor
    # track's bytes is the one remaining traffic lever; its 5e-5
    # reference-criterion parity is recorded by policy_parity_bf16_track.
    # Clean subprocess (no trace) so the headline's program stays untouched.
    r = run_bench_subprocess(
        4096,
        timeout=budget_s,
        env_extra={"BENCH_TENSOR_DTYPE": "bfloat16"},
    )
    result["extra"]["us_per_atom_4k_bf16"] = r["value"]
    result["extra"]["step_ms_4k_bf16"] = r["extra"]["step_ms"]


def _stage_train(result, verbose, budget_s):
    result["extra"]["train_samples_per_sec"] = round(
        run_train_bench(verbose=verbose), 2
    )


def _stage_parity(result, verbose, budget_s):
    # parity under the HEADLINE policy (what the µs/atom numbers actually
    # ran with)
    mae, rel = run_parity(verbose=verbose, onehot_passes=HEADLINE_ONEHOT_PASSES)
    result["extra"]["force_mae_vs_f64"] = float(f"{mae:.3e}")
    result["extra"]["force_mae_vs_f64_rel"] = float(f"{rel:.3e}")


def _stage_parity_exact(result, verbose, budget_s):
    # ...AND under the fully exact policy (3-pass one-hot + HIGHEST dots),
    # so regressions in the exact path stay visible (VERDICT r3 weak #2)
    if HEADLINE_ONEHOT_PASSES == 3 and os.environ["BENCH_PRECISION"] == "highest":
        return
    mae3, rel3 = run_parity(verbose=verbose, onehot_passes=3, precision="highest")
    result["extra"]["force_mae_vs_f64_exact"] = float(f"{mae3:.3e}")
    result["extra"]["force_mae_vs_f64_exact_rel"] = float(f"{rel3:.3e}")


def _stage_smoke(result, verbose, budget_s):
    # on-silicon kernel smoke tier: Mosaic-compiles the whole fused family at
    # flagship block shapes and checks force parity vs the einsum backend on
    # this chip. Runs AFTER the headline (round-4 lesson: the record comes
    # first); a failure here still lands loudly in the JSON, and any silent
    # headline downgrade is already visible via the mega/fused_readout flags.
    result["extra"]["kernel_smoke"] = run_kernel_smoke(verbose=verbose)


def _stage_lmax3(result, verbose, budget_s):
    # BASELINE.json config 3: l_max=3 full-parity deep stack — the
    # O(l_max^6) stress case (/root/reference/docs/guide/allegro_model.rst:13)
    result["extra"]["us_per_atom_lmax3"] = round(run_lmax3_bench(verbose=verbose), 4)


def _stage_74k_f32(result, verbose, budget_s):
    # the largest EXACT-f32-track system this chip fits (the 100k headline
    # uses bf16 tensor-track storage; f32 compiles up to ~74k atoms on
    # 16 GB, measured round 4). Clean subprocess: a RESOURCE_EXHAUSTED here
    # poisons the tunnel backend for every later stage (observed r4).
    r74 = run_bench_subprocess(
        74000,
        timeout=budget_s,
        env_extra={"BENCH_TENSOR_DTYPE": "float32"},
    )
    result["extra"]["us_per_atom_74k_f32"] = r74["value"]


def _stage_100k_f32_streamed(result, verbose, budget_s):
    # the 100k-atom north-star at EXACT f32 storage (VERDICT r4 #3): the
    # monolithic f32 step compile-OOMs at ~97k on 16 GB; the center-chunked
    # streaming evaluator bounds peak activation memory to ~1/K with
    # arithmetic identical to the monolithic step (strict locality —
    # tests/md/test_streaming.py). Clean subprocess (OOM isolation).
    r = run_streamed_subprocess(100000, n_chunks=8, timeout=budget_s)
    result["extra"]["us_per_atom_100k_f32_streamed"] = r["us_per_atom"]
    result["extra"]["streamed_n_chunks"] = r["n_chunks"]


def _stage_lmax3_scale(result, verbose, budget_s):
    # l_max=3 at scale (VERDICT r3 #8): try the 100k headline size, fall back
    # to smaller systems to report the single-chip CEILING of the O(l_max^6)
    # memory regime. Clean subprocess per attempt (OOM isolation).
    t0 = time.time()
    for n3 in (100000, 50000, 27000):
        left = budget_s - (time.time() - t0)
        if left < 60:
            result["extra"][f"us_per_atom_lmax3_{n3 // 1000}k_error"] = (
                "skipped (stage budget)"
            )
            continue
        try:
            result["extra"][f"us_per_atom_lmax3_{n3 // 1000}k"] = round(
                run_lmax3_subprocess(n3, timeout=left), 4
            )
            break
        except Exception as e:
            result["extra"][f"us_per_atom_lmax3_{n3 // 1000}k_error"] = str(e)[:200]


def _stage_stress(result, verbose, budget_s):
    # BASELINE.json config 2: multi-species periodic + stress loss
    result["extra"]["train_stress_samples_per_sec"] = round(
        run_train_stress_bench(verbose=verbose), 2
    )


def _stage_train_1k(result, verbose, budget_s):
    # production-scale training: 1k-atom periodic cells, batch 4
    result["extra"]["train_samples_per_sec_1k"] = round(
        run_train_bench_1k(verbose=verbose), 2
    )


# (name, estimated cold-cache cost in seconds, fn) — priority order: the
# VERDICT-mandated record set first (100k, bf16-track reference parity,
# train samples/s, f64 parity), then the enrichment stages.
STAGES = [
    ("us_per_atom_100k", 300, _stage_100k),
    ("policy_parity_bf16_track", 180, _stage_policy_parity),
    ("us_per_atom_4k_bf16", 240, _stage_4k_bf16),
    ("train_samples_per_sec", 240, _stage_train),
    ("force_mae_vs_f64", 180, _stage_parity),
    ("force_mae_vs_f64_exact", 150, _stage_parity_exact),
    ("kernel_smoke", 200, _stage_smoke),
    ("us_per_atom_lmax3", 180, _stage_lmax3),
    ("us_per_atom_100k_f32_streamed", 300, _stage_100k_f32_streamed),
    ("us_per_atom_74k_f32", 280, _stage_74k_f32),
    ("us_per_atom_lmax3_at_scale", 300, _stage_lmax3_scale),
    ("train_stress_samples_per_sec", 200, _stage_stress),
    ("train_samples_per_sec_1k", 260, _stage_train_1k),
]


def main():
    verbose = "-v" in sys.argv
    n = int(os.environ.get("BENCH_N_ATOMS", "4096"))

    # serialize vs real-chip tests / other runs — but never let a stale lock
    # eat the whole budget: 10-minute cap, then proceed loudly (flock is
    # advisory and auto-releases on holder death; a >10-min live holder is
    # indistinguishable from a wedged one, and recording a possibly-noisy
    # number beats recording nothing)
    lock = chip_lock(timeout=min(600.0, max(BUDGET_S / 2, 60.0)))
    try:
        lock.__enter__()
    except TimeoutError as e:
        _log(f"CHIP LOCK NOT ACQUIRED ({e}); proceeding unlocked")

    # once the headline VALUE exists, its enrichment blocks (fwd split, copy
    # roofline, cost analysis, trace) may not eat more than half the global
    # budget — the stage registry below carries the VERDICT-mandated record
    os.environ.setdefault("BENCH_HEADLINE_DEADLINE_S", str(int(BUDGET_S * 0.5)))

    _log(f"budget {BUDGET_S:.0f}s; headline stage (n_atoms={n}) starting")
    result = _benchmark_with_fallback(n, verbose)
    stages_report = {"headline": "ok"}
    result["extra"]["stages"] = stages_report
    # the record exists from this moment on — everything below only enriches
    print(json.dumps(result), flush=True)
    _log(f"headline landed: {result['value']} us/atom")

    if os.environ.get("BENCH_SKIP_EXTRA", "0") == "1":
        return

    for name, est_cost, fn in STAGES:
        left = _remaining()
        if left < est_cost:
            stages_report[name] = f"skipped (budget: {left:.0f}s left < {est_cost}s est)"
            _log(f"skip {name}: {left:.0f}s left < {est_cost}s estimated")
            continue
        _log(f"stage {name} starting ({left:.0f}s left)")
        t0 = time.time()
        try:
            fn(result, verbose, left)
            stages_report[name] = f"ok ({time.time() - t0:.0f}s)"
        except Exception as e:  # keep the record even if a stage dies
            stages_report[name] = f"error ({time.time() - t0:.0f}s)"
            result["extra"][f"{name}_error"] = str(e)[:300]
            _log(f"stage {name} FAILED: {e!r}")
        # updated superset line after every stage — last line wins
        print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
