"""Driver benchmark entry point: prints ONE JSON line.

Implementation lives in allegro_tpu.bench (usable from the CLI as the
`benchmark` stage too). The JSON carries the headline µs/atom/step metric
plus the other BASELINE.md metrics (train samples/sec, force-MAE parity vs
the f64 oracle) in the "extra" block.
"""

import json
import os
import sys

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
# dots (XLA MLPs AND the in-kernel mega/readout MLPs — the round-4 trace
# showed the in-kernel HIGHEST dots dominating the mega kernels). Measured
# headline-policy force parity vs f64: 9.2e-7 abs / 2.7e-5 rel — under the
# reference's f32 tolerance of 5e-5 on both counts
# (/root/reference/tests/model/test_allegro.py:72-74). Exact-3-pass +
# "highest" parity is ALSO reported each run (force_mae_vs_f64_exact*).
# Override with BENCH_PRECISION=highest.
os.environ.setdefault("BENCH_PRECISION", "high")

from allegro_tpu.bench import (
    run_benchmark,
    run_kernel_smoke,
    run_lmax3_bench,
    run_parity,
    run_train_bench,
    run_train_bench_1k,
    run_train_stress_bench,
)
from allegro_tpu.ops import fused_tp as _fused_tp
from allegro_tpu.utils.chiplock import chip_lock

# explicit setter, not env-var import-order coupling (ADVICE r3)
_fused_tp.set_onehot_passes(HEADLINE_ONEHOT_PASSES)

def _benchmark_with_fallback(n_atoms, verbose):
    """Headline bench; if the mega-kernel path fails on this chip/toolchain
    (it is gated by env, not params), fall back to the plain fused kernels so
    the driver still records a number."""
    try:
        return run_benchmark(n_atoms=n_atoms, verbose=verbose)
    except Exception as e:
        if os.environ.get("ALLEGRO_NO_MEGA") == "1":
            if os.environ.get("ALLEGRO_NO_FUSED_READOUT") == "1":
                raise
            sys.stderr.write(
                f"fused path failed again ({e!r}); retrying "
                "ALLEGRO_NO_FUSED_READOUT=1\n"
            )
            os.environ["ALLEGRO_NO_FUSED_READOUT"] = "1"
            out = run_benchmark(n_atoms=n_atoms, verbose=verbose)
            out["extra"]["readout_fallback_error"] = str(e)[:300]
            return out
        sys.stderr.write(f"mega path failed ({e!r}); retrying ALLEGRO_NO_MEGA=1\n")
        os.environ["ALLEGRO_NO_MEGA"] = "1"
        out = _benchmark_with_fallback(n_atoms, verbose)
        out["extra"]["mega_fallback_error"] = str(e)[:300]
        return out


if __name__ == "__main__":
    verbose = "-v" in sys.argv
    n = int(os.environ.get("BENCH_N_ATOMS", "4096"))
    with chip_lock(timeout=7200):  # serialize vs real-chip tests / other runs
        # on-silicon kernel smoke tier FIRST: Mosaic-compiles the whole fused
        # family at flagship block shapes and checks force parity vs the
        # einsum backend on this chip — a kernel regression fails loudly here
        # instead of silently downgrading the headline via the env fallbacks
        smoke = None
        try:
            run_kernel_smoke(verbose=verbose)
            smoke = "ok"
        except Exception as e:
            smoke = f"FAILED: {str(e)[:200]}"
            sys.stderr.write(f"KERNEL SMOKE FAILED: {e!r}\n")
        result = _benchmark_with_fallback(n, verbose)
        result["extra"]["kernel_smoke"] = smoke
        if os.environ.get("BENCH_SKIP_EXTRA", "0") != "1":
            try:
                # the BASELINE.md headline metric is defined AT 100k atoms —
                # record the north-star system size in the same JSON line
                # (bf16 tensor-track storage auto-selected; its force
                # accuracy is pinned by tests/model/test_bf16_storage.py)
                big = _benchmark_with_fallback(100000, verbose)
                result["extra"]["us_per_atom_100k"] = big["value"]
                result["extra"]["n_atoms_100k"] = big["extra"]["n_atoms"]
                result["extra"]["step_ms_100k"] = big["extra"]["step_ms"]
                result["extra"]["tensor_dtype_100k"] = big["extra"]["tensor_dtype"]
            except Exception as e:  # keep the headline even if a stage dies
                result["extra"]["us_per_atom_100k_error"] = str(e)[:300]
            try:
                # the largest EXACT-f32-track system this chip fits (the 100k
                # headline uses bf16 tensor-track storage — whose policy's
                # reference-criterion parity is reported below; f32 compiles
                # up to ~74k atoms on 16 GB, measured round 4)
                os.environ["BENCH_TENSOR_DTYPE"] = "float32"
                r74 = run_benchmark(n_atoms=74000, verbose=verbose)
                result["extra"]["us_per_atom_74k_f32"] = r74["value"]
            except Exception as e:
                result["extra"]["us_per_atom_74k_f32_error"] = str(e)[:300]
            finally:
                os.environ.pop("BENCH_TENSOR_DTYPE", None)
            try:
                result["extra"]["train_samples_per_sec"] = round(
                    run_train_bench(verbose=verbose), 2
                )
            except Exception as e:
                result["extra"]["train_samples_per_sec_error"] = str(e)[:300]
            try:
                # BASELINE.json config 3: l_max=3 full-parity deep stack
                result["extra"]["us_per_atom_lmax3"] = round(
                    run_lmax3_bench(verbose=verbose), 4
                )
            except Exception as e:
                result["extra"]["us_per_atom_lmax3_error"] = str(e)[:300]
            # l_max=3 at scale (VERDICT r3 #8): try the 100k headline size,
            # fall back to smaller systems to report the single-chip CEILING
            # of the O(l_max^6) memory regime
            # (/root/reference/docs/guide/allegro_model.rst:13). Runs in a
            # clean subprocess: a RESOURCE_EXHAUSTED here poisons the tunnel
            # backend for every later stage of this process (observed r4).
            from allegro_tpu.bench import run_lmax3_subprocess

            for n3 in (100000, 50000, 27000):
                try:
                    result["extra"][f"us_per_atom_lmax3_{n3 // 1000}k"] = round(
                        run_lmax3_subprocess(n3), 4
                    )
                    break
                except Exception as e:
                    result["extra"][f"us_per_atom_lmax3_{n3 // 1000}k_error"] = (
                        str(e)[:200]
                    )
            try:
                # BASELINE.json config 2: multi-species periodic + stress loss
                result["extra"]["train_stress_samples_per_sec"] = round(
                    run_train_stress_bench(verbose=verbose), 2
                )
            except Exception as e:
                result["extra"]["train_stress_samples_per_sec_error"] = str(e)[:300]
            try:
                # production-scale training: 1k-atom periodic cells, batch 4
                result["extra"]["train_samples_per_sec_1k"] = round(
                    run_train_bench_1k(verbose=verbose), 2
                )
            except Exception as e:
                result["extra"]["train_samples_per_sec_1k_error"] = str(e)[:300]
            try:
                # parity under the HEADLINE policy (what the µs/atom numbers
                # above actually ran with)...
                mae, rel = run_parity(
                    verbose=verbose, onehot_passes=HEADLINE_ONEHOT_PASSES
                )
                result["extra"]["force_mae_vs_f64"] = float(f"{mae:.3e}")
                result["extra"]["force_mae_vs_f64_rel"] = float(f"{rel:.3e}")
            except Exception as e:
                result["extra"]["force_mae_error"] = str(e)[:300]
            if HEADLINE_ONEHOT_PASSES != 3 or os.environ["BENCH_PRECISION"] != "highest":
                try:
                    # ...AND under the fully exact policy (3-pass one-hot +
                    # HIGHEST dots), so regressions in the exact path stay
                    # visible (VERDICT r3 weak #2)
                    mae3, rel3 = run_parity(
                        verbose=verbose, onehot_passes=3, precision="highest"
                    )
                    result["extra"]["force_mae_vs_f64_exact"] = float(f"{mae3:.3e}")
                    result["extra"]["force_mae_vs_f64_exact_rel"] = float(
                        f"{rel3:.3e}"
                    )
                except Exception as e:
                    result["extra"]["force_mae_exact_error"] = str(e)[:300]
            try:
                # qualify the 100k-atom policy (bf16 tensor-track storage +
                # the headline passes/precision) against the reference's own
                # acceptance criterion: elementwise allclose at
                # rtol = atol = 5e-5 (VERDICT r3 #2)
                from allegro_tpu.bench import run_policy_parity

                result["extra"]["policy_parity_bf16_track"] = run_policy_parity(
                    tensor_dtype="bfloat16",
                    onehot_passes=HEADLINE_ONEHOT_PASSES,
                    verbose=verbose,
                )
            except Exception as e:
                result["extra"]["policy_parity_bf16_track_error"] = str(e)[:300]
    print(json.dumps(result))
