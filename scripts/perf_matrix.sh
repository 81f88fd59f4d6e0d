#!/bin/bash
# Perf matrix (runs unattended; each line = one config). Round-4 edition:
# the bench defaults are the headline policy (onehot=2, precision=high);
# the matrix ablates each knob and records the exact-policy point.
# Usage: scripts/perf_matrix.sh [outfile]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/perf_matrix.log}"
: > "$OUT"

run() {
  label="$1"; shift
  echo "=== $label" >> "$OUT"
  env "$@" BENCH_SKIP_EXTRA=1 BENCH_TRACE=0 timeout 3600 python bench.py >> "$OUT" 2>/dev/null
  echo >> "$OUT"
}

run "4k headline (onehot=2 precision=high)"
run "4k exact (onehot=3 precision=highest)" ALLEGRO_ONEHOT_PASSES=3 BENCH_PRECISION=highest
run "4k precision=highest only" BENCH_PRECISION=highest
run "4k eb=256" ALLEGRO_FUSED_EB=256
run "4k no-mega (ablation)" ALLEGRO_NO_MEGA=1
run "4k no-fused-readout (ablation)" ALLEGRO_NO_FUSED_READOUT=1
run "100k headline (bf16 track)" BENCH_N_ATOMS=100000
run "100k exact-f32 track" BENCH_N_ATOMS=100000 BENCH_TENSOR_DTYPE=float32
echo "=== parity (headline vs exact, f32 vs f64 oracle)" >> "$OUT"
timeout 3600 python - >> "$OUT" 2>/dev/null <<'EOF'
from allegro_tpu.bench import run_parity
for name, passes, prec in (
    ("headline", 2, "high"),
    ("exact", 3, "highest"),
):
    mae, rel = run_parity(onehot_passes=passes, precision=prec)
    print(f'{{"policy": "{name}", "force_mae_vs_f64": {mae:.3e}, "rel": {rel:.3e}}}')
EOF
echo "=== trace breakdown (4k, fused_infer)" >> "$OUT"
timeout 1800 python scripts/trace_breakdown.py >> "$OUT" 2>/dev/null
echo "done" >> "$OUT"
