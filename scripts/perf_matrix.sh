#!/bin/bash
# Perf matrix for round-3 changes (runs unattended; each line = one config).
# Usage: scripts/perf_matrix.sh [outfile]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/perf_matrix.log}"
: > "$OUT"

run() {
  label="$1"; shift
  echo "=== $label" >> "$OUT"
  env "$@" BENCH_SKIP_EXTRA=1 timeout 3600 python bench.py >> "$OUT" 2>/dev/null
  echo >> "$OUT"
}

run "mega 4k (default)"
run "mega 4k precision=high" BENCH_PRECISION=high
run "mega 4k eb=64" ALLEGRO_FUSED_EB=64
run "mega 4k eb=256" ALLEGRO_FUSED_EB=256
run "mega 4k onehot=3 (exact-f32 ablation; bench default is 2)" ALLEGRO_ONEHOT_PASSES=3
run "no-mega 4k (ablation)" ALLEGRO_NO_MEGA=1
run "no-fused-readout 4k (ablation)" ALLEGRO_NO_FUSED_READOUT=1
run "mega 100k" BENCH_N_ATOMS=100000
run "mega 100k eb=64" BENCH_N_ATOMS=100000 ALLEGRO_FUSED_EB=64
run "mega 100k onehot=2 precision=high" BENCH_N_ATOMS=100000 ALLEGRO_ONEHOT_PASSES=2 BENCH_PRECISION=high
echo "=== parity (mega, f32 vs f64 oracle)" >> "$OUT"
timeout 3600 python - >> "$OUT" 2>/dev/null <<'EOF'
from allegro_tpu.bench import run_parity
mae, rel = run_parity()
print(f'{{"force_mae_vs_f64": {mae:.3e}, "rel": {rel:.3e}}}')
EOF
echo "=== parity (onehot=2, f32 vs f64 oracle)" >> "$OUT"
ALLEGRO_ONEHOT_PASSES=2 timeout 3600 python - >> "$OUT" 2>/dev/null <<'EOF'
from allegro_tpu.bench import run_parity
mae, rel = run_parity()
print(f'{{"force_mae_vs_f64": {mae:.3e}, "rel": {rel:.3e}}}')
EOF
echo "=== feature-major kernel race (probe_fm)" >> "$OUT"
timeout 1800 python scripts/probe_fm.py >> "$OUT" 2>/dev/null
echo "=== trace breakdown (4k, fused_infer)" >> "$OUT"
timeout 1800 python scripts/trace_breakdown.py >> "$OUT" 2>/dev/null
echo "done" >> "$OUT"
