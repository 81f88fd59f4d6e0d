#!/bin/bash
# Wait for the TPU tunnel to recover, then run the round-3 perf matrix.
# Intended to run unattended in tmux: scripts/wait_and_matrix.sh [outfile]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/perf_matrix.log}"
STATUS=/tmp/tunnel_status.log
: > "$STATUS"

for i in $(seq 1 300); do
  if timeout 240 python - <<'EOF' 2>/dev/null
import jax
d = jax.devices()
assert d and d[0].platform != "cpu", d
print("tpu up:", d)
EOF
  then
    echo "$(date -Is) tunnel UP (attempt $i) — running perf matrix" >> "$STATUS"
    bash scripts/perf_matrix.sh "$OUT"
    echo "$(date -Is) perf matrix done" >> "$STATUS"
    exit 0
  fi
  echo "$(date -Is) tunnel still down (attempt $i)" >> "$STATUS"
  sleep 240
done
echo "$(date -Is) gave up" >> "$STATUS"
exit 1
