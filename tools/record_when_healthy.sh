#!/bin/bash
# Wait for a healthy tunnel window (canary: 30 warm frame_steps must run
# under the threshold), then run the full-resolution record suite once.
# Usage: tools/record_when_healthy.sh <out_dir> [threshold_ms] [max_tries]
set -u
OUT=${1:-/root/eval_r5_final}
THRESH=${2:-60}
TRIES=${3:-40}
cd "$(dirname "$0")/.."
for i in $(seq 1 "$TRIES"); do
  ms=$(timeout 600 python tools/canary.py 2>/dev/null | tail -1)
  echo "try $i: canary ${ms:-fail} ms (threshold $THRESH)" >&2
  if [ -n "${ms:-}" ] && python -c "import sys; sys.exit(0 if float('$ms') < $THRESH else 1)"; then
    exec timeout 9000 python -m cvo_slam_tpu.eval.suite --out "$OUT" \
      --results-md "$OUT/RESULTS.md"
  fi
  sleep 180
done
echo "no healthy window found after $TRIES tries" >&2
exit 1
