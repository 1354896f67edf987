#!/bin/bash
# Round-4 perf follow-on: waits for the artifact queue (one TPU process at a
# time — CLAUDE.md) to release the chip, then runs the int8 implementation
# profile (scripts/profile_breakdown.py — now covering the XLA fused-requant
# chain) and a full bench.py capture, harvesting both into the committed
# trained_models/results_r4/perf/ directory.
#
# Usage:  nohup bash scripts/r4_postqueue_perf.sh <queue_pid> \
#           > _scratch/r4_postqueue.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
QPID="${1:-}"
OUT=trained_models/results_r4/perf
mkdir -p "$OUT" _scratch/r4

if [ -n "$QPID" ]; then
  echo "== waiting for queue pid $QPID to exit ($(date -u +%H:%M:%S))"
  while kill -0 "$QPID" 2>/dev/null; do sleep 30; done
  echo "== queue done ($(date -u +%H:%M:%S)); chip free"
  sleep 10  # let the relay grant settle
fi

echo "== profile_breakdown start $(date -u +%H:%M:%S)"
if timeout 1800 python scripts/profile_breakdown.py \
    > "$OUT/profile_breakdown_r4.txt" 2>&1; then
  echo "== profile_breakdown OK $(date -u +%H:%M:%S)"
else
  echo "== profile_breakdown FAILED (see $OUT/profile_breakdown_r4.txt)"
fi

echo "== bench start $(date -u +%H:%M:%S)"
if timeout 3600 python bench.py > _scratch/r4/bench_r4b_full.log 2>&1; then
  tail -n 1 _scratch/r4/bench_r4b_full.log > "$OUT/bench_r4_capture.json"
  echo "== bench OK $(date -u +%H:%M:%S)"
else
  cp _scratch/r4/bench_r4b_full.log "$OUT/bench_r4_capture_FAILED.log"
  echo "== bench FAILED"
fi
echo "== postqueue perf complete $(date -u +%H:%M:%S)"
