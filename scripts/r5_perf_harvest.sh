#!/bin/bash
# Round-5 perf evidence harvest (run AFTER the artifact queues; one TPU
# process at a time).  Produces the committed int8-ceiling evidence
# (per-conv int8 MXU efficiency + stage breakdown) and a fresh bench
# capture with the train-batch sweep, under trained_models/results_r5/perf/.
set -e
cd "$(dirname "$0")/.."
P=trained_models/results_r5/perf
mkdir -p "$P"

echo "== profile_breakdown (stage + per-conv int8 + train batch sweep)"
python scripts/profile_breakdown.py 2>&1 | tee "$P/profile_breakdown_r5.txt"

echo "== bench capture"
python bench.py 2>&1 | tee "$P/bench_r5_capture.json"

echo "== done; commit $P"
