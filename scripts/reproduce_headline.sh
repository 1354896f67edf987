#!/bin/bash
# One-command reproduction of the committed headline accuracy table —
# NO retraining needed.  Regenerates the seed-pinned held-out datasets
# (dream_tpu/data/synthetic.py is deterministic per seed) and evaluates the
# committed float16-cast checkpoints under trained_models/results_r4/ with
# the reference's own metric definitions (PCK AUC 20 px / ADD AUC 0.1 m,
# plain EPnP+LM PnP — reference dream/analysis.py:858-994,
# dream/geometric_vision.py:40-113).
#
# Usage:  bash scripts/reproduce_headline.sh [output_dir]
# Runs on any jax backend (TPU ~2 min; CPU works too, just slower).
set -e
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/reproduce_headline}"
R4=trained_models/results_r4
mkdir -p "$OUT"

# Held-out sets (never seen by any training run; disjoint seeds).
python scripts/make_synthetic_dataset.py -m manip_configs/panda.yaml \
  -o "$OUT/holdout_clean_64" -n 64 --seed 99 --holdout
python scripts/make_synthetic_dataset.py -m manip_configs/panda.yaml \
  -o "$OUT/holdout_dr_64" -n 64 --seed 98 --holdout --domain-randomization

run_eval() { # name ckpt dataset extra...
  local name="$1" ckpt="$2" ds="$3"; shift 3
  echo "== $name"
  python scripts/network_inference_dataset.py -i "$ckpt" -d "$ds" \
    -o "$OUT/eval_$name" --no-visualization -f "$@"
}

R5=trained_models/results_r5
run_eval vggq_plain   "$R4/vggq/dream_vgg_q_r4.msgpack"        "$OUT/holdout_clean_64"
run_eval resnet_clean "$R4/resnet_h/dream_resnet_h_r4.msgpack" "$OUT/holdout_clean_64"
run_eval resnet_dr    "$R4/resnet_h/dream_resnet_h_r4.msgpack" "$OUT/holdout_dr_64"
# Round-5 artifacts (if present): the stage-3 fine-tuned flagship and the
# QAT-finetuned checkpoint deployed via int8 PTQ (DEMO.md round-5 table).
[ -f "$R5/vggq/dream_vgg_q_r5.msgpack" ] && \
  run_eval vggq_r5 "$R5/vggq/dream_vgg_q_r5.msgpack" "$OUT/holdout_clean_64"
[ -f "$R5/vggq_qat/dream_vgg_q_qat_r5.msgpack" ] && \
  run_eval vggq_qat_int8 "$R5/vggq_qat/dream_vgg_q_qat_r5.msgpack" \
    "$OUT/holdout_clean_64" --int8-calibration-frames 32

echo
echo "== Summary (reference published ADD AUC: 0.792, its README.md:67)"
for e in vggq_plain resnet_clean resnet_dr vggq_r5 vggq_qat_int8; do
  [ -f "$OUT/eval_$e/analysis_results.txt" ] || continue
  echo "--- $e (PCK AUC then ADD AUC)"
  grep "AUC: " "$OUT/eval_$e/analysis_results.txt" | grep -v threshold || true
done
echo "Committed evidence: $R4/eval_*/ and $R5/eval_*/analysis_results.txt"
