#!/bin/bash
# Round-5 queue, part B — continues scripts/r5_artifact_queue.sh after the
# full-resolution-variant diagnosis.  The r5a vgg-F run trained (loss well
# below the zero-output plateau) but converged to the channel-confused
# degenerate solution: every belief channel emits the same arm-region blob
# cluster, which the score-gap disambiguation rejects -> zero detections.
# Root cause: the target-only weighted-MSE makes false-positive mass cost
# weight 1, and at 400x400 the degenerate fit is within ~2e-3 of perfect.
# Fix (network._weighted_mse_loss(symmetric=True), --loss-sym): weight by
# max(target, stop_grad(pred)) so FP mass pays pos_weight x; optimum
# unchanged.
#
# Stage order: a short vgg-F probe validates the fixed loss first (~12 min),
# then the certain-value stages (vgg-Q stage-3 margin, baxter rescale), then
# the full F-variant runs on 2048 frames.
#
# Usage: nohup bash scripts/r5b_artifact_queue.sh > _scratch/r5/queue_b.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
S4=_scratch/r4
S=_scratch/r5
R5=trained_models/results_r5
mkdir -p "$S" "$R5"

stage() { # name cmd...
  local name="$1"; shift
  if [ -f "$S/$name.DONE" ]; then echo "== $name: done, skip"; return 0; fi
  echo "== $name: start $(date -u +%H:%M:%S)"
  if "$@" > "$S/$name.log" 2>&1; then
    touch "$S/$name.DONE"; echo "== $name: OK $(date -u +%H:%M:%S)"
  else
    echo "== $name: FAILED (see $S/$name.log)"; return 1
  fi
}

TRAIN="python scripts/train_network.py -m manip_configs/panda.yaml -b 32 \
  -lr 2e-4 --grad-clip-norm 1.0 --cache-device \
  --compute-dtype bfloat16 --valid-every 5 --checkpoint-every 50 -f"

# --- 0. short vgg-F probe of the symmetric loss (keep/iterate decision) ----
stage vggf_probe $TRAIN --loss-pos-weight 800 --loss-sym \
  -ar arch_configs/dream_vgg_f.yaml \
  -i "$S4/d768" -e 60 --lr-decay-steps 1200 \
  --init-encoder "$S4/vggq_s2/best_network.msgpack" -o "$S/vggf_probe"

# --- 1. vgg-Q stage-3 fine-tune for flagship margin (VERDICT r4 #6) ----------
stage vggq_s3 $TRAIN --loss-pos-weight 50 -ar arch_configs/dream_vgg_q.yaml \
  -i "$S4/mix4096" -e 150 --lr-decay-steps 15450 -lr 1e-4 --ema-decay 0.999 \
  --init-params "$S4/vggq_s2/best_network.msgpack" -o "$S/vggq_s3" \
  && stage ckpt_vggq_r5 bash -c "mkdir -p $R5/vggq && \
    python scripts/compress_checkpoint.py $S/vggq_s3/best_network_ema.msgpack \
      $R5/vggq/dream_vgg_q_r5.msgpack $R5/vggq/dream_vgg_q_r5.yaml" \
  && stage eval_vggq_r5 bash -c "python scripts/network_inference_dataset.py \
    -i $R5/vggq/dream_vgg_q_r5.msgpack -d $S4/hold64 -o $S/eval_vggq_r5 \
    --no-visualization -f && mkdir -p $R5/eval_vggq_r5 && \
    cp $S/eval_vggq_r5/analysis_results.txt $S/eval_vggq_r5/*.csv $R5/eval_vggq_r5/"

# --- 2. baxter at quality (VERDICT r4 #4) ------------------------------------
gen_robot() { # robot out n seed extra...
  local robot="$1" out="$2" n="$3" seed="$4"; shift 4
  [ -d "$out" ] && [ -f "$out/_camera_settings.json" ] && return 0
  python scripts/make_synthetic_dataset.py -m "manip_configs/$robot.yaml" \
    -o "$out" -n "$n" --seed "$seed" "$@"
}
stage baxter_d2048 gen_robot baxter "$S/baxter_d2048"  2048 63
stage baxter_hchk  gen_robot baxter "$S4/baxter_hold64" 64  96 --holdout

stage baxter_rs $TRAIN --loss-pos-weight 50 -ar arch_configs/dream_resnet_h.yaml \
  -m manip_configs/baxter.yaml -i "$S/baxter_d2048" -e 200 \
  --lr-decay-steps 10200 --ema-decay 0.999 \
  --init-encoder "$S4/resnet_s2/best_network_ema.msgpack" -o "$S/baxter_rs" \
  && stage eval_baxter_r5 bash -c "python scripts/network_inference_dataset.py \
    -i $S/baxter_rs/best_network_ema.msgpack -d $S4/baxter_hold64 \
    -o $S/eval_baxter_r5 --no-visualization -f && mkdir -p $R5/eval_baxter_r5 && \
    cp $S/eval_baxter_r5/analysis_results.txt $S/eval_baxter_r5/*.csv \
       $R5/eval_baxter_r5/"

# --- 3. full-resolution variants with the symmetric loss ---------------------
stage vggf_train2 $TRAIN --loss-pos-weight 800 --loss-sym \
  -ar arch_configs/dream_vgg_f.yaml \
  -i "$S4/d2048" -e 300 --lr-decay-steps 15600 \
  --init-encoder "$S4/vggq_s2/best_network.msgpack" -o "$S/vggf_t2" \
  && stage eval_vggf2 bash -c "python scripts/network_inference_dataset.py \
    -i $S/vggf_t2/best_network.msgpack -d $S4/hold64 -o $S/eval_vggf2 \
    --no-visualization -f && mkdir -p $R5/eval_vggf && \
    cp $S/eval_vggf2/analysis_results.txt $S/eval_vggf2/*.csv $R5/eval_vggf/"

stage resnetf_train2 $TRAIN --loss-pos-weight 800 --loss-sym \
  -ar arch_configs/dream_resnet_f.yaml \
  -i "$S4/d2048" -e 300 --lr-decay-steps 15600 --ema-decay 0.999 \
  --init-encoder "$S4/resnet_s2/best_network_ema.msgpack" -o "$S/resnetf_t2" \
  && stage eval_resnetf2 bash -c "python scripts/network_inference_dataset.py \
    -i $S/resnetf_t2/best_network_ema.msgpack -d $S4/hold64 -o $S/eval_resnetf2 \
    --no-visualization -f && mkdir -p $R5/eval_resnetf && \
    cp $S/eval_resnetf2/analysis_results.txt $S/eval_resnetf2/*.csv $R5/eval_resnetf/"

echo "== r5b queue complete $(date -u +%H:%M:%S); evidence in $R5"
