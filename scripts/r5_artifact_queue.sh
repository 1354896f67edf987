#!/bin/bash
# Round-5 artifact production queue — finishes what round 4 started
# (VERDICT.md round-4 items 1/3/4/6):
#
#   1. QAT qualification: re-run the qat fine-tune (its round-4 crash was a
#      real bug — bf16/f32 dtype mix in the QuantConv qat backward, fixed in
#      models/quant.py) and produce the float vs PTQ vs QAT+PTQ table on the
#      same holdout.
#   2. Working full-resolution variants: round 4's from-scratch vgg-F /
#      resnet-F runs sat on the zero-output plateau for all 120 epochs
#      (loss flat at 2.37e-3).  Root cause: the weighted-mse normalizer
#      sum(w) dilutes pos_weight by the output-area ratio — a 400x400 map
#      has 16x the zero-pixels of vgg-Q's 100x100, so pos_weight 50 acts
#      like ~3.  Fix: scale pos_weight by 16 (-> 800) AND warm-start the
#      encoder from the trained headline checkpoints (the stand-in for the
#      reference's ImageNet init, which is what rescues the reference's
#      own full-res runs — reference dream/models.py:587,22).
#   3. Flagship margin: one more vgg-Q fine-tune stage on the 4096-frame
#      clean+DR mix (the DEMO.md long recipe that reaches ~0.802 ADD AUC).
#   4. Baxter at quality: 17 keypoints on the resnet-H arch (the committed
#      family with accuracy headroom: 0.820-0.878 ADD) warm-started from
#      the resnet-H encoder, trained on 2048 frames instead of 768.
#
# Reuses the surviving _scratch/r4 datasets + checkpoints.  Idempotent via
# DONE markers under _scratch/r5.  ONE TPU process at a time: run alone.
#
# Usage: nohup bash scripts/r5_artifact_queue.sh > _scratch/r5/queue.log 2>&1 &
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

# Round-4 datasets must exist (they are deterministic per seed; regenerate
# any that a VM reboot wiped).
gen() { # out n seed extra...
  local out="$1" n="$2" seed="$3"; shift 3
  [ -d "$out" ] && [ -f "$out/_camera_settings.json" ] && return 0
  python scripts/make_synthetic_dataset.py -m manip_configs/panda.yaml \
    -o "$out" -n "$n" --seed "$seed" "$@"
}
stage d768_chk    gen "$S4/d768"     768  11 || exit 1
stage d2048_chk   gen "$S4/d2048"    2048 21 || exit 1
stage dr2048_chk  gen "$S4/dr2048"   2048 41 --domain-randomization || exit 1
stage hold64_chk  gen "$S4/hold64"   64   99 --holdout || exit 1

TRAIN="python scripts/train_network.py -m manip_configs/panda.yaml -b 32 \
  -lr 2e-4 --grad-clip-norm 1.0 --cache-device \
  --compute-dtype bfloat16 --valid-every 5 --checkpoint-every 50 -f"

# --- 1. QAT qualification (VERDICT r4 #3) -----------------------------------
stage qat_ft $TRAIN --loss-pos-weight 50 -ar arch_configs/dream_vgg_q.yaml \
  -i "$S4/d2048" -e 60 --lr-decay-steps 3120 -lr 5e-5 --quant-mode qat \
  --init-params "$S4/vggq_s2/best_network.msgpack" -o "$S/vggq_qat" \
  && stage eval_vggq_ptq bash -c "python scripts/network_inference_dataset.py \
    -i trained_models/results_r4/vggq/dream_vgg_q_r4.msgpack -d $S4/hold64 \
    -o $S/eval_vggq_ptq --no-visualization -f --int8-calibration-frames 32 && \
    mkdir -p $R5/eval_vggq_ptq && \
    cp $S/eval_vggq_ptq/analysis_results.txt $S/eval_vggq_ptq/*.csv $R5/eval_vggq_ptq/" \
  && stage eval_vggq_qat_int8 bash -c "python scripts/network_inference_dataset.py \
    -i $S/vggq_qat/best_network.msgpack -d $S4/hold64 -o $S/eval_vggq_qat_int8 \
    --no-visualization -f --int8-calibration-frames 32 && \
    mkdir -p $R5/eval_vggq_qat_int8 && \
    cp $S/eval_vggq_qat_int8/analysis_results.txt $S/eval_vggq_qat_int8/*.csv \
       $R5/eval_vggq_qat_int8/"

# --- 2a. vgg-F, fixed recipe (VERDICT r4 #1) ---------------------------------
stage vggf_train $TRAIN --loss-pos-weight 800 -ar arch_configs/dream_vgg_f.yaml \
  -i "$S4/d768" -e 300 --lr-decay-steps 6000 \
  --init-encoder "$S4/vggq_s2/best_network.msgpack" -o "$S/vggf_t" \
  && stage eval_vggf bash -c "python scripts/network_inference_dataset.py \
    -i $S/vggf_t/best_network.msgpack -d $S4/hold64 -o $S/eval_vggf \
    --no-visualization -f && mkdir -p $R5/eval_vggf && \
    cp $S/eval_vggf/analysis_results.txt $S/eval_vggf/*.csv $R5/eval_vggf/"

# --- 2b. resnet-F, fixed recipe ----------------------------------------------
# resnet-H output is 208x208 (~4.3x fewer zero-pixels than 400x400), the
# trained resnet_s2 donates everything except the new up4 block; pos_weight
# scales by the F/Q map-area ratio like vgg.
stage resnetf_train $TRAIN --loss-pos-weight 800 -ar arch_configs/dream_resnet_f.yaml \
  -i "$S4/d768" -e 300 --lr-decay-steps 6000 --ema-decay 0.999 \
  --init-encoder "$S4/resnet_s2/best_network_ema.msgpack" -o "$S/resnetf_t" \
  && stage eval_resnetf bash -c "python scripts/network_inference_dataset.py \
    -i $S/resnetf_t/best_network_ema.msgpack -d $S4/hold64 -o $S/eval_resnetf \
    --no-visualization -f && mkdir -p $R5/eval_resnetf && \
    cp $S/eval_resnetf/analysis_results.txt $S/eval_resnetf/*.csv $R5/eval_resnetf/"

# --- 3. vgg-Q stage-3 fine-tune for flagship margin (VERDICT r4 #6) ----------
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

# --- 4. baxter at quality (VERDICT r4 #4) ------------------------------------
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

echo "== r5 queue complete $(date -u +%H:%M:%S); evidence in $R5"
