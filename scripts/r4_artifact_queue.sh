#!/bin/bash
# Round-4 artifact production queue: trains the headline checkpoints from
# scratch, evaluates them on held-out sets, and harvests the committed
# evidence under trained_models/results_r4/ (the directory
# scripts/reproduce_headline.sh evaluates WITHOUT retraining).
#
# The recipe is DEMO.md's documented headline recipe (tightened per-stage
# epoch counts; same optimizer/loss/EMA choices).  Every stage is idempotent
# — a DONE marker under _scratch/r4/ skips it — so the queue can be re-run
# after an interruption and resumes where it left off.  One TPU process at a
# time: run this alone.
#
# Usage:  nohup bash scripts/r4_artifact_queue.sh > _scratch/r4/queue.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
S=_scratch/r4
R4=trained_models/results_r4
mkdir -p "$S" "$R4"

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

gen() { # out n seed extra...
  local out="$1" n="$2" seed="$3"; shift 3
  python scripts/make_synthetic_dataset.py -m manip_configs/panda.yaml \
    -o "$out" -n "$n" --seed "$seed" "$@"
}

# --- datasets (host CPU; deterministic per seed) ---------------------------
stage d768      gen "$S/d768"      768  11 || exit 1
stage d2048     gen "$S/d2048"     2048 21 || exit 1
stage dr2048    gen "$S/dr2048"    2048 41 --domain-randomization || exit 1
stage hold64    gen "$S/hold64"    64   99 --holdout || exit 1
stage holddr64  gen "$S/holddr64"  64   98 --holdout --domain-randomization || exit 1

mix_sets() {  # clean + DR merged into one training dir (DEMO.md DR-mix stage)
  python - "$S/d2048" "$S/dr2048" "$S/mix4096" <<'EOF'
import json, os, shutil, sys
a, b, out = sys.argv[1:4]
os.makedirs(out, exist_ok=True)
for f in ("_camera_settings.json", "_object_settings.json"):
    shutil.copy(os.path.join(a, f), os.path.join(out, f))
i = 0
for src in (a, b):
    frames = sorted(f[:-8] for f in os.listdir(src) if f.endswith(".rgb.png"))
    for fr in frames:
        os.link(os.path.join(src, fr + ".rgb.png"),
                os.path.join(out, "%06d.rgb.png" % i))
        os.link(os.path.join(src, fr + ".json"),
                os.path.join(out, "%06d.json" % i))
        i += 1
print("mixed", i, "frames ->", out)
EOF
}
stage mix4096 mix_sets || exit 1

TRAIN="python scripts/train_network.py -m manip_configs/panda.yaml -b 32 \
  -lr 2e-4 --loss-pos-weight 50 --grad-clip-norm 1.0 --cache-device \
  --compute-dtype bfloat16 --valid-every 5 --checkpoint-every 50 -f"

# --- vgg-Q: 300 epochs on 768, then 300 fine-tune epochs on 2048 -----------
stage vggq_s1 $TRAIN -ar arch_configs/dream_vgg_q.yaml \
  -i "$S/d768" -e 300 --lr-decay-steps 6000 -o "$S/vggq_s1" || exit 1
stage vggq_s2 $TRAIN -ar arch_configs/dream_vgg_q.yaml \
  -i "$S/d2048" -e 300 --lr-decay-steps 15600 \
  --init-params "$S/vggq_s1/best_network.msgpack" -o "$S/vggq_s2" || exit 1

# --- resnet-H: 150 epochs on 2048, then 120 DR-mix fine-tune epochs --------
stage resnet_s1 $TRAIN -ar arch_configs/dream_resnet_h.yaml \
  -i "$S/d2048" -e 150 --lr-decay-steps 7800 --ema-decay 0.999 \
  -o "$S/resnet_s1" || exit 1
stage resnet_s2 $TRAIN -ar arch_configs/dream_resnet_h.yaml \
  -i "$S/mix4096" -e 120 --lr-decay-steps 12360 --ema-decay 0.999 \
  --init-params "$S/resnet_s1/best_network_ema.msgpack" \
  -o "$S/resnet_s2" || exit 1

# --- compress + stage the judge-loadable artifacts --------------------------
harvest_ckpt() { # src dst_dir dst_name
  mkdir -p "$2"
  python scripts/compress_checkpoint.py "$1" "$2/$3.msgpack" "$2/$3.yaml"
}
stage ckpt_vggq   harvest_ckpt "$S/vggq_s2/best_network.msgpack" \
  "$R4/vggq" dream_vgg_q_r4 || exit 1
stage ckpt_resnet harvest_ckpt "$S/resnet_s2/best_network_ema.msgpack" \
  "$R4/resnet_h" dream_resnet_h_r4 || exit 1

# --- evaluate the COMMITTED artifacts on the held-out sets ------------------
run_eval() { # name ckpt dataset
  python scripts/network_inference_dataset.py -i "$2" -d "$3" \
    -o "$S/eval_$1" --no-visualization -f \
  && mkdir -p "$R4/eval_$1" \
  && cp "$S/eval_$1/analysis_results.txt" "$S/eval_$1"/*.csv "$R4/eval_$1/"
}
stage eval_vggq_plain   run_eval vggq_plain   "$R4/vggq/dream_vgg_q_r4.msgpack"        "$S/hold64"
stage eval_resnet_clean run_eval resnet_clean "$R4/resnet_h/dream_resnet_h_r4.msgpack" "$S/hold64"
stage eval_resnet_dr    run_eval resnet_dr    "$R4/resnet_h/dream_resnet_h_r4.msgpack" "$S/holddr64"

# --- multi-robot: kuka (8 kps) and baxter (17 kps) end-to-end ---------------
# The synthetic chain builder extrapolates beyond the 7-point panda chain
# (data/synthetic.py chain_points), so these drive the full pipeline —
# config plumbing, 17-channel belief decode, fixed-shape top-K, PnP masking —
# at the reference's kuka/baxter keypoint counts
# (reference manip_configs/{kuka,baxter}.yaml, trained_models/DOWNLOAD.sh).
gen_robot() { # robot out n seed extra...
  local robot="$1" out="$2" n="$3" seed="$4"; shift 4
  python scripts/make_synthetic_dataset.py -m "manip_configs/$robot.yaml" \
    -o "$out" -n "$n" --seed "$seed" "$@"
}
stage kuka_d768    gen_robot kuka   "$S/kuka_d768"    768 61
stage kuka_hold    gen_robot kuka   "$S/kuka_hold64"  64  97 --holdout
stage baxter_d768  gen_robot baxter "$S/baxter_d768"  768 62
stage baxter_hold  gen_robot baxter "$S/baxter_hold64" 64 96 --holdout

stage kuka_train $TRAIN -ar arch_configs/dream_vgg_q.yaml \
  -m manip_configs/kuka.yaml -i "$S/kuka_d768" -e 300 \
  --lr-decay-steps 6000 -o "$S/kuka_t" \
  && stage eval_kuka bash -c "python scripts/network_inference_dataset.py \
    -i $S/kuka_t/best_network.msgpack -d $S/kuka_hold64 -o $S/eval_kuka \
    --no-visualization -f && mkdir -p $R4/eval_kuka && \
    cp $S/eval_kuka/analysis_results.txt $S/eval_kuka/*.csv $R4/eval_kuka/"

stage baxter_train $TRAIN -ar arch_configs/dream_vgg_q.yaml \
  -m manip_configs/baxter.yaml -i "$S/baxter_d768" -e 300 \
  --lr-decay-steps 6000 -o "$S/baxter_t" \
  && stage eval_baxter bash -c "python scripts/network_inference_dataset.py \
    -i $S/baxter_t/best_network.msgpack -d $S/baxter_hold64 -o $S/eval_baxter \
    --no-visualization -f && mkdir -p $R4/eval_baxter && \
    cp $S/eval_baxter/analysis_results.txt $S/eval_baxter/*.csv $R4/eval_baxter/"

# --- full-resolution decoder variants: vgg-F and resnet-F -------------------
# (reference dream/models.py:618-686 deconv full decoder / :80-136) — short
# from-scratch runs at real resolution to prove training + eval + 400x400
# decode on chip, not just shape tests.
stage vggf_train $TRAIN -ar arch_configs/dream_vgg_f.yaml \
  -i "$S/d768" -e 120 --lr-decay-steps 2400 -o "$S/vggf_t" \
  && stage eval_vggf bash -c "python scripts/network_inference_dataset.py \
    -i $S/vggf_t/best_network.msgpack -d $S/hold64 -o $S/eval_vggf \
    --no-visualization -f && mkdir -p $R4/eval_vggf && \
    cp $S/eval_vggf/analysis_results.txt $S/eval_vggf/*.csv $R4/eval_vggf/"

stage resnetf_train $TRAIN -ar arch_configs/dream_resnet_f.yaml \
  -i "$S/d768" -e 120 --lr-decay-steps 2400 -o "$S/resnetf_t" \
  && stage eval_resnetf bash -c "python scripts/network_inference_dataset.py \
    -i $S/resnetf_t/best_network.msgpack -d $S/hold64 -o $S/eval_resnetf \
    --no-visualization -f && mkdir -p $R4/eval_resnetf && \
    cp $S/eval_resnetf/analysis_results.txt $S/eval_resnetf/*.csv $R4/eval_resnetf/"

# --- QAT qualification where it matters (verdict #6) ------------------------
# Fine-tune the headline vgg-Q under --quant-mode qat, deploy via int8 PTQ,
# and evaluate float vs PTQ vs QAT+PTQ on the SAME holdout.
stage qat_ft $TRAIN -ar arch_configs/dream_vgg_q.yaml \
  -i "$S/d2048" -e 60 --lr-decay-steps 3120 -lr 5e-5 --quant-mode qat \
  --init-params "$S/vggq_s2/best_network.msgpack" -o "$S/vggq_qat" \
  && stage eval_vggq_ptq bash -c "python scripts/network_inference_dataset.py \
    -i $R4/vggq/dream_vgg_q_r4.msgpack -d $S/hold64 -o $S/eval_vggq_ptq \
    --no-visualization -f --int8-calibration-frames 32 && \
    mkdir -p $R4/eval_vggq_ptq && \
    cp $S/eval_vggq_ptq/analysis_results.txt $S/eval_vggq_ptq/*.csv $R4/eval_vggq_ptq/" \
  && stage eval_vggq_qat_int8 bash -c "python scripts/network_inference_dataset.py \
    -i $S/vggq_qat/best_network.msgpack -d $S/hold64 -o $S/eval_vggq_qat_int8 \
    --no-visualization -f --int8-calibration-frames 32 && \
    mkdir -p $R4/eval_vggq_qat_int8 && \
    cp $S/eval_vggq_qat_int8/analysis_results.txt $S/eval_vggq_qat_int8/*.csv \
       $R4/eval_vggq_qat_int8/"

echo "== queue complete $(date -u +%H:%M:%S); committed evidence in $R4"
