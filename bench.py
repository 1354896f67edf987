#!/usr/bin/env python3
"""Benchmark harness: end-to-end inference frames/sec/chip (+ train step).

Measures the full DREAM-vgg-Q pipeline — raw 640x480 uint8 frames ->
on-device preprocess (shrink-and-crop to 400x400) + normalize -> hourglass
forward -> belief-map peak decode -> keypoint coords on host — i.e. the same
work the reference does per frame in ``network_inference_dataset``
(reference scripts/network_inference_dataset.py + dream/network.py:503-590),
where the reference's peak extraction runs on the CPU per image.  A second
metric (in ``detail``) times the fused training step (preprocess + augment +
GT belief maps + fwd + bwd + adam, one dispatch).

Baseline: the reference publishes no throughput numbers
(/root/reference has no benchmarks/). BASELINE.json's target is >=10x an
RTX-2080's frames/sec on one TPU v5e chip.  The 30 fps reference rate is a
measured+derived decomposition of the reference's synchronous per-frame
pipeline — 27.5 ms derived GPU forward (139.1 GFLOPs @ 50% of 10.1 fp32
TFLOP/s, generous) + 4.4-7.1 ms MEASURED scipy peak extraction — giving
28.9-31.3 fps; 30 is the upper-middle of that range (a higher denominator
is the conservative direction for vs_baseline).
Full derivation: BASELINE.md + scripts/baseline_derivation.py.  So
``vs_baseline = fps / (10 * 30)``: vs_baseline >= 1.0 means the 10x goal is
met.

Robust capture: the TPU here sits behind a relay that can degrade for
minutes at a time (round 1's official capture recorded 42.9 fps for a
pipeline independently measured at ~1000 fps).  Every batch size therefore
runs >=3 independent timed trials of >=16 dispatches each and reports the
MEDIAN; if the trials disagree by >2x or the best trial lands below half the
stored golden rate, the harness assumes a degraded relay, re-warms, and
retries the whole sweep (up to 3 attempts), recording the anomaly in
``detail.capture_anomalies``.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N}
"""

import json
import time

import numpy as np

REFERENCE_RTX2080_FPS = 30.0
TARGET_MULTIPLIER = 10.0
# TPU v5e single-chip peak matmul rates (Google-published: 197 bf16 TFLOP/s,
# 394 int8 TOPS).  Used only to report model-FLOPs utilization (MFU) so perf
# regressions are visible in the capture; never to compute the headline.
V5E_PEAK_FLOPS = {"bf16": 197e12, "int8": 394e12}
# Round-1 verified steady-state rate (independently reproduced at 978-1003
# fps across three sessions); used only to DETECT a degraded capture window,
# never to report.
GOLDEN_FPS = 950.0
N_TRIALS = 3
MIN_DISPATCHES = 16
MAX_ATTEMPTS = 3


def _flops_per_frame(jitted, *args):
    """Compiled-graph FLOPs per frame via XLA cost analysis (0.0 if opaque).

    Uses the bf16 graph's count as the model-FLOPs numerator for every
    config (standard MFU convention: same model work, different rates).
    """
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        batch = args[-1].shape[0]
        return flops / max(batch, 1)
    except Exception:
        return 0.0


def _timed_trials(fn, sync, frames_per_iter, n_iters, n_trials=N_TRIALS):
    """n_trials independent timed loops; returns per-trial fps."""
    fps = []
    for _ in range(n_trials):
        t0 = time.time()
        out = None
        for _ in range(n_iters):
            out = fn()
        sync(out)
        dt = time.time() - t0
        fps.append(frames_per_iter * n_iters / dt)
    return fps


def main():
    import jax
    import jax.numpy as jnp

    from dream_tpu.data import make_batch_processor
    from dream_tpu.models import DreamHourglass
    from dream_tpu.network import create_network_from_config_data
    from dream_tpu.ops.belief_maps import keypoints_from_belief_maps
    from dream_tpu.ops.image_proc import preprocess_and_normalize

    # bf16 conv compute on the MXU (params f32, belief maps decoded in f32) —
    # the production inference configuration.
    model = DreamHourglass(n_keypoints=7, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    init_img = jnp.zeros((1, 400, 400, 3), jnp.float32)
    variables = jax.jit(model.init)(key, init_img)

    norm = {"mean": [0.5] * 3, "stdev": [0.5] * 3}

    @jax.jit
    def infer(variables, raw_uint8):
        net_in = preprocess_and_normalize(raw_uint8, (400, 400), "shrink-and-crop", norm)
        belief_nhwc = model.apply(variables, net_in)[-1]
        belief = jnp.moveaxis(belief_nhwc, -1, 1)
        kps, _ = keypoints_from_belief_maps(belief, 0.4395)
        return kps

    def sync(x):
        # np.asarray forces the host transfer — the real consumer contract,
        # and the only reliable sync through this relay
        # (jax.block_until_ready does not wait for relay completion here).
        np.asarray(x)

    rng = np.random.RandomState(0)
    batches = {
        b: jnp.asarray(rng.randint(0, 255, size=(b, 480, 640, 3), dtype=np.uint8))
        for b in (16, 64, 128)
    }

    anomalies = []
    results = {}
    trials_detail = {}
    for attempt in range(1, MAX_ATTEMPTS + 1):
        results = {}
        trials_detail = {}
        degraded = False
        for b, frames in batches.items():
            sync(infer(variables, frames))  # warm-up / compile
            n_iters = max(MIN_DISPATCHES, int(2048 // b))
            trials = _timed_trials(
                lambda: infer(variables, frames), sync, b, n_iters
            )
            med = float(np.median(trials))
            results[b] = med
            trials_detail[str(b)] = [round(t, 1) for t in trials]
            spread = max(trials) / max(min(trials), 1e-9)
            if max(trials) < 0.5 * GOLDEN_FPS or spread > 2.0:
                anomalies.append(
                    {
                        "attempt": attempt,
                        "batch": b,
                        "trials_fps": [round(t, 1) for t in trials],
                        "reason": (
                            "below 0.5x golden"
                            if max(trials) < 0.5 * GOLDEN_FPS
                            else f"trial spread {spread:.1f}x"
                        ),
                    }
                )
                degraded = True
        if not degraded or attempt == MAX_ATTEMPTS:
            break
        time.sleep(5.0)  # let the relay settle, then re-warm + retry

    # Optional int8 capture (dream_tpu extension, models/quant.py): PTQ the
    # conv stack and time the same end-to-end pipeline at the best batch
    # size.  Guarded — a Mosaic/XLA int8 lowering failure must never sink
    # the official capture; on failure the headline `value` falls back to
    # the bf16 number.
    int8_fps = 0.0
    int8_trials = []
    int8_impl = "none"
    int8_batch = 0
    race_fps = {}
    try:
        import dataclasses

        from dream_tpu.models.vgg_int8_deploy import (
            supports as pallas_supports, vgg_q_int8_infer,
        )

        calib_model = dataclasses.replace(model, quant_mode="calibrate")
        int8_model = dataclasses.replace(model, quant_mode="int8")
        qvars = calib_model.init(key, init_img)["quant"]
        calib_in = preprocess_and_normalize(
            batches[16], (400, 400), "shrink-and-crop", norm
        )
        _, mut = jax.jit(
            lambda p, q, x: calib_model.apply(
                {"params": p, "quant": q}, x, mutable=["quant"]
            )
        )(variables["params"], qvars, calib_in)
        qvars = mut["quant"]

        def make_infer_int8(impl):
            @jax.jit
            def infer_int8(params, raw_uint8):
                net_in = preprocess_and_normalize(
                    raw_uint8, (400, 400), "shrink-and-crop", norm
                )
                if impl == "quantconv":
                    belief_nhwc = int8_model.apply(
                        {"params": params, "quant": qvars}, net_in
                    )[-1]
                else:  # fused-requant chain, Pallas or XLA convs
                    belief_nhwc = vgg_q_int8_infer(
                        params, qvars, net_in,
                        backend="xla" if impl == "xla_chain" else impl,
                    )
                belief = jnp.moveaxis(belief_nhwc, -1, 1)
                kps, _ = keypoints_from_belief_maps(belief, 0.4395)
                return kps
            return infer_int8

        b8 = max(results, key=results.get) if results else 128
        frames8 = batches[b8]
        # Race the int8 implementations — named exactly as DREAM_INT8_IMPL
        # accepts them (network.py enable_int8_inference): 'quantconv' (XLA
        # QuantConv graph, every conv int8, dequant between convs),
        # 'xla_chain' (fused-requant chain, int8 activations end-to-end),
        # and 'pallas' (fused Mosaic conv chain, ops/pallas_conv.py).
        # Measured r4 at b=128: QuantConv 1603 fps vs Pallas chain 603 (the
        # hand kernel loses to XLA's int8 convs at production batch), so
        # never assume an order; measure it.  Each candidate gets >=2 short
        # trials with the same degraded-relay checks as the main sweep (best
        # of 2 decides — a single degraded window must not pick a slower
        # implementation).  Compile failures are recorded; the others race.
        variants = ["quantconv"] + (
            ["xla_chain", "pallas"] if pallas_supports(model) else []
        )
        infer_int8, race_fps, best_race_fps = None, {}, 0.0
        for impl_name in variants:
            try:
                candidate = make_infer_int8(impl_name)
                sync(candidate(variables["params"], frames8))  # warm/compile
                trials = _timed_trials(
                    lambda: candidate(variables["params"], frames8),
                    sync, b8, 8, n_trials=2,
                )
                spread = max(trials) / max(min(trials), 1e-9)
                if max(trials) < 0.5 * GOLDEN_FPS or spread > 2.0:
                    anomalies.append(
                        {
                            "race": impl_name,
                            "trials_fps": [round(t, 1) for t in trials],
                            "reason": (
                                "race below 0.5x golden"
                                if max(trials) < 0.5 * GOLDEN_FPS
                                else f"race trial spread {spread:.1f}x"
                            ),
                        }
                    )
                fps = max(trials)
                race_fps[impl_name] = round(fps, 1)
                if infer_int8 is None or fps > best_race_fps:
                    infer_int8, int8_impl, best_race_fps = (
                        candidate, impl_name, fps,
                    )
            except Exception as exc:
                anomalies.append(
                    {"reason": f"int8 {impl_name} compile failed: {exc}"[:200]}
                )
        assert infer_int8 is not None, "all int8 implementations failed"
        # The int8 stack is compute-bound (profile_breakdown r4: model 0.534
        # of 0.620 ms/frame e2e), so a larger batch can amortize dispatch +
        # decode overheads past the bf16-optimal batch.  Probe b=256 with
        # the same guarded 2-trial scheme and capture at whichever batch
        # wins (unrounded comparison).
        if b8 < 256:
            try:
                frames256 = jnp.concatenate([frames8] * (512 // b8))[:256]
                sync(infer_int8(variables["params"], frames256))
                trials256 = _timed_trials(
                    lambda: infer_int8(variables["params"], frames256),
                    sync, 256, 8, n_trials=2,
                )
                fps256 = max(trials256)
                race_fps[f"{int8_impl}_b256"] = round(fps256, 1)
                if fps256 > best_race_fps:
                    b8, frames8 = 256, frames256
            except Exception as exc:
                anomalies.append(
                    {"reason": f"int8 b=256 probe failed: {exc}"[:200]}
                )
        n_iters = max(MIN_DISPATCHES, int(2048 // b8))
        int8_trials = _timed_trials(
            lambda: infer_int8(variables["params"], frames8), sync, b8, n_iters
        )
        int8_fps = float(np.median(int8_trials))
        int8_batch = b8
    except Exception as exc:
        anomalies.append({"reason": f"int8 capture failed: {exc}"[:200]})

    # Full-resolution decoder variants (DREAM-vgg-F deconv decoder and
    # DREAM-resnet-F, reference dream/models.py:618-686 and :80-136): one
    # lean guarded row each (b=32, 2 trials) so the 400x400-output variants'
    # on-chip throughput/memory behavior is visible in every capture, not
    # just the flagship vgg-Q.
    variant_fps = {}
    try:
        from dream_tpu.models import ResnetSimple

        def make_variant_infer(vmodel, vvars):
            @jax.jit
            def infer_v(raw_uint8):
                net_in = preprocess_and_normalize(
                    raw_uint8, (400, 400), "shrink-and-crop", norm
                )
                belief_nhwc = vmodel.apply(vvars, net_in)[-1]
                belief = jnp.moveaxis(belief_nhwc, -1, 1)
                kps, _ = keypoints_from_belief_maps(belief, 0.4395)
                return kps
            return infer_v

        VB = 32
        vframes = batches[16][:VB] if VB <= 16 else jnp.concatenate(
            [batches[16], batches[16]]
        )[:VB]
        for vname, vmodel in (
            ("vgg_f", DreamHourglass(
                n_keypoints=7, deconv_decoder=True, dtype=jnp.bfloat16)),
            ("resnet_f", ResnetSimple(
                n_keypoints=7, full=True, dtype=jnp.bfloat16)),
        ):
            try:
                vvars = jax.jit(vmodel.init)(key, init_img)
                infer_v = make_variant_infer(vmodel, vvars)
                sync(infer_v(vframes))  # warm-up / compile
                vtrials = _timed_trials(
                    lambda: infer_v(vframes), sync, VB, 8, n_trials=2
                )
                variant_fps[vname] = {
                    "fps_median": round(float(np.median(vtrials)), 2),
                    "trials_fps": [round(t, 1) for t in vtrials],
                    "batch": VB,
                }
            except Exception as exc:
                anomalies.append(
                    {"reason": f"variant {vname} capture failed: {exc}"[:200]}
                )
    except Exception as exc:
        anomalies.append({"reason": f"variant captures failed: {exc}"[:200]})

    # Training throughput in the PRODUCTION configuration — bf16 compute +
    # scanned epochs over a device-resident set (the --cache-device path that
    # scripts/train_network.py ships; round-2's official capture fell back to
    # a degraded f32 per-step number when one compile hit a transient relay
    # HTTP 500, so compiles now retry on transient errors).
    arch_config = {
        "architecture": {
            "type": "vgg",
            "target": "belief_maps",
            "input_heads": ["image_rgb"],
            "output_heads": ["belief_maps"],
            "image_normalization": norm,
            "loss": {"type": "mse"},
            "image_preprocessing": "shrink-and-crop",
            "compute_dtype": "bfloat16",
        },
        "manipulator": {
            "name": "panda",
            "keypoints": [
                {"name": f"kp{i}", "friendly_name": f"kp{i}"} for i in range(7)
            ],
        },
        "training": {
            "config": {
                "image_preprocessing": "shrink-and-crop",
                "net_input_resolution": [400, 400],
                "optimizer": {"type": "adam", "learning_rate": 1.5e-4},
            },
            "platform": {},
            "results": {},
        },
    }
    net = create_network_from_config_data(arch_config)
    net.init_variables(seed=0)
    process = make_batch_processor(
        (640, 480), (400, 400), (100, 100), "shrink-and-crop", norm,
        augment=True, include_belief_maps=True,
    )
    net.enable_scanned_training(process)
    step_key = jax.random.PRNGKey(1)

    # Small HBM-resident set; one dispatch = one shuffled epoch of
    # N_SET/B fused steps (gather + augment + GT maps + fwd/bwd + adam),
    # exactly what --cache-device training runs.  Batch sizes swept: 32 is
    # the committed DEMO.md recipe; 128 is the REFERENCE's own example
    # recipe (reference README.md:99 trains vgg-Q at batch 128), and larger
    # batches lift MXU efficiency on the backward conv passes — the
    # headline train number is the best batch, with the per-batch detail
    # recorded.  Each size's compile/run is guarded (OOM or relay failure
    # drops that size, the sweep continues).
    N_SET = 512
    images_ref = jnp.asarray(
        rng.randint(0, 255, size=(N_SET, 480, 640, 3), dtype=np.uint8)
    )
    kp_ref = jnp.asarray(
        rng.rand(N_SET, 7, 2).astype(np.float32) * [[640.0, 480.0]]
    )

    train_fps = 0.0
    train_trials = []
    TRAIN_B = 0
    train_per_batch = {}
    train_mode = "scanned-epoch bf16 (production --cache-device path)"
    compiled = False
    for b_train in (32, 64, 128, 256):
        steps = N_SET // b_train
        idx = jnp.asarray(
            rng.permutation(N_SET)[: steps * b_train].reshape(steps, b_train),
            jnp.int32,
        )

        def epoch_once(idx=idx):
            return net.train_epoch_raw(step_key, images_ref, kp_ref, idx)

        b_compiled = False
        # b > 128 overflows HBM on a 16 GB chip (the backward activations);
        # the remote-compile helper surfaces that as HTTP 500, so don't
        # burn retry attempts on it — probe once.
        n_attempts = 1 if b_train > 128 else MAX_ATTEMPTS
        for compile_attempt in range(1, n_attempts + 1):
            try:
                sync(epoch_once())  # warm-up / compile
                b_compiled = True
                break
            except Exception as exc:
                msg = f"{exc}"
                anomalies.append(
                    {
                        "train_batch": b_train,
                        "train_compile_attempt": compile_attempt,
                        "reason": f"train-epoch compile failed: {msg}"[:200],
                    }
                )
                if "RESOURCE_EXHAUSTED" in msg:
                    break  # a real OOM won't heal with a retry
                time.sleep(10.0)  # transient relay failure (e.g. HTTP 500)
        if not b_compiled:
            continue
        compiled = True
        b_trials = _timed_trials(
            epoch_once, sync, steps * b_train, 3, n_trials=2
        )
        b_fps = float(np.median(b_trials))
        train_per_batch[str(b_train)] = round(b_fps, 1)
        if b_fps > train_fps:
            train_fps, train_trials, TRAIN_B = b_fps, b_trials, b_train

    if not compiled:
        # Fall back to the per-step fused path at the recipe batch size so
        # the capture still carries a training number.
        train_mode = "fused-step bf16 (scanned compile failed)"
        TRAIN_B = 32
        train_frames = images_ref[:TRAIN_B]
        kp_raw = kp_ref[:TRAIN_B]

        def train_once():
            return net.train_raw(step_key, train_frames, kp_raw)

        try:
            sync(train_once())
            train_trials = _timed_trials(train_once, sync, TRAIN_B, 8, n_trials=2)
            train_fps = float(np.median(train_trials))
        except Exception as exc:
            anomalies.append(
                {"reason": f"fused train-step fallback failed: {exc}"[:200]}
            )

    best_batch = max(results, key=results.get)
    float_fps = results[best_batch]
    baseline_fps = REFERENCE_RTX2080_FPS * TARGET_MULTIPLIER

    # MFU per config: measured end-to-end fps x model FLOPs/frame (from the
    # compiled bf16 graph, preproc+model+decode included) / chip peak.
    # End-to-end, so these are conservative lower bounds on conv MFU.
    flops_frame = _flops_per_frame(infer, variables, batches[best_batch])
    mfu = {
        "bf16": round(float_fps * flops_frame / V5E_PEAK_FLOPS["bf16"], 4),
        "int8": round(int8_fps * flops_frame / V5E_PEAK_FLOPS["int8"], 4),
    }

    # int8 PTQ is the qualified production inference configuration (held-out
    # accuracy within noise of float on a trained checkpoint — DEMO.md "int8
    # accuracy qualification"), so it is the headline when its guarded
    # capture succeeded AND beat the bf16 sweep; any int8 failure falls back
    # to the bf16 number (recorded in capture_anomalies above).
    if int8_fps > float_fps:
        fps, headline_cfg = int8_fps, "int8 PTQ"
    else:
        fps, headline_cfg = float_fps, "bf16"

    print(
        json.dumps(
            {
                "metric": "end-to-end DREAM-vgg-Q inference (640x480 uint8 -> keypoints), frames/sec/chip",
                "value": round(fps, 2),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / baseline_fps, 3),
                "detail": {
                    "headline_config": headline_cfg,
                    "float_fps_median": round(float_fps, 2),
                    "per_batch_fps_median": {
                        str(k): round(v, 2) for k, v in results.items()
                    },
                    "per_batch_trials_fps": trials_detail,
                    "best_batch": best_batch,
                    "model_gflops_per_frame": round(flops_frame / 1e9, 2),
                    "mfu_vs_v5e_peak": mfu,
                    "variant_fps": variant_fps,
                    "int8_fps_median": round(int8_fps, 2),
                    "int8_impl": int8_impl,
                    "int8_batch": int8_batch,
                    "int8_impl_race_fps": race_fps,
                    "int8_trials_fps": [round(t, 1) for t in int8_trials],
                    "train_step_imgs_per_sec": round(train_fps, 1),
                    "train_step_batch": TRAIN_B,
                    "train_step_per_batch_imgs_per_sec": train_per_batch,
                    "train_step_mode": train_mode,
                    "train_step_trials": [round(t, 1) for t in train_trials],
                    "capture_anomalies": anomalies,
                    "baseline": f"10x RTX-2080 @ {REFERENCE_RTX2080_FPS} fps = {baseline_fps} fps",
                    "golden_fps_for_degradation_detect": GOLDEN_FPS,
                    "backend": jax.default_backend(),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
