#!/usr/bin/env python3
"""Component-level timing breakdown of the inference pipeline + warp kernel.

Decomposes the end-to-end vgg-Q rate (bench.py's metric) into its stages so
optimization targets the real cost (VERDICT r3: int8 realized 1.53x of the
theoretical 2x over bf16 — this script locates the non-MXU time):

  preproc   uint8 640x480 -> shrink-and-crop 400x400 -> normalize
  model     hourglass forward from a device-resident normalized input
            (bf16 and int8-PTQ variants)
  decode    Pallas peak decode from device-resident belief maps
  e2e       the full pipeline as bench.py times it

Each stage is timed as its own jitted dispatch returning a scalar sum (the
device->host transfer of the scalar is the only reliable sync through the
axon relay — jax.block_until_ready returns early here).  Stage times do NOT
add up exactly to e2e (XLA fuses across stage boundaries in the single e2e
graph; separate dispatches pay HBM materialization between stages) — they
bound each stage's cost from above.

Also micro-benches the Pallas augmentation warp (ops/pallas_warp.py) at each
MXU precision to justify the production DEFAULT (see module comment there).

Usage: python scripts/profile_breakdown.py  (one real TPU chip, ~3 min warm)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, n_iters=16, n_trials=3):
    """Median wall seconds per dispatch (sync once per trial, in-order device)."""
    fn()  # warm-up / compile
    per = []
    for _ in range(n_trials):
        t0 = time.time()
        out = None
        for _ in range(n_iters):
            out = fn()
        np.asarray(out)
        per.append((time.time() - t0) / n_iters)
    return float(np.median(per))


def main():
    import jax
    import jax.numpy as jnp

    from dream_tpu.models import DreamHourglass
    from dream_tpu.ops.belief_maps import keypoints_from_belief_maps
    from dream_tpu.ops.image_proc import preprocess_and_normalize

    print("backend:", jax.default_backend(), flush=True)
    B = 128
    norm = {"mean": [0.5] * 3, "stdev": [0.5] * 3}
    rng = np.random.RandomState(0)
    raw = jnp.asarray(rng.randint(0, 255, size=(B, 480, 640, 3), dtype=np.uint8))

    model = DreamHourglass(n_keypoints=7, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    variables = jax.jit(model.init)(key, jnp.zeros((1, 400, 400, 3), jnp.float32))

    import dataclasses
    calib_model = dataclasses.replace(model, quant_mode="calibrate")
    int8_model = dataclasses.replace(model, quant_mode="int8")
    qvars = calib_model.init(key, jnp.zeros((1, 400, 400, 3), jnp.float32))["quant"]
    net_in_calib = preprocess_and_normalize(raw[:16], (400, 400), "shrink-and-crop", norm)
    _, mut = jax.jit(
        lambda p, q, x: calib_model.apply({"params": p, "quant": q}, x, mutable=["quant"])
    )(variables["params"], qvars, net_in_calib)
    qvars = mut["quant"]

    from dream_tpu.models.vgg_int8_deploy import vgg_q_int8_infer as _pallas_int8

    net_in = jax.jit(
        lambda r: preprocess_and_normalize(r, (400, 400), "shrink-and-crop", norm)
    )(raw)
    belief = jax.jit(
        lambda v, x: jnp.moveaxis(model.apply(v, x)[-1], -1, 1)
    )(variables, net_in)

    stages = {
        "preproc (uint8 640x480 -> norm 400x400)": jax.jit(
            lambda r: jnp.sum(
                preprocess_and_normalize(r, (400, 400), "shrink-and-crop", norm)
            )
        ),
        "model bf16 (net_in -> belief)": jax.jit(
            lambda x: jnp.sum(model.apply(variables, x)[-1].astype(jnp.float32))
        ),
        "model int8 (net_in -> belief)": jax.jit(
            lambda x: jnp.sum(
                int8_model.apply({"params": variables["params"], "quant": qvars}, x)[-1]
                .astype(jnp.float32)
            )
        ),
        "model int8 pallas (fused conv chain)": jax.jit(
            lambda x: jnp.sum(_pallas_int8(variables["params"], qvars, x))
        ),
        "model int8 xla chain (fused requant)": jax.jit(
            lambda x: jnp.sum(
                _pallas_int8(variables["params"], qvars, x, backend="xla")
            )
        ),
        "decode (belief -> keypoints)": jax.jit(
            lambda b: jnp.sum(keypoints_from_belief_maps(b, 0.4395)[0])
        ),
    }
    args = {
        "preproc (uint8 640x480 -> norm 400x400)": raw,
        "model bf16 (net_in -> belief)": net_in,
        "model int8 (net_in -> belief)": net_in,
        "model int8 pallas (fused conv chain)": net_in,
        "model int8 xla chain (fused requant)": net_in,
        "decode (belief -> keypoints)": belief,
    }

    print(f"\n-- stage breakdown (b={B}, ms/frame | fps) --", flush=True)
    for name, fn in stages.items():
        a = args[name]
        try:
            dt = timed(lambda: fn(a))
        except Exception as exc:
            print(f"{name:45s} FAILED: {exc}"[:200], flush=True)
            continue
        print(f"{name:45s} {dt / B * 1e3:7.3f} ms/frame  {B / dt:8.1f} fps",
              flush=True)

    @jax.jit
    def e2e_bf16(v, r):
        x = preprocess_and_normalize(r, (400, 400), "shrink-and-crop", norm)
        b = jnp.moveaxis(model.apply(v, x)[-1], -1, 1)
        return keypoints_from_belief_maps(b, 0.4395)[0]

    @jax.jit
    def e2e_int8(p, r):
        x = preprocess_and_normalize(r, (400, 400), "shrink-and-crop", norm)
        b = jnp.moveaxis(
            int8_model.apply({"params": p, "quant": qvars}, x)[-1], -1, 1
        )
        return keypoints_from_belief_maps(b, 0.4395)[0]

    @jax.jit
    def e2e_int8_pallas(p, r):
        x = preprocess_and_normalize(r, (400, 400), "shrink-and-crop", norm)
        b = jnp.moveaxis(_pallas_int8(p, qvars, x), -1, 1)
        return keypoints_from_belief_maps(b, 0.4395)[0]

    @jax.jit
    def e2e_int8_xla_chain(p, r):
        x = preprocess_and_normalize(r, (400, 400), "shrink-and-crop", norm)
        b = jnp.moveaxis(_pallas_int8(p, qvars, x, backend="xla"), -1, 1)
        return keypoints_from_belief_maps(b, 0.4395)[0]

    for name, fn in (
        ("e2e bf16", lambda: e2e_bf16(variables, raw)),
        ("e2e int8 (xla convs)", lambda: e2e_int8(variables["params"], raw)),
        ("e2e int8 (pallas fused convs)",
         lambda: e2e_int8_pallas(variables["params"], raw)),
        ("e2e int8 (xla fused-requant chain)",
         lambda: e2e_int8_xla_chain(variables["params"], raw)),
    ):
        try:
            dt = timed(fn)
        except Exception as exc:
            print(f"{name:45s} FAILED: {exc}"[:200], flush=True)
            continue
        print(f"{name:45s} {dt / B * 1e3:7.3f} ms/frame  {B / dt:8.1f} fps",
              flush=True)

    # Compiled-graph cost analysis: compare bytes accessed between the bf16
    # and int8 model graphs — if int8's HBM traffic exceeds bf16's, the int8
    # stack is memory-bound on the int32 conv-output round trips (the
    # quantize/dequantize chains), not compute-bound.
    for name in ("model bf16 (net_in -> belief)", "model int8 (net_in -> belief)",
                 "model int8 xla chain (fused requant)"):
        try:
            ca = stages[name].lower(args[name]).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            print(
                f"{name:45s} flops/frame={ca.get('flops', 0) / B / 1e9:6.2f}G  "
                f"bytes/frame={ca.get('bytes accessed', 0) / B / 1e6:7.1f}MB",
                flush=True,
            )
        except Exception as exc:
            print(f"{name}: cost_analysis unavailable ({exc})", flush=True)

    # int8 at larger batch (memory-bound pipelines don't gain; compute-bound
    # ones with dispatch overhead do).
    raw256 = jnp.asarray(
        rng.randint(0, 255, size=(256, 480, 640, 3), dtype=np.uint8)
    )
    dt = timed(lambda: e2e_int8(variables["params"], raw256), n_iters=8)
    print(f"{'e2e int8 b=256':45s} {dt / 256 * 1e3:7.3f} ms/frame  "
          f"{256 / dt:8.1f} fps", flush=True)

    # ---- training-step breakdown (b=32, the production recipe batch) ----
    # Times the pieces of the fused train step as separate dispatches so the
    # remaining cost past the warp fix is attributable: batch processor
    # (preproc + augment + GT belief maps), forward + loss, and the full
    # fused step (fwd + bwd + adam).  Sums exceed the fused step (separate
    # dispatches pay HBM between stages) — upper bounds per stage.
    from dream_tpu.data import make_batch_processor
    from dream_tpu.network import create_network_from_config_data

    arch_config = {
        "architecture": {
            "type": "vgg", "target": "belief_maps",
            "input_heads": ["image_rgb"], "output_heads": ["belief_maps"],
            "image_normalization": norm, "loss": {"type": "mse"},
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
            "platform": {}, "results": {},
        },
    }
    tnet = create_network_from_config_data(arch_config)
    tnet.init_variables(seed=0)
    process = make_batch_processor(
        (640, 480), (400, 400), (100, 100), "shrink-and-crop", norm,
        augment=True, include_belief_maps=True,
    )
    tnet.enable_fused_training(process)
    TB = 32
    traw = jnp.asarray(rng.randint(0, 255, size=(TB, 480, 640, 3), dtype=np.uint8))
    tkp = jnp.asarray(rng.rand(TB, 7, 2).astype(np.float32) * [[640.0, 480.0]])
    tkey = jax.random.PRNGKey(7)

    @jax.jit
    def proc_once(k, im, kp):
        out = process(k, im, kp)
        return jnp.sum(out["belief_maps"]) + jnp.sum(
            out["image_rgb_input"].astype(jnp.float32)
        )

    @jax.jit
    def fwd_once(k, im, kp):
        out = process(k, im, kp)
        pred = tnet.apply_model(
            tnet.variables, out["image_rgb_input"], train=True
        )[0][-1]
        target = jnp.moveaxis(out["belief_maps"], 1, -1)
        return jnp.mean((pred.astype(jnp.float32) - target) ** 2)

    print(f"\n-- train-step breakdown (b={TB}, ms/batch) --", flush=True)
    for name, fn in (
        ("process (preproc+augment+GT maps)",
         lambda: proc_once(tkey, traw, tkp)),
        ("process + forward + loss", lambda: fwd_once(tkey, traw, tkp)),
        ("full fused step (fwd+bwd+adam)",
         lambda: tnet.train_raw(tkey, traw, tkp)),
    ):
        try:
            dt = timed(fn, n_iters=8)
        except Exception as exc:
            print(f"{name:38s} FAILED: {exc}"[:200], flush=True)
            continue
        print(f"{name:38s} {dt * 1e3:8.2f} ms/batch  "
              f"({TB / dt:6.1f} imgs/s)", flush=True)

    # ---- Pallas warp kernel precision sweep (training augmentation) ----
    from dream_tpu.ops.pallas_warp import warp_batch_pallas
    from dream_tpu.data import augment

    WB = 32
    imgs = jnp.asarray(
        rng.randint(0, 255, size=(WB, 400, 400, 3)).astype(np.float32)
    )
    cfg = augment.AugmentConfig(p_shift_scale_rotate=1.0)
    keys = jax.random.split(jax.random.PRNGKey(5), WB)
    affines = jnp.stack(
        [augment._affine_matrix(k, 400, 400, cfg) for k in keys]
    )

    print(f"\n-- Pallas warp (b={WB}x400x400x3, ms/batch) --", flush=True)
    ref = None
    # NOTE: Precision.HIGH is not lowerable by Mosaic (NotImplementedError);
    # the kernel supports exactly HIGHEST (6-pass f32) and DEFAULT (1-pass).
    for prec in ("HIGHEST", "DEFAULT"):
        f = jax.jit(
            lambda im, af, p=prec: jnp.sum(warp_batch_pallas(im, af, precision=p))
        )
        dt = timed(lambda: f(imgs, affines), n_iters=8)
        out = np.asarray(warp_batch_pallas(imgs, affines, precision=prec))
        if ref is None:
            ref = out
            err = 0.0
        else:
            err = float(np.abs(out - ref).max())
        print(f"precision={prec:8s} {dt * 1e3:8.2f} ms/batch   "
              f"max|delta| vs HIGHEST = {err:.4f} (0-255 scale)", flush=True)

    # ---- per-conv int8 MXU efficiency (the int8 ceiling evidence) --------
    # Times every conv shape in the vgg-Q int8 stack as an isolated int8
    # contraction (int8 x int8 -> int32, the same lax.conv the deploy graphs
    # run) and reports achieved TOPS vs the published 394 int8 TOPS peak.
    # This names WHICH layers hold int8 MFU at ~0.66: the 400x400 stem convs
    # (cin=3 pads to the 128-lane MXU tile; <3% peak) and the small-spatial
    # deep blocks, vs the near-peak mid-stack convs.  bf16 contrast column
    # shows whether int8 underperforms ITS peak more than bf16 does at the
    # same shape.
    # Isolated dispatches through the axon relay carry ~2 ms of latency;
    # for long kernels that latency pipelines away across the timed
    # iterations but for short ones it dominates (subtracting a measured
    # floor over-corrects long kernels into >100% "efficiency", so the
    # table reports RAW per-dispatch time and the efficiency column is a
    # LOWER bound).  The floor row (negligible-FLOPs conv) shows the
    # latency scale; rows whose raw time is within ~2x of it are
    # latency-bound and their efficiency column is meaningless.
    CB = 128
    print(f"\n-- per-conv int8 efficiency (b={CB}, raw dispatch times; "
          "efficiency = lower bound) --", flush=True)
    conv_shapes = [
        # (label, h=w, cin, cout)  — vgg-Q encoder + upsample decoder convs
        ("down1.conv0 400x400 3->64", 400, 3, 64),
        ("down1.conv1 400x400 64->64", 400, 64, 64),
        ("down2.conv0 200x200 64->128", 200, 64, 128),
        ("down2.conv1 200x200 128->128", 200, 128, 128),
        ("down3.conv0 100x100 128->256", 100, 128, 256),
        ("down3.conv1-3 100x100 256->256", 100, 256, 256),
        ("down4.conv0 50x50 256->512", 50, 256, 512),
        ("down4.conv1-3 50x50 512->512", 50, 512, 512),
        ("down5.conv0-3 25x25 512->512", 25, 512, 512),
        ("upsample4.conv 50x50 512->256", 50, 512, 256),
        ("upsample3.conv 100x100 256->64", 100, 256, 64),
        ("head.conv0 100x100 64->32", 100, 64, 32),
        ("head.conv2 100x100 32->7", 100, 32, 7),
    ]
    rng2 = np.random.RandomState(3)

    def time_conv(hw, cin, cout, n_iters=16):
        x8 = jnp.asarray(
            rng2.randint(-127, 127, size=(CB, hw, hw, cin)), jnp.int8
        )
        w8 = jnp.asarray(
            rng2.randint(-127, 127, size=(3, 3, cin, cout)), jnp.int8
        )
        # abs() before the reduction: a bare sum(conv(x, w)) is
        # algebraically reducible (sum over the output contracts to
        # pooled-x dot summed-w) and XLA exploits it — the first version of
        # this table showed bf16 "efficiencies" >200% of peak.  sum(|out|)
        # forces the full contraction to run.
        conv8 = jax.jit(lambda x, w: jnp.sum(jnp.abs(
            jax.lax.conv_general_dilated(
                x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32))))
        convb = jax.jit(lambda x, w: jnp.sum(jnp.abs(
            jax.lax.conv_general_dilated(
                x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                window_strides=(1, 1), padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32))))
        return (timed(lambda: conv8(x8, w8), n_iters=n_iters),
                timed(lambda: convb(x8, w8), n_iters=n_iters))

    floor8, floorb = time_conv(8, 8, 8)  # negligible FLOPs = latency scale
    print(f"{'dispatch floor (8x8x8->8 conv)':34s} int8 {floor8 * 1e3:7.3f} ms"
          f" | bf16 {floorb * 1e3:7.3f} ms  (latency scale, not subtracted)",
          flush=True)
    for label, hw, cin, cout in conv_shapes:
        flops = 2.0 * CB * hw * hw * 9 * cin * cout
        try:
            dt8, dtb = time_conv(hw, cin, cout)
        except Exception as exc:
            print(f"{label:34s} FAILED: {exc}"[:160], flush=True)
            continue
        print(
            f"{label:34s} int8 {dt8 * 1e3:7.3f} ms "
            f">={flops / dt8 / 394e12 * 100:5.1f}% of 394T | "
            f"bf16 {dtb * 1e3:7.3f} ms "
            f">={flops / dtb / 197e12 * 100:5.1f}% of 197T",
            flush=True,
        )

    # ---- train-step batch sweep (scanned-epoch, the bench.py headline) ---
    # Larger batches lift backward-pass MXU efficiency; the reference's own
    # example recipe is batch 128 (reference README.md:99).
    print("\n-- train fused-step batch sweep (ms/batch | imgs/s) --",
          flush=True)
    for tb in (32, 64, 128):
        traw_b = jnp.asarray(
            rng.randint(0, 255, size=(tb, 480, 640, 3), dtype=np.uint8)
        )
        tkp_b = jnp.asarray(
            rng.rand(tb, 7, 2).astype(np.float32) * [[640.0, 480.0]]
        )
        try:
            dt = timed(lambda: tnet.train_raw(tkey, traw_b, tkp_b), n_iters=8)
        except Exception as exc:
            print(f"b={tb:<4d} FAILED: {exc}"[:160], flush=True)
            continue
        print(f"b={tb:<4d} {dt * 1e3:8.2f} ms/batch  ({tb / dt:6.1f} imgs/s)",
              flush=True)


if __name__ == "__main__":
    main()
