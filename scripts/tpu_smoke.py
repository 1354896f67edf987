#!/usr/bin/env python3
"""Opt-in real-TPU smoke test (run manually; NOT part of the CPU-forced CI).

CI (tests/) pins every kernel's semantics on the CPU backend — the Pallas
decode only in interpret mode — so a Mosaic/lowering regression on the real
chip would go unseen until a bench or demo run.  This script is the
single-process on-chip gate:

  1. Pallas peak decode (compiled, non-interpret) vs the XLA composite on
     identical planted-Gaussian belief maps — bit-level coords/count parity.
  2. One fused training step (preprocess + augment + GT maps + fwd/bwd +
     adam in a single dispatch) — finite loss, params actually move.
  3. A 3-dispatch end-to-end inference timing sanity (not a perf gate; just
     catches order-of-magnitude regressions / a wedged relay).

Usage:  python scripts/tpu_smoke.py          (takes a few minutes cold)

ONE TPU PROCESS AT A TIME: do not run while a trainer/bench is using the
chip (the second process blocks on the device grant).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from dream_tpu.data import make_batch_processor
    from dream_tpu.models import DreamHourglass
    from dream_tpu.network import create_network_from_config_data
    from dream_tpu.ops import belief_maps as bm
    from dream_tpu.ops.belief_maps import (
        create_belief_maps,
        keypoints_from_belief_maps,
    )
    from dream_tpu.ops.image_proc import preprocess_and_normalize
    from dream_tpu.ops.pallas_kernels import peaks_from_belief_maps_pallas

    backend = jax.default_backend()
    print(f"backend: {backend}; devices: {jax.devices()}")
    if backend != "tpu":
        print("FAIL: this smoke test must run on the real TPU backend")
        return 1

    failures = []

    # ---- 1. Pallas decode (compiled) vs XLA composite parity ----------------
    rng = np.random.RandomState(0)
    kp = jnp.asarray(rng.uniform(5, 95, size=(8, 7, 2)).astype(np.float32))
    maps = create_belief_maps(kp, (100, 100))  # [8, 7, 100, 100]
    maps = maps + jnp.asarray(
        rng.uniform(0, 0.005, size=maps.shape).astype(np.float32)
    )

    t0 = time.time()
    pallas_peaks = jax.tree.map(
        np.asarray, peaks_from_belief_maps_pallas(maps, 0.4395)
    )
    print(f"pallas decode compiled+ran in {time.time() - t0:.1f}s")
    xla_peaks = jax.tree.map(
        np.asarray, bm.peaks_from_belief_maps(maps, 0.4395)
    )

    if not np.array_equal(pallas_peaks["count"], xla_peaks["count"]):
        failures.append("pallas/xla peak COUNT mismatch")
    # Coordinates: identical peak sets; subpixel tail is shared code, so
    # agreement should be tight (fp assoc differences only).
    v = xla_peaks["valid"] & pallas_peaks["valid"]
    dc = np.abs(pallas_peaks["coords"] - xla_peaks["coords"])[v]
    if not np.array_equal(pallas_peaks["valid"], xla_peaks["valid"]):
        failures.append("pallas/xla peak VALID mismatch")
    elif dc.size and dc.max() > 1e-4:
        failures.append(f"pallas/xla coord mismatch: max |d| = {dc.max()}")
    else:
        print(f"1. pallas vs xla decode parity OK (max coord delta "
              f"{dc.max() if dc.size else 0.0:.2e}, "
              f"{int(v.sum())} peaks compared)")

    # Full decode (disambiguation + sentinel) through the pallas backend.
    kps_p, _ = keypoints_from_belief_maps(maps, 0.4395, decode_backend="pallas")
    kps_x, _ = keypoints_from_belief_maps(maps, 0.4395, decode_backend="xla")
    if not np.allclose(np.asarray(kps_p), np.asarray(kps_x), atol=1e-4):
        failures.append("full decode (pallas vs xla) keypoint mismatch")

    # ---- 2. one fused training step ----------------------------------------
    norm = {"mean": [0.5] * 3, "stdev": [0.5] * 3}
    cfg = {
        "architecture": {
            "type": "vgg", "target": "belief_maps",
            "input_heads": ["image_rgb"], "output_heads": ["belief_maps"],
            "image_normalization": norm, "loss": {"type": "mse"},
            "image_preprocessing": "shrink-and-crop",
            "compute_dtype": "bfloat16",
        },
        "manipulator": {
            "name": "panda",
            "keypoints": [{"name": f"kp{i}", "friendly_name": f"kp{i}"}
                          for i in range(7)],
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
    net = create_network_from_config_data(cfg)
    net.init_variables(seed=0)
    process = make_batch_processor(
        (640, 480), (400, 400), (100, 100), "shrink-and-crop", norm,
        augment=True, include_belief_maps=True,
    )
    net.enable_fused_training(process)
    frames = jnp.asarray(
        rng.randint(0, 255, size=(8, 480, 640, 3), dtype=np.uint8)
    )
    kp_raw = jnp.asarray(
        rng.rand(8, 7, 2).astype(np.float32) * [[640.0, 480.0]]
    )
    p_before = float(
        jnp.sum(jnp.abs(net.variables["params"]["down1"]["conv0"]["kernel"]))
    )
    t0 = time.time()
    loss = float(net.train_raw(jax.random.PRNGKey(1), frames, kp_raw))
    print(f"fused train step compiled+ran in {time.time() - t0:.1f}s")
    p_after = float(
        jnp.sum(jnp.abs(net.variables["params"]["down1"]["conv0"]["kernel"]))
    )
    if not np.isfinite(loss):
        failures.append(f"fused train step loss not finite: {loss}")
    elif p_before == p_after:
        failures.append("fused train step did not update parameters")
    else:
        print(f"2. fused train step OK (loss {loss:.5f}, params moved)")

    # ---- 3. inference timing sanity ----------------------------------------
    model = DreamHourglass(n_keypoints=7, dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 400, 400, 3), jnp.float32)
    )

    @jax.jit
    def infer(variables, raw_uint8):
        net_in = preprocess_and_normalize(
            raw_uint8, (400, 400), "shrink-and-crop", norm
        )
        belief = jnp.moveaxis(model.apply(variables, net_in)[-1], -1, 1)
        kps, _ = keypoints_from_belief_maps(belief, 0.4395)
        return kps

    b = 16
    batch = jnp.asarray(
        rng.randint(0, 255, size=(b, 480, 640, 3), dtype=np.uint8)
    )
    np.asarray(infer(variables, batch))  # compile
    t0 = time.time()
    for _ in range(3):
        out = infer(variables, batch)
    np.asarray(out)  # host transfer = the only reliable sync via the relay
    dt = time.time() - t0
    fps = 3 * b / dt
    print(f"3. inference timing: {fps:.0f} fps at b={b} (3 dispatches)")
    if fps < 100.0:
        failures.append(
            f"inference sanity below 100 fps ({fps:.0f}) — degraded relay "
            "or a perf regression; re-run / investigate"
        )

    # ---- 4. int8 conv stack: on-chip lowering + fidelity + timing ----------
    # (models/quant.py; CI covers it only on the CPU backend.)
    try:
        import dataclasses

        calib_model = dataclasses.replace(model, quant_mode="calibrate")
        int8_model = dataclasses.replace(model, quant_mode="int8")
        net_in = preprocess_and_normalize(
            batch, (400, 400), "shrink-and-crop", norm
        )
        qvars = calib_model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 400, 400, 3), jnp.float32)
        )["quant"]
        _, mut = jax.jit(
            lambda p, q, x: calib_model.apply(
                {"params": p, "quant": q}, x, mutable=["quant"]
            )
        )(variables["params"], qvars, net_in)
        qvars = mut["quant"]

        @jax.jit
        def infer_int8(params, raw_uint8):
            x = preprocess_and_normalize(
                raw_uint8, (400, 400), "shrink-and-crop", norm
            )
            belief = jnp.moveaxis(
                int8_model.apply({"params": params, "quant": qvars}, x)[-1],
                -1, 1,
            )
            kps, _ = keypoints_from_belief_maps(belief, 0.4395)
            return belief, kps

        belief_q, _ = infer_int8(variables["params"], batch)
        belief_f = jnp.moveaxis(model.apply(variables, net_in)[-1], -1, 1)
        bq, bf = np.asarray(belief_q), np.asarray(belief_f, np.float32)
        denom = max(float(np.abs(bf).max()), 1e-9)
        rel = float(np.abs(bq - bf).max()) / denom
        t0 = time.time()
        for _ in range(3):
            out = infer_int8(variables["params"], batch)
        np.asarray(out[1])
        fps8 = 3 * b / (time.time() - t0)
        print(
            f"4. int8 stack OK: rel-to-peak belief delta {rel:.3f} vs bf16, "
            f"{fps8:.0f} fps at b={b} (bf16 was {fps:.0f})"
        )
        if rel > 0.25:
            failures.append(
                f"int8 belief maps diverge from bf16 (rel {rel:.3f}; random "
                "weights are the PTQ worst case, but >0.25 means a lowering "
                "bug, not quantization noise)"
            )
    except Exception as exc:
        failures.append(f"int8 stack failed on-chip: {exc}")

    if failures:
        for f in failures:
            print(f"FAIL: {f}")
        return 1
    print("TPU SMOKE: ALL OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
