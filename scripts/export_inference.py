#!/usr/bin/env python3
"""Export the inference pipeline as a deployable StableHLO artifact.

One self-contained file: raw uint8 frames in -> keypoint coords out, with
trained weights (and optional int8 quantization) baked in as constants; a
consumer deserializes it with jax.export and calls it — no dream_tpu, flax,
or checkpoint needed at serving time (see dream_tpu/export.py).

Example:
    python scripts/export_inference.py -i out/best_network.msgpack \
        -o panda_vgg_q.jaxexport -b 32 --raw-resolution 640x480 \
        --platforms tpu,cpu \
        [--int8-calibration-dir /path/to/ndds --int8-calibration-frames 32]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("-i", "--input-params-path", required=True)
    parser.add_argument("-c", "--network-config", default=None,
                        help="Defaults to the params path with .yaml.")
    parser.add_argument("-o", "--output-path", required=True,
                        help="Artifact file to write (.jaxexport).")
    parser.add_argument("-b", "--batch-size", type=int, default=32)
    parser.add_argument("--raw-resolution", default="640x480",
                        help="WxH of the raw frames the artifact accepts.")
    parser.add_argument("--platforms", default=None,
                        help="Comma-separated lowering platforms (e.g. "
                             "'tpu' or 'tpu,cpu'); default: current backend.")
    parser.add_argument("--int8-calibration-dir", default=None,
                        help="NDDS dataset to calibrate int8 quantization "
                             "on; omit for float inference.")
    parser.add_argument("--int8-calibration-frames", type=int, default=32)
    parser.add_argument("--self-test", action="store_true", default=False,
                        help="Deserialize the artifact and compare against "
                             "the live network on random frames (requires "
                             "the current backend to be an export target).")
    parser.add_argument("--bench-trials", type=int, default=0,
                        help="If >0, time the deserialized artifact on the "
                             "current backend (median of N trials of 8 "
                             "dispatches each) and report fps alongside the "
                             "live-jit pipeline for the same batch.")
    args = parser.parse_args()

    import numpy as np

    from dream_tpu.export import export_inference, load_inference
    from dream_tpu.network import create_network_from_config_file

    network_config_path = args.network_config or os.path.splitext(
        args.input_params_path
    )[0] + ".yaml"
    net = create_network_from_config_file(
        network_config_path, args.input_params_path
    )
    net.enable_evaluation()

    w, h = (int(v) for v in args.raw_resolution.lower().split("x"))

    if args.int8_calibration_dir:
        from dream_tpu import data as dream_data
        from dream_tpu.utils.ndds import find_ndds_data_in_dir, load_image_resolution

        found = find_ndds_data_in_dir(args.int8_calibration_dir)
        raw_res = load_image_resolution(found[1]["camera"])
        netin_res, netout_res = net.net_resolutions_from_image_raw_resolution(raw_res)
        dataset = dream_data.ManipulatorNDDSDataset(
            found, net.manipulator_name, net.keypoint_names,
            netin_res, netout_res, net.image_normalization,
            net.image_preprocessing(), augment_data=False,
            include_ground_truth=False, include_belief_maps=False,
        )
        process = dream_data.make_batch_processor(
            raw_res, netin_res, netout_res, net.image_preprocessing(),
            net.image_normalization, augment=False, include_belief_maps=False,
        )
        net.enable_int8_inference(
            dream_data.collect_calibration_batches(
                dataset, process, args.int8_calibration_frames
            )
        )
        print(f"int8 calibrated on {args.int8_calibration_frames} frames "
              f"from {args.int8_calibration_dir}")

    platforms = args.platforms.split(",") if args.platforms else None
    data = export_inference(net, (w, h), args.batch_size, platforms=platforms)
    with open(args.output_path, "wb") as f:
        f.write(data)
    import json

    from dream_tpu.export import artifact_metadata

    meta_path = args.output_path + ".meta.json"
    with open(meta_path, "w") as f:
        json.dump(artifact_metadata(net, (w, h), args.batch_size), f, indent=2)
    print(f"wrote {args.output_path}: {len(data) / 1e6:.1f} MB, "
          f"input uint8[{args.batch_size},{h},{w},3], "
          f"platforms={platforms or 'current backend'}; sidecar {meta_path}")

    if args.self_test:
        call = load_inference(data)
        rng = np.random.RandomState(0)
        frames = rng.randint(0, 255, size=(args.batch_size, h, w, 3), dtype=np.uint8)
        _, kps = call(frames)
        # The artifact returns raw-frame coords — compare against the live
        # per-frame pipeline (keypoints_from_image), same contract.
        ref0 = net.keypoints_from_image(frames[0])["detected_keypoints"]
        kp_delta = float(np.max(np.abs(np.asarray(kps[0]) - ref0)))
        print(f"self-test: max raw-frame keypoint delta vs live network = "
              f"{kp_delta:.2e}")
        assert kp_delta < 1e-2
        print("self-test OK")

    if args.bench_trials > 0:
        import time

        import jax

        call = jax.jit(load_inference(data))
        rng = np.random.RandomState(1)
        frames = rng.randint(0, 255, size=(args.batch_size, h, w, 3), dtype=np.uint8)
        dev_frames = jax.device_put(frames)

        def sync(out):
            # Host transfer is the only reliable sync through the axon relay
            # (and the real consumer contract for keypoints).
            np.asarray(out[1])

        sync(call(dev_frames))  # warm-up / compile
        n_dispatch = 8
        fps = []
        for _ in range(args.bench_trials):
            t0 = time.time()
            out = None
            for _ in range(n_dispatch):
                out = call(dev_frames)
            sync(out)
            fps.append(args.batch_size * n_dispatch / (time.time() - t0))
        print(f"artifact bench ({jax.default_backend()}, b={args.batch_size}, "
              f"{args.bench_trials} trials x {n_dispatch} dispatches): "
              f"median {np.median(fps):.1f} fps "
              f"(trials: {[round(f, 1) for f in fps]})")


if __name__ == "__main__":
    main()
