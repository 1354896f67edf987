#!/usr/bin/env python3
"""Video visualization CLI: inference overlays -> PNG frames -> H.264 mp4.

Parity with the reference video tool (reference
scripts/visualize_network_inference.py:24-658): dual input path (NDDS dataset
or a plain image directory), four visualization types, frame-range selection,
and an ffmpeg subprocess for encoding (kept host-side, reference :24-49).

On the NDDS path, inference runs batched on device via the same
dataset/loader machinery as the analysis engine (reference :241-258), and
ground-truth keypoints are loaded and overlaid in green alongside the red
detections (reference :293-318,451-455).  The plain image-dir path has no GT
and runs the single-image pipeline per frame, like the reference (:322-382).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

import numpy as np
from PIL import Image as PILImage

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dream_tpu import visualize as viz
from dream_tpu.network import create_network_from_config_file
from dream_tpu.utils import is_ndds_dataset, makedirs

# Visualization types (reference scripts/visualize_network_inference.py:54-57).
KP_OVERLAY_RAW = "kp_overlay_raw"
KP_OVERLAY_NET_INPUT = "kp_overlay_net_input"
KP_BELIEF_OVERLAY_RAW = "kp_belief_overlay_raw"
BELIEF_OVERLAY_RAW = "belief_overlay_raw"
ALL_VIZ_TYPES = [
    KP_OVERLAY_RAW, KP_OVERLAY_NET_INPUT, KP_BELIEF_OVERLAY_RAW, BELIEF_OVERLAY_RAW,
]


def video_from_frames(frames_dir, video_path, fps):
    """ffmpeg H.264 encode (reference :24-49); skips cleanly if ffmpeg is absent."""
    cmd = [
        "ffmpeg", "-y", "-framerate", str(fps),
        "-pattern_type", "glob", "-i", os.path.join(frames_dir, "*.png"),
        "-c:v", "libx264", "-pix_fmt", "yuv420p", video_path,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        print(f"Wrote {video_path}")
    except (FileNotFoundError, subprocess.CalledProcessError) as exc:
        print(f"ffmpeg encoding skipped ({exc}); frames remain in {frames_dir}")


def _belief_blend(image, belief_maps):
    """Max-combined belief maps blended over the image."""
    combined = np.max(np.asarray(belief_maps), axis=0)
    return viz.blend_belief_overlay(image, combined)


def _save_frame(
    viz_types, frame_dirs, name, raw_image, kp_raw, belief_maps,
    net_in_img, kp_netin, gt_raw=None, gt_netin=None,
):
    """Write one frame for each requested visualization type.

    GT keypoints (when provided — NDDS path only) are drawn in green under
    the red detections, matching the reference (:451-455).
    """
    def with_gt(img, gt):
        if gt is None:
            return img
        return viz.overlay_points_on_image(
            img, gt, annotation_color_dot="green", point_diameter=4.0
        )

    if KP_OVERLAY_RAW in viz_types:
        out = with_gt(raw_image, gt_raw)
        viz.overlay_points_on_image(
            out, kp_raw, annotation_color_dot="red"
        ).save(os.path.join(frame_dirs[KP_OVERLAY_RAW], name))

    if KP_OVERLAY_NET_INPUT in viz_types:
        out = with_gt(net_in_img, gt_netin)
        viz.overlay_points_on_image(
            out, kp_netin, annotation_color_dot="red"
        ).save(os.path.join(frame_dirs[KP_OVERLAY_NET_INPUT], name))

    if BELIEF_OVERLAY_RAW in viz_types or KP_BELIEF_OVERLAY_RAW in viz_types:
        blend = _belief_blend(raw_image, belief_maps)
        if BELIEF_OVERLAY_RAW in viz_types:
            blend.save(os.path.join(frame_dirs[BELIEF_OVERLAY_RAW], name))
        if KP_BELIEF_OVERLAY_RAW in viz_types:
            out = with_gt(blend, gt_raw)
            viz.overlay_points_on_image(
                out, kp_raw, annotation_color_dot="red"
            ).save(os.path.join(frame_dirs[KP_BELIEF_OVERLAY_RAW], name))


def _ndds_frames(net, dataset_dir, start, end, batch_size, num_workers,
                 int8_calibration_frames=0):
    """Batched device inference over an NDDS dataset; yields per-frame
    visualization inputs including GT keypoints (reference :241-318)."""
    import jax
    import jax.numpy as jnp

    from dream_tpu import data as dream_data
    from dream_tpu.ops import coords as coord_ops
    from dream_tpu.utils import find_ndds_data_in_dir, load_image_resolution

    found = find_ndds_data_in_dir(dataset_dir)
    image_raw_resolution = load_image_resolution(found[1]["camera"])
    preproc = net.image_preprocessing()
    net_in_res, net_out_res = net.net_resolutions_from_image_raw_resolution(
        image_raw_resolution
    )
    dataset = dream_data.ManipulatorNDDSDataset(
        found, net.manipulator_name, net.keypoint_names,
        net_in_res, net_out_res, net.image_normalization, preproc,
        augment_data=False, include_ground_truth=True,
        include_belief_maps=False, n_decode_threads=max(num_workers, 1),
    )
    n = len(dataset)
    end = n if end is None else min(end, n)
    indices = list(range(start, end))
    assert indices, f"No frames in selected range [{start}, {end})"
    loader = dream_data.DataLoader(
        dataset, batch_size, shuffle=False, drop_last=False, indices=indices
    )
    process = dream_data.make_batch_processor(
        image_raw_resolution, net_in_res, net_out_res, preproc,
        net.image_normalization, augment=False, include_belief_maps=False,
    )
    to_netin = coord_ops.affine_netin_from_netout(net_out_res, net_in_res)
    to_raw = coord_ops.affine_raw_from_netin(
        net_in_res, image_raw_resolution, preproc
    )
    kp_to_raw = to_raw.compose(to_netin)
    gt_to_netin = coord_ops.affine_netin_from_raw(
        image_raw_resolution, net_in_res, preproc
    )

    if int8_calibration_frames:
        # Quantize the conv stack to int8, calibrating on the first frames
        # of the selected range (dream_tpu extension; 2x MXU rate on v5e).
        net.enable_int8_inference(
            dream_data.collect_calibration_batches(
                dataset, process, int8_calibration_frames, batch_size,
                indices=indices,
            )
        )
        print(f"int8 inference active "
              f"(calibrated on {int8_calibration_frames} frames)")

    for host_batch in loader:
        batch = process(
            jax.random.PRNGKey(0),
            jnp.asarray(host_batch["image_rgb_raw"]),
            jnp.asarray(host_batch["keypoint_projections_raw"]),
        )
        belief_maps, detected_netout = net.inference(batch["image_rgb_input"])
        belief_maps = np.asarray(belief_maps)
        kp_netin = np.asarray(to_netin.apply_numpy(np.asarray(detected_netout)))
        kp_raw = np.asarray(kp_to_raw.apply_numpy(np.asarray(detected_netout)))
        net_inputs = np.asarray(batch["image_rgb_input"])
        gt_raw = np.asarray(host_batch["keypoint_projections_raw"], dtype=float)

        for b in range(belief_maps.shape[0]):
            raw_image = PILImage.fromarray(host_batch["image_rgb_raw"][b])
            net_in_img = viz.image_from_tensor(
                net_inputs[b], net.image_normalization
            )
            yield dict(
                raw_image=raw_image,
                kp_raw=kp_raw[b],
                belief_maps=belief_maps[b],
                net_in_img=net_in_img,
                kp_netin=kp_netin[b],
                gt_raw=gt_raw[b],
                gt_netin=np.asarray(gt_to_netin.apply_numpy(gt_raw[b])),
            )


def _image_dir_frames(net, dataset_dir, start, end):
    """Per-frame single-image inference over a plain image directory — no GT
    exists on this path (reference :322-382)."""
    exts = (".png", ".jpg", ".jpeg")
    image_paths = sorted(
        os.path.join(dataset_dir, f)
        for f in os.listdir(dataset_dir)
        if f.lower().endswith(exts)
    )
    assert image_paths, f"No frames found in {dataset_dir}"
    end = len(image_paths) if end is None else end
    for path in image_paths[start:end]:
        image = PILImage.open(path).convert("RGB")
        detection = net.keypoints_from_image(image, debug=True)
        yield dict(
            raw_image=image,
            kp_raw=detection["detected_keypoints"],
            belief_maps=np.asarray(detection["belief_maps"]),
            net_in_img=viz.image_from_tensor(
                detection["image_rgb_net_input"], net.image_normalization
            ),
            kp_netin=detection["detected_keypoints_net_input"],
        )


def visualize_network_inference(args):
    network_config_path = args.network_config or os.path.splitext(
        args.input_params_path
    )[0] + ".yaml"
    net = create_network_from_config_file(network_config_path, args.input_params_path)
    net.enable_evaluation()

    makedirs(args.output_dir, exist_ok=args.force_overwrite)

    viz_types = args.visualization_types
    frame_dirs = {}
    for vt in viz_types:
        frame_dirs[vt] = os.path.join(args.output_dir, vt + "_frames")
        os.makedirs(frame_dirs[vt], exist_ok=True)

    start = args.start_frame or 0
    if is_ndds_dataset(args.dataset_dir):
        frames = _ndds_frames(
            net, args.dataset_dir, start, args.end_frame,
            args.batch_size, args.num_workers,
            int8_calibration_frames=args.int8_calibration_frames,
        )
    else:
        frames = _image_dir_frames(net, args.dataset_dir, start, args.end_frame)

    n_done = 0
    for idx, frame in enumerate(frames):
        _save_frame(viz_types, frame_dirs, f"{idx:06d}.png", **frame)
        n_done += 1
        if n_done % 25 == 0:
            print(f"Processed {n_done} frames")
    print(f"Processed {n_done} frames total")

    for vt in viz_types:
        video_from_frames(
            frame_dirs[vt], os.path.join(args.output_dir, vt + ".mp4"), args.fps
        )


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("-i", "--input-params-path", required=True)
    parser.add_argument("-c", "--network-config", default=None)
    parser.add_argument("-d", "--dataset-dir", required=True,
                        help="NDDS dataset dir or plain image dir.")
    parser.add_argument("-o", "--output-dir", required=True)
    parser.add_argument("-f", "--force-overwrite", action="store_true", default=False)
    parser.add_argument("-t", "--visualization-types", nargs="+",
                        choices=ALL_VIZ_TYPES, default=[KP_OVERLAY_RAW])
    parser.add_argument("-b", "--batch-size", type=int, default=16)
    parser.add_argument("-w", "--num-workers", type=int, default=8)
    parser.add_argument("-fps", "--fps", type=float, default=30.0)
    parser.add_argument("-s", "--start-frame", type=int, default=None)
    parser.add_argument("-e", "--end-frame", type=int, default=None)
    parser.add_argument("--int8-calibration-frames", type=int, default=0,
                        help="Quantize the conv stack to int8 (NDDS path "
                             "only), calibrating on this many leading "
                             "frames of the selected range (dream_tpu "
                             "extension; 0 = float).")
    visualize_network_inference(parser.parse_args())
