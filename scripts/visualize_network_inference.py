#!/usr/bin/env python3
"""Video visualization CLI: inference overlays -> PNG frames -> H.264 mp4.

Parity with the reference video tool (reference
scripts/visualize_network_inference.py:24-658): dual input path (NDDS dataset
with GT overlays, or a plain image directory), four visualization types,
frame-range selection, and an ffmpeg subprocess for encoding (kept host-side,
reference :24-49).  Inference runs batched on device instead of per-frame.
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
from dream_tpu.utils import find_ndds_data_in_dir, is_ndds_dataset, makedirs

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


def visualize_network_inference(args):
    network_config_path = args.network_config or os.path.splitext(
        args.input_params_path
    )[0] + ".yaml"
    net = create_network_from_config_file(network_config_path, args.input_params_path)
    net.enable_evaluation()

    makedirs(args.output_dir, exist_ok=args.force_overwrite)

    # Gather frame paths: NDDS dataset (with GT) or plain image dir.
    gt_keypoints = None
    if is_ndds_dataset(args.dataset_dir):
        found_data, _ = find_ndds_data_in_dir(args.dataset_dir)
        image_paths = [d["image_paths"]["rgb"] for d in found_data]
    else:
        exts = (".png", ".jpg", ".jpeg")
        image_paths = sorted(
            os.path.join(args.dataset_dir, f)
            for f in os.listdir(args.dataset_dir)
            if f.lower().endswith(exts)
        )
    assert image_paths, f"No frames found in {args.dataset_dir}"

    start = args.start_frame or 0
    end = args.end_frame if args.end_frame is not None else len(image_paths)
    image_paths = image_paths[start:end]

    viz_types = args.visualization_types
    frame_dirs = {}
    for vt in viz_types:
        frame_dirs[vt] = os.path.join(args.output_dir, vt + "_frames")
        os.makedirs(frame_dirs[vt], exist_ok=True)

    for idx, path in enumerate(image_paths):
        image = PILImage.open(path).convert("RGB")
        detection = net.keypoints_from_image(image, debug=True)
        kp_raw = detection["detected_keypoints"]
        belief_maps = np.asarray(detection["belief_maps"])
        name = f"{idx:06d}.png"

        if KP_OVERLAY_RAW in viz_types:
            viz.overlay_points_on_image(
                image, kp_raw, annotation_color_dot="red"
            ).save(os.path.join(frame_dirs[KP_OVERLAY_RAW], name))

        if KP_OVERLAY_NET_INPUT in viz_types:
            net_in_img = viz.image_from_tensor(
                detection["image_rgb_net_input"],
                net.image_normalization,
            )
            viz.overlay_points_on_image(
                net_in_img, detection["detected_keypoints_net_input"],
                annotation_color_dot="red",
            ).save(os.path.join(frame_dirs[KP_OVERLAY_NET_INPUT], name))

        if BELIEF_OVERLAY_RAW in viz_types or KP_BELIEF_OVERLAY_RAW in viz_types:
            blend = _belief_blend(image, belief_maps)
            if BELIEF_OVERLAY_RAW in viz_types:
                blend.save(os.path.join(frame_dirs[BELIEF_OVERLAY_RAW], name))
            if KP_BELIEF_OVERLAY_RAW in viz_types:
                viz.overlay_points_on_image(
                    blend, kp_raw, annotation_color_dot="red"
                ).save(os.path.join(frame_dirs[KP_BELIEF_OVERLAY_RAW], name))

        if (idx + 1) % 25 == 0:
            print(f"Processed {idx + 1}/{len(image_paths)} frames")

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
    parser.add_argument("-fps", "--fps", type=float, default=30.0)
    parser.add_argument("-s", "--start-frame", type=int, default=None)
    parser.add_argument("-e", "--end-frame", type=int, default=None)
    visualize_network_inference(parser.parse_args())
