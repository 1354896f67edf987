#!/usr/bin/env python3
"""Single-image inference CLI.

Loads a trained network, detects keypoints on one image, prints them, and
writes the reference's five visualization overlays
(reference scripts/network_inference.py:20-283) — saved to files instead of
PIL .show() windows (TPU hosts are headless).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np
from PIL import Image as PILImage

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dream_tpu.network import create_network_from_config_file
from dream_tpu.utils import load_keypoints
from dream_tpu import visualize as viz
from dream_tpu.ops import coords as coord_ops


def generate_belief_map_visualizations(belief_maps, keypoint_projs_detected):
    """Reference scripts/network_inference.py:20-52."""
    images = viz.images_from_belief_maps(belief_maps, normalization_method=6)
    overlaid = []
    for kp, img in zip(keypoint_projs_detected, images):
        overlaid.append(
            viz.overlay_points_on_image(
                img, [kp], annotation_color_dot="green", point_diameter=4
            )
        )
    return viz.mosaic_images(
        overlaid, rows=1, cols=len(overlaid), inner_padding_px=10
    )


def network_inference(args):
    network_config_path = args.network_config or os.path.splitext(
        args.input_params_path
    )[0] + ".yaml"
    dream_network = create_network_from_config_file(
        network_config_path, args.input_params_path
    )
    dream_network.enable_evaluation()

    image_rgb = PILImage.open(args.image_path).convert("RGB")
    detection = dream_network.keypoints_from_image(image_rgb, debug=True)
    kp_raw = detection["detected_keypoints"]

    print("Detected keypoints (raw frame):")
    for name, kp in zip(dream_network.friendly_keypoint_names, kp_raw):
        found = kp[0] > -999.0 and kp[1] > -999.0
        print(f"  {name}: {kp if found else 'not detected'}")

    out_dir = args.output_dir
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)

        # 1. keypoint overlay on the raw image
        viz.overlay_points_on_image(
            image_rgb, kp_raw, dream_network.friendly_keypoint_names,
            annotation_color_dot="red", annotation_color_text="red",
        ).save(os.path.join(out_dir, "keypoints_raw.png"))

        # 2. keypoint overlay on the net-input image
        net_in_img = viz.image_from_tensor(
            detection["image_rgb_net_input"], dream_network.image_normalization
        )
        viz.overlay_points_on_image(
            net_in_img, detection["detected_keypoints_net_input"],
            annotation_color_dot="red",
        ).save(os.path.join(out_dir, "keypoints_net_input.png"))

        # 3. belief-map mosaic with detected keypoints
        generate_belief_map_visualizations(
            np.asarray(detection["belief_maps"]),
            detection["detected_keypoints_net_output"],
        ).save(os.path.join(out_dir, "belief_maps.png"))

        # 4. belief-map blends over the net input
        blends = [
            viz.blend_belief_overlay(net_in_img, bm)
            for bm in np.asarray(detection["belief_maps"])
        ]
        viz.mosaic_images(blends, rows=1, cols=len(blends)).save(
            os.path.join(out_dir, "belief_blends.png")
        )

        # 5. optional GT comparison if a .json sidecar exists
        json_path = os.path.splitext(args.image_path)[0].replace(".rgb", "") + ".json"
        if os.path.exists(json_path):
            gt = load_keypoints(
                json_path, dream_network.manipulator_name,
                dream_network.keypoint_names,
            )
            img = viz.overlay_points_on_image(
                image_rgb, np.asarray(gt["projections"]),
                annotation_color_dot="green",
            )
            viz.overlay_points_on_image(
                img, kp_raw, annotation_color_dot="red"
            ).save(os.path.join(out_dir, "keypoints_vs_gt.png"))

        print(f"Visualizations written to {out_dir}")

    return detection


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("-i", "--input-params-path", required=True)
    parser.add_argument("-c", "--network-config", default=None)
    parser.add_argument("-m", "--image-path", required=True)
    parser.add_argument("-o", "--output-dir", default=None,
                        help="Where to write visualization PNGs.")
    network_inference(parser.parse_args())
