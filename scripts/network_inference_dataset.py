#!/usr/bin/env python3
"""Dataset inference + analysis CLI.

Thin wrapper over dream_tpu.analysis.analyze_ndds_dataset, mirroring the
reference CLI (reference scripts/network_inference_dataset.py:13-131).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dream_tpu import analysis as dream_analysis


def network_inference_dataset(args):
    # Config path convention: <params>.yaml sidecar next to the msgpack file
    # (reference derives it by swapping the .pth extension).
    network_config_path = args.network_config or os.path.splitext(
        args.input_params_path
    )[0] + ".yaml"
    if args.compute_dtype:
        # Evaluate a checkpoint under a different compute dtype than it was
        # trained with (params are float32 either way; this only changes the
        # MXU conv precision) — e.g. f32 inference of a bf16-trained model.
        import tempfile

        from dream_tpu.utils.config import load_yaml, save_yaml

        cfg = load_yaml(network_config_path)
        cfg["architecture"]["compute_dtype"] = args.compute_dtype
        tmp = tempfile.NamedTemporaryFile(
            mode="w", suffix=".yaml", delete=False
        )
        tmp.close()
        save_yaml(cfg, tmp.name, overwrite=True)
        network_config_path = tmp.name
    dream_analysis.analyze_ndds_dataset(
        args.input_params_path,
        network_config_path,
        args.dataset_dir,
        args.output_dir,
        visualize_belief_maps=not args.no_visualization,
        pnp_analysis=not args.no_pnp,
        force_overwrite=args.force_overwrite,
        image_preprocessing_override=args.image_preproc_override,
        batch_size=args.batch_size,
        num_workers=args.num_workers,
        pnp_ransac=args.ransac,
        pnp_weight_by_score=args.pnp_weight_by_score,
        pnp_reject_outliers_px=args.pnp_reject_outliers_px,
        pnp_soft_detections=args.pnp_soft_detections,
        pnp_soft_min_score=args.pnp_soft_min_score,
        int8_calibration_frames=args.int8_calibration_frames,
    )


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument(
        "-i", "--input-params-path", required=True,
        help="Path to network parameters file (.msgpack).",
    )
    parser.add_argument(
        "-c", "--network-config", default=None,
        help="Network config YAML; defaults to the params path with .yaml.",
    )
    parser.add_argument("-d", "--dataset-dir", required=True)
    parser.add_argument("-o", "--output-dir", required=True)
    parser.add_argument("-b", "--batch-size", type=int, default=16)
    parser.add_argument("-w", "--num-workers", type=int, default=8)
    parser.add_argument("-f", "--force-overwrite", action="store_true", default=False)
    parser.add_argument("-p", "--image-preproc-override", default=None)
    parser.add_argument("--no-pnp", action="store_true", default=False)
    parser.add_argument("--ransac", action="store_true", default=False,
                        help="Use RANSAC PnP (5 px inlier threshold).")
    parser.add_argument("--pnp-weight-by-score", action="store_true",
                        default=False,
                        help="Weight PnP correspondences by belief-map peak "
                             "score (dream_tpu extension).")
    parser.add_argument("--pnp-soft-detections", action="store_true",
                        default=False,
                        help="Feed PnP the best belief-map peak for every "
                             "keypoint (score-weighted), even those the "
                             "score-gap disambiguation rejects from the "
                             "keypoint metrics; recovers poses on compact/"
                             "ambiguous frames that otherwise fall below "
                             "the 4-point PnP floor.")
    parser.add_argument("--pnp-soft-min-score", type=float, default=0.05,
                        help="Absolute peak-score floor for "
                             "--pnp-soft-detections.")
    parser.add_argument("--pnp-reject-outliers-px", type=float, default=None,
                        help="Drop correspondences reprojecting worse than "
                             "this many px after a first solve, then "
                             "re-refine (dream_tpu extension).")
    parser.add_argument("--no-visualization", action="store_true", default=False)
    parser.add_argument("--compute-dtype", choices=["float32", "bfloat16"],
                        default=None,
                        help="Override the checkpoint's compute dtype for "
                             "inference (params are f32 regardless).")
    parser.add_argument("--int8-calibration-frames", type=int, default=0,
                        help="Quantize the conv stack to int8 (2x MXU rate "
                             "on v5e), calibrating activation scales on this "
                             "many leading dataset frames (dream_tpu "
                             "extension; 0 = float inference).")
    network_inference_dataset(parser.parse_args())
