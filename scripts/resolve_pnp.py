#!/usr/bin/env python3
"""Re-run the PnP / ADD stage of a dataset analysis from its keypoints.csv.

Network inference is by far the expensive half of
``scripts/network_inference_dataset.py``; the PnP solve consumes only the
detected 2D keypoints it wrote to ``keypoints.csv`` plus dataset ground
truth.  This CLI recomputes ``pnp_results.csv`` and the PnP section of
``analysis_results.txt`` from an existing analysis output directory — so a
solver change (or a different PnP configuration: RANSAC, outlier
rejection) can be evaluated across saved runs in seconds without touching
the model or the TPU.

No reference analog (the reference recomputes everything,
dream/analysis.py:93-764); the metric definitions and CSV formats are
identical to `dream_tpu.analysis` (ADD AUC 0.1 m sweep, >=4-in-frame-GT
viability rule, -999.99 sentinels).

Example:
    python scripts/resolve_pnp.py -k _scratch/eval_x/keypoints.csv \\
        -d _scratch/synth_holdout_64 -m manip_configs/panda.yaml \\
        -o _scratch/eval_x_resolved --pnp-reject-outliers-px 5
"""

import argparse
import csv
import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from dream_tpu.analysis import pnp_metrics, write_pnp_csv
from dream_tpu.ops import geometric_vision as gv
from dream_tpu.utils.config import load_yaml
from dream_tpu.utils.ndds import (
    find_ndds_data_in_dir,
    load_camera_intrinsics,
    load_image_resolution,
    load_keypoints,
)


def read_keypoint_csv(path):
    """Inverse of dream_tpu.analysis.write_keypoint_csv."""
    with open(path, newline="") as f:
        rows = list(csv.DictReader(f))
    assert rows, f"empty keypoints csv: {path}"
    # Columns are kp{i}x / kp{i}y / kp{i}x_gt / kp{i}y_gt.
    n_kp = len([k for k in rows[0] if k.endswith("x") and "_gt" not in k])
    names, det, gt = [], [], []
    for r in rows:
        names.append(r["name"])
        det.append([[float(r[f"kp{i}x"]), float(r[f"kp{i}y"])]
                    for i in range(n_kp)])
        gt.append([[float(r[f"kp{i}x_gt"]), float(r[f"kp{i}y_gt"])]
                   for i in range(n_kp)])
    return names, np.array(det, np.float32), np.array(gt, np.float32)


def resolve_pnp(args):
    names, detected_raw, gt_raw = read_keypoint_csv(args.keypoints_csv)
    n_samples, n_kp = detected_raw.shape[:2]

    manip = load_yaml(args.manipulator_config)["manipulator"]
    object_name = manip["name"]
    keypoint_names = [kp["name"] for kp in manip["keypoints"]]
    assert len(keypoint_names) == n_kp, (
        f"manipulator config has {len(keypoint_names)} keypoints but "
        f"keypoints.csv has {n_kp}"
    )

    found = find_ndds_data_in_dir(args.dataset_dir)
    camera_K = load_camera_intrinsics(found[1]["camera"])
    image_raw_resolution = load_image_resolution(found[1]["camera"])
    by_name = {s["name"]: s for s in found[0]}

    gt_positions = []
    for name in names:
        assert name in by_name, (
            f"sample '{name}' from keypoints.csv not found in dataset dir"
        )
        kp = load_keypoints(by_name[name]["data_path"], object_name,
                            keypoint_names)
        gt_positions.append(kp["positions_wrt_cam"])
    gt_positions = np.asarray(gt_positions, np.float32)

    n_inframe = np.sum(
        (gt_raw[:, :, 0] > 0.0)
        & (gt_raw[:, :, 0] < image_raw_resolution[0])
        & (gt_raw[:, :, 1] > 0.0)
        & (gt_raw[:, :, 1] < image_raw_resolution[1]),
        axis=1,
    )

    Kj = jnp.asarray(camera_K, jnp.float32)
    if args.ransac:
        def _solve_one(X, uv, key):
            result, _ = gv.solve_pnp_ransac(X, uv, Kj, key=key)
            return result

        results = jax.jit(jax.vmap(_solve_one))(
            jnp.asarray(gt_positions),
            jnp.asarray(detected_raw),
            jax.random.split(jax.random.PRNGKey(0), n_samples),
        )
    else:
        results = jax.jit(jax.vmap(
            lambda X, uv: gv.solve_pnp(
                X, uv, Kj, reject_outliers_px=args.pnp_reject_outliers_px
            )
        ))(jnp.asarray(gt_positions), jnp.asarray(detected_raw))

    valid = np.asarray(results.valid)
    translations = np.asarray(results.translation)
    quaternions = np.asarray(results.quaternion)

    detect_mask = ~((detected_raw[:, :, 0] < -999.0)
                    & (detected_raw[:, :, 1] < -999.0))
    add_fn = jax.vmap(functools.partial(
        gv.add_from_pose, rotation_convention=args.rotation_convention
    ))
    adds = np.asarray(add_fn(
        results.translation, results.quaternion,
        jnp.asarray(gt_positions), jnp.asarray(detect_mask, jnp.float32),
    ))

    poses_xyzxyzw, pnp_add = [], []
    for i in range(n_samples):
        if valid[i]:
            poses_xyzxyzw.append(
                translations[i].tolist() + quaternions[i].tolist()
            )
            pnp_add.append(float(adds[i]))
        else:
            poses_xyzxyzw.append([-999.99] * 7)
            pnp_add.append(-999.99)

    os.makedirs(args.output_dir, exist_ok=True)
    write_pnp_csv(
        os.path.join(args.output_dir, "pnp_results.csv"),
        names, valid.tolist(), poses_xyzxyzw, pnp_add, n_inframe.tolist(),
    )
    metrics = pnp_metrics(pnp_add, n_inframe)

    lines = [
        f"PnP re-solve of: {args.keypoints_csv}",
        f"Dataset: {args.dataset_dir}",
        f"Solver: {'ransac' if args.ransac else 'plain'}"
        + (f" + reject_outliers_px={args.pnp_reject_outliers_px}"
           if args.pnp_reject_outliers_px is not None else ""),
        f"Rotation convention: {args.rotation_convention}",
        "",
        "Percentage of frames where PNP failed when viable (incorrect): "
        f"{100.0 * metrics['num_pnp_not_found'] / max(metrics['num_pnp_possible'], 1):.3f}% "
        f"({metrics['num_pnp_not_found']}/{metrics['num_pnp_possible']})",
        "Percentage of frames where PNP was successful when viable (correct): "
        f"{100.0 * metrics['num_pnp_found'] / max(metrics['num_pnp_possible'], 1):.3f}% "
        f"({metrics['num_pnp_found']}/{metrics['num_pnp_possible']})",
        "ADD (m) for frames where PNP was successful when viable "
        f"(n = {metrics['num_pnp_found']}):",
        f"   AUC: {metrics['add_auc']:.5f}",
        f"      AUC threshold: {metrics['add_auc_thresh']:.5f}",
        f"   Mean: {metrics['add_mean']:.5f}",
        f"   Median: {metrics['add_median']:.5f}",
        f"   Std Dev: {metrics['add_std']:.5f}",
    ]
    report = "\n".join(lines)
    print(report)
    with open(os.path.join(args.output_dir, "pnp_resolve_results.txt"),
              "w") as f:
        f.write(report + "\n")
    return metrics


def make_parser():
    parser = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawTextHelpFormatter
    )
    parser.add_argument("-k", "--keypoints-csv", required=True,
                        help="keypoints.csv from a prior dataset analysis.")
    parser.add_argument("-d", "--dataset-dir", required=True,
                        help="The NDDS dataset the analysis ran on (for GT "
                             "3D keypoints + intrinsics).")
    parser.add_argument("-m", "--manipulator-config", required=True,
                        help="Manipulator YAML (keypoint names/order).")
    parser.add_argument("-o", "--output-dir", required=True)
    parser.add_argument("--ransac", action="store_true", default=False)
    parser.add_argument("--pnp-reject-outliers-px", type=float, default=None)
    parser.add_argument("--rotation-convention", default="standard",
                        choices=["standard", "transposed"],
                        help="ADD rotation convention (see "
                             "geometric_vision.add_from_pose).")
    return parser


if __name__ == "__main__":
    resolve_pnp(make_parser().parse_args())
