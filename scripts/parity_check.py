#!/usr/bin/env python3
"""One-command real-data parity runbook against the reference's published numbers.

This build environment has zero egress: the panda-3cam datasets and the
released ``.pth`` checkpoints (reference trained_models/DOWNLOAD.sh,
data/DOWNLOAD.sh) cannot be fetched, so the reference's headline numbers
(PCK AUC ~0.720 / ADD AUC ~0.792 on panda-3cam_realsense with
panda_dream_vgg_q, reference README.md:54-70) cannot be reproduced here.

The moment the assets exist, parity is ONE command:

    python scripts/parity_check.py \
        --pth /path/to/panda_dream_vgg_q.pth \
        --arch vgg \
        --arch-config arch_configs/dream_vgg_q.yaml \
        --manip-config manip_configs/panda.yaml \
        --dataset /path/to/panda-3cam_realsense \
        --output-dir /tmp/parity_out

which:

1. converts the torch checkpoint to a dream_tpu .msgpack
   (scripts/convert_torch_weights.py mapping, value-parity tested in
   tests/test_weight_conversion.py);
2. assembles the inference network config (arch + manipulator YAML merge,
   same as training would);
3. runs the full dataset analysis (identical PCK/ADD metric definitions,
   dream_tpu/analysis.py);
4. prints the PCK/ADD AUC table against the published targets;
5. if a reference-produced ``pnp_results.csv`` is supplied
   (``--reference-pnp-csv``), ALSO resolves the add_from_pose
   rotation-convention question empirically (see
   dream_tpu/ops/geometric_vision.py:add_from_pose): recomputes ADD from the
   reference's own poses under both conventions and reports which matches
   the reference's ``add`` column.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PUBLISHED = {"pck_auc": 0.720, "add_auc": 0.792}  # reference README.md:67


def resolve_add_convention(reference_pnp_csv: str, dataset_dir: str,
                           manipulator_name: str, keypoint_names):
    """Recompute ADD from the reference's own poses under both rotation
    conventions; return which matches its add column ('standard'|'transposed')."""
    import csv

    import jax.numpy as jnp
    import numpy as np

    from dream_tpu.ops import geometric_vision as gv
    from dream_tpu.utils import find_ndds_data_in_dir
    from dream_tpu.utils.ndds import load_keypoints

    found, _ = find_ndds_data_in_dir(dataset_dir)
    pos_by_name = {}
    for datum in found:
        kp = load_keypoints(datum["data_path"], manipulator_name, keypoint_names)
        pos_by_name[datum["name"]] = np.asarray(kp["positions_wrt_cam"], float)

    diffs = {"standard": [], "transposed": []}
    n_used = 0
    with open(reference_pnp_csv) as f:
        for row in csv.DictReader(f):
            if row.get("pnp_success", "True") not in ("True", "true", "1"):
                continue
            add_ref = float(row["add"])
            if add_ref <= -999.0 or row["name"] not in pos_by_name:
                continue
            t = np.array([float(row[k]) for k in ("pose_x", "pose_y", "pose_z")])
            q = np.array(
                [float(row[k]) for k in ("pose_qx", "pose_qy", "pose_qz", "pose_qw")]
            )
            X = pos_by_name[row["name"]]
            for conv in diffs:
                add = float(
                    gv.add_from_pose(
                        jnp.asarray(t, jnp.float32), jnp.asarray(q, jnp.float32),
                        jnp.asarray(X, jnp.float32), rotation_convention=conv,
                    )
                )
                diffs[conv].append(abs(add - add_ref))
            n_used += 1
    if not n_used:
        return None, {}
    means = {c: float(np.mean(v)) for c, v in diffs.items()}
    winner = min(means, key=means.get)
    return winner, {"n_frames": n_used, "mean_abs_diff_m": means}


def main():
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("--pth", required=True,
                        help="Reference released .pth checkpoint.")
    parser.add_argument("--arch", choices=["vgg", "resnet"], required=True)
    parser.add_argument("--arch-config", required=True)
    parser.add_argument("--manip-config", required=True)
    parser.add_argument("--dataset", required=True,
                        help="Real NDDS dataset dir (e.g. panda-3cam_realsense).")
    parser.add_argument("--output-dir", required=True)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--reference-pnp-csv", default=None,
                        help="pnp_results.csv produced by the REFERENCE "
                             "implementation on the same dataset; enables the "
                             "ADD rotation-convention resolution.")
    args = parser.parse_args()

    for path in (args.pth, args.arch_config, args.manip_config, args.dataset):
        assert os.path.exists(path), f"Missing: {path}"
    os.makedirs(args.output_dir, exist_ok=True)
    scripts_dir = os.path.dirname(os.path.abspath(__file__))

    # 1. Convert weights.
    msgpack_path = os.path.join(args.output_dir, "converted_params.msgpack")
    subprocess.run(
        [sys.executable, os.path.join(scripts_dir, "convert_torch_weights.py"),
         "-i", args.pth, "-a", args.arch, "-o", msgpack_path],
        check=True,
    )

    # 2. Assemble the inference config (same merge as the trainer).
    from dream_tpu.utils import load_yaml, save_yaml

    manip = load_yaml(args.manip_config)["manipulator"]
    arch_file = load_yaml(args.arch_config)
    config = {
        "data_path": args.dataset,
        "manipulator": manip,
        "architecture": arch_file["architecture"],
        "training": {
            "config": arch_file["training"]["config"],
            "platform": {},
            "results": {},
        },
    }
    config_path = os.path.join(args.output_dir, "converted_params.yaml")
    save_yaml(config, config_path, overwrite=True)

    # 3. Full dataset analysis with reference-identical metric definitions.
    from dream_tpu import analysis as dream_analysis

    analysis_dir = os.path.join(args.output_dir, "analysis")
    kp_metrics, pnp_results = dream_analysis.analyze_ndds_dataset(
        msgpack_path, config_path, args.dataset, analysis_dir,
        visualize_belief_maps=False, pnp_analysis=True,
        force_overwrite=True, batch_size=args.batch_size,
    )

    # 4. Parity table.
    pck = kp_metrics["l2_error_auc"]
    add = pnp_results["add_auc"]
    print("\n================ PARITY vs reference README.md:67 ================")
    print(f"  PCK AUC: {pck:.4f}   (published ~{PUBLISHED['pck_auc']:.3f}, "
          f"delta {pck - PUBLISHED['pck_auc']:+.4f})")
    print(f"  ADD AUC: {add:.4f}   (published ~{PUBLISHED['add_auc']:.3f}, "
          f"delta {add - PUBLISHED['add_auc']:+.4f})")
    print(f"  full report: {os.path.join(analysis_dir, 'analysis_results.txt')}")

    # 5. Optional: resolve the ADD rotation-convention question.
    if args.reference_pnp_csv:
        keypoint_names = [k["name"] for k in manip["keypoints"]]
        winner, detail = resolve_add_convention(
            args.reference_pnp_csv, args.dataset, manip["name"], keypoint_names
        )
        if winner is None:
            print("  convention check: no usable rows in the reference CSV")
        else:
            print(f"  add_from_pose rotation convention matching the "
                  f"reference: {winner}  {detail}")
            if winner != "standard":
                print("  -> rerun analysis with "
                      "add_from_pose(rotation_convention='transposed') for "
                      "bit-parity ADD numbers.")


if __name__ == "__main__":
    main()
