"""Batch evaluation: dataset inference -> keypoint + PnP metrics + reports.

TPU-native rebuild of the reference analysis engine
(reference dream/analysis.py:93-994) with *identical metric definitions* so
numbers are directly comparable:

- PCK AUC: threshold sweep 0 -> 20 px in 0.01 px steps, trapezoidal rule,
  normalized by threshold and by the number of in-frame GT keypoints
  (reference dream/analysis.py:910-923);
- ADD AUC: sweep 0 -> 0.1 m in 1e-5 steps, denominator = frames with >= 4
  in-frame GT keypoints (reference dream/analysis.py:965-980);
- in/out-of-frame and found/missing bookkeeping with the -999 sentinels
  (reference dream/analysis.py:858-944).

The inference loop itself is batched and fully on device (model forward +
peak decode in one jit; PnP vmapped over the batch), vs. the reference's
per-image CPU peak extraction and per-frame cv2 PnP calls.
"""

from __future__ import annotations

import csv
import functools
import os
from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from dream_tpu import data as dream_data
from dream_tpu.network import create_network_from_config_file
from dream_tpu.ops import coords as coord_ops
from dream_tpu.ops import geometric_vision as gv
from dream_tpu.utils import (
    find_ndds_data_in_dir,
    is_ndds_dataset,
    load_camera_intrinsics,
    load_image_resolution,
    makedirs,
)

def plot_train_valid_loss(
    epochs, training_loss, validation_loss, dataset_name=None, save_plot_path=None
):
    """Training-vs-validation loss plot (reference dream/analysis.py:22-90)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    assert len(epochs) == len(training_loss)
    assert len(epochs) == len(validation_loss)

    plot_title = "Training vs. validation loss"
    fig, ax = plt.subplots()

    if isinstance(training_loss[0], float):
        ax.plot(epochs, training_loss, ".-", label="Training")
        ax.plot(epochs, validation_loss, ".-", label="Validation")
    else:
        plot_title += " (batch-wise mean +- 1 stdev)"
        ax.errorbar(
            epochs, [np.mean(x) for x in training_loss],
            yerr=[np.std(x) for x in training_loss],
            marker=".", linestyle="-", label="Training",
        )
        ax.errorbar(
            epochs, [np.mean(x) for x in validation_loss],
            yerr=[np.std(x) for x in validation_loss],
            marker=".", linestyle="-", label="Validation",
        )

    ax.grid()
    plt.xlabel("Training epoch")
    plt.ylabel("Loss")
    plt.xlim((epochs[0], epochs[-1]))
    if dataset_name:
        plot_title += f": {dataset_name}"
    plt.title(plot_title)
    ax.legend(loc="best")
    if save_plot_path:
        plt.savefig(save_plot_path)
    return fig, ax


# -----------------------------------------------------------------------------
# Metrics (vectorized, definitionally identical to the reference)
# -----------------------------------------------------------------------------


def keypoint_metrics(
    keypoints_detected,
    keypoints_gt,
    image_resolution,
    auc_pixel_threshold: float = 20.0,
) -> Dict:
    """Parity: reference dream/analysis.py:858-944."""
    det = np.asarray(keypoints_detected, dtype=float)
    gt = np.asarray(keypoints_gt, dtype=float)

    gt_outframe = (
        (gt[:, 0] < 0.0)
        | (gt[:, 0] > image_resolution[0])
        | (gt[:, 1] < 0.0)
        | (gt[:, 1] > image_resolution[1])
    )
    detected_missing = (det[:, 0] < -999.0) & (det[:, 1] < -999.0)

    num_gt_outframe = int(np.sum(gt_outframe))
    num_missing_gt_outframe = int(np.sum(gt_outframe & detected_missing))
    num_found_gt_outframe = int(np.sum(gt_outframe & ~detected_missing))
    num_gt_inframe = int(np.sum(~gt_outframe))
    num_missing_gt_inframe = int(np.sum(~gt_outframe & detected_missing))
    num_found_gt_inframe = int(np.sum(~gt_outframe & ~detected_missing))

    found_mask = ~gt_outframe & ~detected_missing
    kp_errors = det[found_mask] - gt[found_mask]

    if len(kp_errors) > 0:
        kp_l2_errors = np.linalg.norm(kp_errors, axis=1)
        kp_l2_error_mean = float(np.mean(kp_l2_errors))
        kp_l2_error_median = float(np.median(kp_l2_errors))
        kp_l2_error_std = float(np.std(kp_l2_errors))

        delta_pixel = 0.01
        pck_values = np.arange(0, auc_pixel_threshold, delta_pixel)
        # counts of errors strictly below each threshold (reference :916)
        y_values = np.sum(
            kp_l2_errors[None, :] < pck_values[:, None], axis=1
        )
        kp_auc = float(
            np.trapezoid(y_values, dx=delta_pixel)
            / auc_pixel_threshold
            / num_gt_inframe
        )
    else:
        kp_l2_error_mean = None
        kp_l2_error_median = None
        kp_l2_error_std = None
        kp_auc = None

    return {
        "num_gt_outframe": num_gt_outframe,
        "num_missing_gt_outframe": num_missing_gt_outframe,
        "num_found_gt_outframe": num_found_gt_outframe,
        "num_gt_inframe": num_gt_inframe,
        "num_found_gt_inframe": num_found_gt_inframe,
        "num_missing_gt_inframe": num_missing_gt_inframe,
        "l2_error_mean_px": kp_l2_error_mean,
        "l2_error_median_px": kp_l2_error_median,
        "l2_error_std_px": kp_l2_error_std,
        "l2_error_auc": kp_auc,
        "l2_error_auc_thresh_px": auc_pixel_threshold,
    }


def pnp_metrics(
    pnp_add,
    num_inframe_projs_gt,
    num_min_inframe_projs_gt_for_pnp: int = 4,
    add_auc_threshold: float = 0.1,
    pnp_magic_number: float = -999.0,
) -> Dict:
    """Parity: reference dream/analysis.py:947-994."""
    pnp_add = np.asarray(pnp_add, dtype=float)
    num_inframe_projs_gt = np.asarray(num_inframe_projs_gt)

    found_mask = pnp_add > pnp_magic_number
    add_pnp_found = pnp_add[found_mask]
    num_pnp_found = int(np.sum(found_mask))

    mean_add = float(np.mean(add_pnp_found)) if num_pnp_found else float("nan")
    median_add = float(np.median(add_pnp_found)) if num_pnp_found else float("nan")
    std_add = float(np.std(add_pnp_found)) if num_pnp_found else float("nan")

    num_pnp_possible = int(
        np.sum(num_inframe_projs_gt >= num_min_inframe_projs_gt_for_pnp)
    )
    num_pnp_not_found = num_pnp_possible - num_pnp_found

    delta_threshold = 0.00001
    add_threshold_values = np.arange(0.0, add_auc_threshold, delta_threshold)
    counts = (
        np.sum(add_pnp_found[None, :] <= add_threshold_values[:, None], axis=1)
        / float(num_pnp_possible)
        if num_pnp_possible
        else np.zeros_like(add_threshold_values)
    )
    auc = float(np.trapezoid(counts, dx=delta_threshold) / add_auc_threshold)

    return {
        "num_pnp_found": num_pnp_found,
        "num_pnp_not_found": num_pnp_not_found,
        "num_pnp_possible": num_pnp_possible,
        "num_min_inframe_projs_gt_for_pnp": num_min_inframe_projs_gt_for_pnp,
        "pnp_magic_number": pnp_magic_number,
        "add_mean": mean_add,
        "add_median": median_add,
        "add_std": std_add,
        "add_auc": auc,
        "add_auc_thresh": add_auc_threshold,
    }


# -----------------------------------------------------------------------------
# CSV writers (reference dream/analysis.py:767-855)
# -----------------------------------------------------------------------------


def write_keypoint_csv(keypoint_path, sample_names, keypoints_detected, keypoints_gt):
    keypoints_detected = np.asarray(keypoints_detected)
    keypoints_gt = np.asarray(keypoints_gt)
    assert keypoints_detected.shape == keypoints_gt.shape
    n_samples = len(sample_names)
    assert n_samples == keypoints_detected.shape[0]
    n_keypoints, n_dims = keypoints_detected.shape[1], keypoints_detected.shape[2]
    assert n_dims == 2
    n_elems = n_keypoints * n_dims

    with open(keypoint_path, "w", newline="") as csvfile:
        writer = csv.writer(csvfile)
        header = ["name"]
        header += [f"kp{k}{a}" for k in range(n_keypoints) for a in ("x", "y")]
        header += [f"kp{k}{a}_gt" for k in range(n_keypoints) for a in ("x", "y")]
        writer.writerow(header)
        for name, det, gt in zip(sample_names, keypoints_detected, keypoints_gt):
            writer.writerow(
                [name] + det.reshape(n_elems).tolist() + gt.reshape(n_elems).tolist()
            )


def write_pnp_csv(
    pnp_path, sample_names, pnp_attempts_successful, poses, pnp_add,
    num_inframe_projs_gt,
):
    n = len(sample_names)
    assert n == len(pnp_attempts_successful) == len(poses)
    assert n == len(num_inframe_projs_gt) == len(pnp_add)
    with open(pnp_path, "w", newline="") as csvfile:
        writer = csv.writer(csvfile)
        writer.writerow(
            ["name", "pnp_success", "pose_x", "pose_y", "pose_z",
             "pose_qx", "pose_qy", "pose_qz", "pose_qw", "add",
             "n_inframe_gt_projs"]
        )
        for name, ok, pose, add, n_inframe in zip(
            sample_names, pnp_attempts_successful, poses, pnp_add,
            num_inframe_projs_gt,
        ):
            writer.writerow([name] + [ok] + list(pose) + [add] + [n_inframe])


# -----------------------------------------------------------------------------
# Dataset analysis (reference dream/analysis.py:93-764)
# -----------------------------------------------------------------------------


def analyze_ndds_dataset(
    network_params_path,
    network_config_path,
    dataset_dir,
    output_dir,
    visualize_belief_maps: bool = True,
    pnp_analysis: bool = True,
    force_overwrite: bool = False,
    image_preprocessing_override: Optional[str] = None,
    batch_size: int = 16,
    num_workers: int = 8,
    dream_network=None,
    pnp_ransac: bool = False,
    pnp_weight_by_score: bool = False,
    pnp_reject_outliers_px: Optional[float] = None,
    pnp_soft_detections: bool = False,
    pnp_soft_min_score: float = 0.05,
    int8_calibration_frames: int = 0,
):
    """Run inference over an NDDS dataset; write keypoints.csv,
    pnp_results.csv, analysis_results.txt, and sample mosaics.

    PnP options beyond reference parity (all default off):

    - ``pnp_ransac``: the reference's (disabled-by-default) RANSAC variant.
    - ``pnp_weight_by_score``: weight each correspondence by its belief-map
      peak score in the least-squares solve (normalized to max 1 and floored
      at 0.3 — strongly unequal weights measurably distort the solve on
      near-degenerate configurations).
    - ``pnp_reject_outliers_px``: after a first solve, drop correspondences
      reprojecting worse than this many pixels and re-solve (when >=4
      survive) — counters one confidently-wrong detection dragging the pose.
    - ``pnp_soft_detections``: feed PnP the best belief-map peak for EVERY
      keypoint whose score clears ``pnp_soft_min_score``, even when the 0.25
      score-gap disambiguation rejects it from the keypoint metrics — on
      compact/ambiguous poses the canonical detections can drop below the
      4-point PnP floor while the top peaks are still mostly right; weighting
      plus outlier rejection absorbs the wrong ones.  Implies
      ``pnp_weight_by_score``; PCK metrics are unaffected.
    """
    need_scores = pnp_weight_by_score or pnp_soft_detections
    assert os.path.exists(network_params_path)
    assert os.path.exists(network_config_path)
    assert os.path.exists(dataset_dir)
    assert is_ndds_dataset(dataset_dir), (
        f'Expected dataset_dir "{dataset_dir}" to be an NDDS Dataset, but it is not.'
    )
    assert isinstance(batch_size, int) and batch_size > 0

    makedirs(output_dir, exist_ok=force_overwrite)

    if dream_network is None:
        dream_network = create_network_from_config_file(
            network_config_path, network_params_path
        )
    dream_network.enable_evaluation()

    image_preprocessing = (
        image_preprocessing_override
        if image_preprocessing_override
        else dream_network.image_preprocessing()
    )

    found = find_ndds_data_in_dir(dataset_dir)
    image_raw_resolution = load_image_resolution(found[1]["camera"])
    network_input_res_inf, network_output_res_inf = (
        dream_network.net_resolutions_from_image_raw_resolution(
            image_raw_resolution, image_preprocessing_override=image_preprocessing
        )
    )

    dataset = dream_data.ManipulatorNDDSDataset(
        found,
        dream_network.manipulator_name,
        dream_network.keypoint_names,
        network_input_res_inf,
        network_output_res_inf,
        dream_network.image_normalization,
        image_preprocessing,
        augment_data=False,
        include_ground_truth=True,
        include_belief_maps=False,
        debug_mode=dream_data.ManipulatorNDDSDatasetDebugLevels.LIGHT,
        n_decode_threads=max(num_workers, 1),
    )
    loader = dream_data.DataLoader(
        dataset, batch_size, shuffle=False, drop_last=False
    )
    process = dream_data.make_batch_processor(
        image_raw_resolution, network_input_res_inf, network_output_res_inf,
        image_preprocessing, dream_network.image_normalization,
        augment=False, include_belief_maps=False,
    )

    to_netin = coord_ops.affine_netin_from_netout(
        network_output_res_inf, network_input_res_inf
    )
    to_raw = coord_ops.affine_raw_from_netin(
        network_input_res_inf, image_raw_resolution, image_preprocessing
    )
    kp_to_raw = to_raw.compose(to_netin)

    all_kp_projs_detected_raw: List[np.ndarray] = []
    all_kp_projs_gt_raw: List[np.ndarray] = []
    all_gt_kp_positions: List[np.ndarray] = []
    all_peak_scores: List[np.ndarray] = []
    all_soft_detected_raw: List[np.ndarray] = []
    sample_results = []
    sample_names_all: List[str] = []
    sample_idx = 0

    if int8_calibration_frames:
        # Quantize the conv stack to int8 (2x MXU rate on v5e), calibrating
        # activation scales on the first N frames of this dataset
        # (dream_tpu extension — see DreamNetwork.enable_int8_inference).
        print(f"Calibrating int8 inference on {int8_calibration_frames} frames...")
        dream_network.enable_int8_inference(
            dream_data.collect_calibration_batches(
                dataset, process, int8_calibration_frames, batch_size
            )
        )

    print("Conducting inference...")
    for host_batch in loader:
        batch = process(
            jax.random.PRNGKey(0),
            jnp.asarray(host_batch["image_rgb_raw"]),
            jnp.asarray(host_batch["keypoint_projections_raw"]),
        )
        if need_scores:
            _, detected_netout, peak_scores, best_netout = (
                dream_network.inference_detailed(batch["image_rgb_input"])
            )
            all_peak_scores.append(np.asarray(peak_scores))
            if pnp_soft_detections:
                all_soft_detected_raw.append(np.asarray(kp_to_raw(best_netout)))
        else:
            _, detected_netout = dream_network.inference(batch["image_rgb_input"])
        # Sentinel-preserving conversion netout -> raw (scales sentinels like
        # the reference; the < -999 checks still hold).
        detected_raw = np.asarray(kp_to_raw(detected_netout))

        gt_raw = np.asarray(host_batch["keypoint_projections_raw"], dtype=float)
        names = dataset.sample_names(host_batch["indices"])

        for b in range(detected_raw.shape[0]):
            all_kp_projs_detected_raw.append(detected_raw[b])
            all_kp_projs_gt_raw.append(gt_raw[b])
            if pnp_analysis:
                all_gt_kp_positions.append(
                    np.asarray(host_batch["keypoint_positions"][b], dtype=float)
                )

            # Per-sample mean L2 metric over in-frame detected keypoints
            # (reference dream/analysis.py:243-265).
            keep = (
                ~((detected_raw[b][:, 0] < -999.0) & (detected_raw[b][:, 1] < -999.0))
                & (gt_raw[b][:, 0] >= 0.0)
                & (gt_raw[b][:, 0] <= image_raw_resolution[0])
                & (gt_raw[b][:, 1] >= 0.0)
                & (gt_raw[b][:, 1] <= image_raw_resolution[1])
            )
            if np.any(keep):
                this_metric = float(
                    np.mean(
                        np.linalg.norm(
                            detected_raw[b][keep] - gt_raw[b][keep], axis=1
                        )
                    )
                )
            else:
                this_metric = 999.999
            sample_results.append(
                (
                    sample_idx,
                    {"name": names[b], "detected_raw": detected_raw[b]},
                    this_metric,
                )
            )
            sample_names_all.append(names[b])
            sample_idx += 1

    all_kp_projs_detected_raw = np.array(all_kp_projs_detected_raw)
    all_kp_projs_gt_raw = np.array(all_kp_projs_gt_raw)
    n_samples = len(sample_results)
    n_kp = dream_network.n_keypoints

    kp_metrics_result = keypoint_metrics(
        all_kp_projs_detected_raw.reshape(n_samples * n_kp, 2),
        all_kp_projs_gt_raw.reshape(n_samples * n_kp, 2),
        image_raw_resolution,
    )
    write_keypoint_csv(
        os.path.join(output_dir, "keypoints.csv"),
        sample_names_all, all_kp_projs_detected_raw, all_kp_projs_gt_raw,
    )

    pnp_results = None
    pnp_results_alt = None
    if pnp_analysis:
        camera_K = load_camera_intrinsics(found[1]["camera"])
        all_gt_kp_positions = np.array(all_gt_kp_positions)

        n_inframe = np.sum(
            (all_kp_projs_gt_raw[:, :, 0] > 0.0)
            & (all_kp_projs_gt_raw[:, :, 0] < image_raw_resolution[0])
            & (all_kp_projs_gt_raw[:, :, 1] > 0.0)
            & (all_kp_projs_gt_raw[:, :, 1] < image_raw_resolution[1]),
            axis=1,
        )

        # Batched on-device PnP over all frames at once.  ``pnp_ransac``
        # switches to the RANSAC variant (5 px inlier threshold) — present
        # but disabled by default in the reference too (its call is commented
        # out at dream/analysis.py:329).
        if need_scores:
            scores = np.clip(np.concatenate(all_peak_scores), 0.0, None)
            if pnp_weight_by_score:
                # Normalize per frame to max 1 and floor at 0.3: the weights
                # express relative confidence without distorting the solve's
                # conditioning (strongly unequal weights measurably degrade
                # near-degenerate frames).
                max_s = np.maximum(scores.max(axis=1, keepdims=True), 1e-9)
                solve_weights_np = np.clip(scores / max_s, 0.3, 1.0)
            else:
                # Soft detections with BINARY weights: above-floor peaks
                # participate equally and outlier rejection does the cleanup
                # (continuous weights can flip the depth branch on
                # near-degenerate frames).
                solve_weights_np = np.ones_like(scores)
            if pnp_soft_detections:
                # Zero out peaks below the absolute score floor (no real
                # peak in that belief map at all).
                solve_weights_np = np.where(
                    scores > pnp_soft_min_score, solve_weights_np, 0.0
                )
            solve_weights = jnp.asarray(solve_weights_np, jnp.float32)
        else:
            solve_weights = jnp.ones(
                (n_samples, dream_network.n_keypoints), jnp.float32
            )

        if pnp_soft_detections:
            pnp_input_raw = np.concatenate(all_soft_detected_raw)
        else:
            pnp_input_raw = all_kp_projs_detected_raw

        if pnp_ransac:
            def _solve_one(X, uv, wts, key):
                result, _ = gv.solve_pnp_ransac(
                    X, uv, jnp.asarray(camera_K, jnp.float32),
                    key=key, weights=wts,
                )
                return result

            keys = jax.random.split(
                jax.random.PRNGKey(0), len(all_gt_kp_positions)
            )
            solve = jax.jit(jax.vmap(_solve_one))
            results = solve(
                jnp.asarray(all_gt_kp_positions, jnp.float32),
                jnp.asarray(pnp_input_raw, jnp.float32),
                solve_weights,
                keys,
            )
        else:
            solve = jax.jit(
                jax.vmap(
                    lambda X, uv, wts: gv.solve_pnp(
                        X, uv, jnp.asarray(camera_K, jnp.float32),
                        weights=wts,
                        reject_outliers_px=pnp_reject_outliers_px,
                    )
                )
            )
            results = solve(
                jnp.asarray(all_gt_kp_positions, jnp.float32),
                jnp.asarray(pnp_input_raw, jnp.float32),
                solve_weights,
            )
        valid = np.asarray(results.valid)
        translations = np.asarray(results.translation)
        quaternions = np.asarray(results.quaternion)

        # ADD over the detected-keypoint subset only — the reference passes
        # kp_pos_gt_pnp (the >-999 rows fed to PnP) to add_from_pose
        # (dream/analysis.py:322-339), not all GT keypoints.
        detect_mask = ~(
            (pnp_input_raw[:, :, 0] < -999.0)
            & (pnp_input_raw[:, :, 1] < -999.0)
        )
        if pnp_soft_detections:
            # The soft path feeds every above-floor peak to PnP; the ADD
            # accounting follows what PnP actually used (reference
            # kp_pos_gt_pnp semantics, dream/analysis.py:322-339).
            detect_mask = detect_mask & (np.asarray(solve_weights) > 0.0)
        adds = np.asarray(
            jax.vmap(gv.add_from_pose)(
                results.translation, results.quaternion,
                jnp.asarray(all_gt_kp_positions, jnp.float32),
                jnp.asarray(detect_mask, jnp.float32),
            )
        )
        # Same metric under the alternate rotation convention (the pyrr
        # matrix33 row-vector ambiguity, see gv.add_from_pose).  Reported
        # side-by-side until real reference data settles which one the
        # published numbers used.
        adds_alt = np.asarray(
            jax.vmap(
                functools.partial(gv.add_from_pose,
                                  rotation_convention="transposed")
            )(
                results.translation, results.quaternion,
                jnp.asarray(all_gt_kp_positions, jnp.float32),
                jnp.asarray(detect_mask, jnp.float32),
            )
        )

        pnp_attempts_successful = valid.tolist()
        poses_xyzxyzw = []
        pnp_add = []
        pnp_add_alt = []
        for i in range(n_samples):
            if valid[i]:
                poses_xyzxyzw.append(
                    translations[i].tolist() + quaternions[i].tolist()
                )
                pnp_add.append(float(adds[i]))
                pnp_add_alt.append(float(adds_alt[i]))
            else:
                poses_xyzxyzw.append([-999.99] * 7)
                pnp_add.append(-999.99)
                pnp_add_alt.append(-999.99)

        write_pnp_csv(
            os.path.join(output_dir, "pnp_results.csv"),
            sample_names_all, pnp_attempts_successful, poses_xyzxyzw, pnp_add,
            n_inframe.tolist(),
        )
        pnp_results = pnp_metrics(pnp_add, n_inframe)
        pnp_results_alt = pnp_metrics(pnp_add_alt, n_inframe)

    _write_analysis_report(
        os.path.join(output_dir, "analysis_results.txt"),
        dataset_dir, network_config_path, n_samples,
        kp_metrics_result, pnp_results, pnp_analysis,
        pnp_alt=pnp_results_alt,
    )

    if visualize_belief_maps:
        # IO/encode problems must not fail the analysis, but logic errors in
        # the visualization code should surface rather than be swallowed.
        try:
            _write_sample_mosaics(output_dir, dataset, sample_results)
        except (OSError, MemoryError) as exc:
            print(f"Sample mosaic generation skipped: {exc}")

    return kp_metrics_result, pnp_results


def _write_analysis_report(
    path, dataset_dir, network_config_path, n_samples, kp, pnp, pnp_analysis,
    pnp_alt=None,
):
    """analysis_results.txt writer (reference dream/analysis.py:363-502).

    ``pnp_alt``: the same PnP metrics computed under the alternate
    (transposed-R) ADD rotation convention; reported as an informational
    side-by-side line until real reference data resolves the pyrr matrix33
    ambiguity (see dream_tpu/ops/geometric_vision.py:add_from_pose).
    """
    lines: List[str] = []

    def emit(text):
        print(text)
        lines.append(text)

    emit(f"Analysis results for dataset: {dataset_dir}")
    emit(f"Number of frames in this dataset: {n_samples}")
    emit(f"Using network config defined from: {network_config_path}")
    emit("")

    if kp["num_gt_outframe"] > 0:
        emit(
            "Percentage out-of-frame gt keypoints not found (correct): "
            "{:.3f}% ({}/{})".format(
                kp["num_missing_gt_outframe"] / kp["num_gt_outframe"] * 100.0,
                kp["num_missing_gt_outframe"], kp["num_gt_outframe"],
            )
        )
        emit(
            "Percentage out-of-frame gt keypoints found (incorrect): "
            "{:.3f}% ({}/{})".format(
                kp["num_found_gt_outframe"] / kp["num_gt_outframe"] * 100.0,
                kp["num_found_gt_outframe"], kp["num_gt_outframe"],
            )
        )
    else:
        emit("No out-of-frame gt keypoints.")

    if kp["num_gt_inframe"] > 0:
        emit(
            "Percentage in-frame gt keypoints not found (incorrect): "
            "{:.3f}% ({}/{})".format(
                kp["num_missing_gt_inframe"] / kp["num_gt_inframe"] * 100.0,
                kp["num_missing_gt_inframe"], kp["num_gt_inframe"],
            )
        )
        emit(
            "Percentage in-frame gt keypoints found (correct): "
            "{:.3f}% ({}/{})".format(
                kp["num_found_gt_inframe"] / kp["num_gt_inframe"] * 100.0,
                kp["num_found_gt_inframe"], kp["num_gt_inframe"],
            )
        )
        if kp["num_found_gt_inframe"] > 0:
            emit(
                "L2 error (px) for in-frame keypoints (n = {}):".format(
                    kp["num_found_gt_inframe"]
                )
            )
            emit("   AUC: {:.5f}".format(kp["l2_error_auc"]))
            emit("      AUC threshold: {:.5f}".format(kp["l2_error_auc_thresh_px"]))
            emit("   Mean: {:.5f}".format(kp["l2_error_mean_px"]))
            emit("   Median: {:.5f}".format(kp["l2_error_median_px"]))
            emit("   Std Dev: {:.5f}".format(kp["l2_error_std_px"]))
        else:
            emit("No in-frame gt keypoints were detected.")
    else:
        emit("No in-frame gt keypoints.")
    emit("")

    if pnp_analysis and pnp is not None:
        n_possible = pnp["num_pnp_possible"]
        if n_possible > 0:
            emit(
                "Percentage of frames where PNP failed when viable (incorrect): "
                "{:.3f}% ({}/{})".format(
                    pnp["num_pnp_not_found"] / n_possible * 100.0,
                    pnp["num_pnp_not_found"], n_possible,
                )
            )
            emit(
                "Percentage of frames where PNP was successful when viable (correct): "
                "{:.3f}% ({}/{})".format(
                    pnp["num_pnp_found"] / n_possible * 100.0,
                    pnp["num_pnp_found"], n_possible,
                )
            )
            emit(
                "ADD (m) for frames where PNP was successful when viable (n = {}):".format(
                    pnp["num_pnp_found"]
                )
            )
            emit("   AUC: {:.5f}".format(pnp["add_auc"]))
            emit("      AUC threshold: {:.5f}".format(pnp["add_auc_thresh"]))
            emit("   Mean: {:.5f}".format(pnp["add_mean"]))
            emit("   Median: {:.5f}".format(pnp["add_median"]))
            emit("   Std Dev: {:.5f}".format(pnp["add_std"]))
            if pnp_alt is not None:
                emit(
                    "   [info] ADD AUC / mean under the alternate "
                    "(transposed-R) rotation convention: "
                    "{:.5f} / {:.5f}".format(
                        pnp_alt["add_auc"], pnp_alt["add_mean"]
                    )
                )
                emit(
                    "   [info] Primary numbers above use the 'standard' "
                    "convention (R @ kp + t); see "
                    "dream_tpu/ops/geometric_vision.py:add_from_pose."
                )
        else:
            emit("No frames where PNP is possible.")
        emit("")

    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def sample_range_analysis(
    raw_images,
    sample_kp_proj_detected_netout,
    sample_kp_proj_gt_netout,
    sample_belief_maps,
    sample_names,
    sample_ranks,
    image_prefix,
    output_dir,
    keypoint_names,
    images_net_input,
):
    """Per-sample visual diagnostics over a rank range.

    For each sample writes: a belief-map mosaic, a belief-map mosaic with
    GT (green) + detected (red) keypoint overlays, and a net-input overlay
    with both keypoint sets.  Parity: reference dream/analysis.py:997-1189.

    Args mirror the reference; ``images_net_input`` is a list of PIL images
    (or [B, h, w, 3] float array in [0, 1]).
    """
    import math as _math

    import numpy as np
    from PIL import Image as PILImage

    from dream_tpu import visualize as viz
    from dream_tpu.ops import coords as _coords

    n_keypoints = len(keypoint_names)
    n_cols = int(_math.ceil(n_keypoints / 2.0))

    if not isinstance(images_net_input, (list, tuple)):
        arr = np.asarray(images_net_input)
        images_net_input = [
            PILImage.fromarray(np.uint8(np.clip(a * 255.0, 0, 255))) for a in arr
        ]

    net_output_res = (
        np.asarray(sample_belief_maps[0]).shape[2],
        np.asarray(sample_belief_maps[0]).shape[1],
    )

    for (kp_det, kp_gt, belief_maps, name, rank, net_in_img) in zip(
        sample_kp_proj_detected_netout,
        sample_kp_proj_gt_netout,
        sample_belief_maps,
        sample_names,
        sample_ranks,
        images_net_input,
    ):
        kp_det = np.asarray(kp_det)
        kp_gt = np.asarray(kp_gt)
        belief_map_images = viz.images_from_belief_maps(
            np.asarray(belief_maps), normalization_method=6
        )

        viz.mosaic_images(
            belief_map_images, rows=2, cols=n_cols, inner_padding_px=10
        ).save(
            os.path.join(
                output_dir, f"{image_prefix}_belief_maps_rank_{rank}_id_{name}.png"
            )
        )

        kp_overlaid = [
            viz.overlay_points_on_image(
                belief_map_images[k],
                [kp_gt[k], kp_det[k]],
                annotation_color_dot=["green", "red"],
                point_diameter=4,
            )
            for k in range(n_keypoints)
        ]
        viz.mosaic_images(
            kp_overlaid, rows=2, cols=n_cols, inner_padding_px=10
        ).save(
            os.path.join(
                output_dir, f"{image_prefix}_belief_maps_kp_rank_{rank}_id_{name}.png"
            )
        )

        to_netin = _coords.affine_netin_from_netout(net_output_res, net_in_img.size)
        overlay = viz.overlay_points_on_image(
            net_in_img, to_netin.apply_numpy(kp_gt),
            annotation_color_dot="green", point_diameter=4,
        )
        overlay = viz.overlay_points_on_image(
            overlay, to_netin.apply_numpy(kp_det),
            annotation_color_dot="red", point_diameter=4,
        )
        overlay.save(
            os.path.join(
                output_dir, f"{image_prefix}_net_input_kp_rank_{rank}_id_{name}.png"
            )
        )


def _write_sample_mosaics(output_dir, dataset, sample_results):
    """Best/median/worst sample visualization mosaics
    (reference dream/analysis.py:504-751, simplified composition).

    Reuses the detected keypoints captured during the batched inference loop
    (``sample_results[i][1]["detected_raw"]``) rather than re-running
    per-sample inference.
    """
    from dream_tpu.visualize import mosaic_images, overlay_points_on_image
    from PIL import Image

    n_samples = len(sample_results)
    sorted_results = sorted(sample_results, key=lambda x: x[2])
    n_outliers = min(5, n_samples // 10) if n_samples >= 10 else 1

    groups = {
        "best": sorted_results[:n_outliers],
        "medians": sorted_results[
            int(np.floor(n_samples / 2.0 - n_outliers / 2.0)):
            int(np.floor(n_samples / 2.0 - n_outliers / 2.0)) + n_outliers
        ],
        "worst": sorted_results[n_samples - n_outliers:],
    }
    for group_name, entries in groups.items():
        images = []
        for idx, info, metric in entries:
            raw = dataset.load_images([idx])[0]
            img = Image.fromarray(raw)
            img = overlay_points_on_image(
                img, info["detected_raw"],
                annotation_color_dot="red",
            )
            img = overlay_points_on_image(
                img, dataset.kp_projs_raw[idx], annotation_color_dot="green",
                point_diameter=4.0,
            )
            images.append(img)
        mosaic = mosaic_images(images, rows=1, cols=len(images), inner_padding_px=4)
        mosaic.save(os.path.join(output_dir, f"{group_name}_samples.png"))
