"""Metric golden-value tests + CSV writers.

The reference has no direct unit tests for its metrics (only the self-checks
in oks_plots/add_plots); these golden tests pin the definitions.
"""

import csv
import os

import numpy as np

from dream_tpu.analysis import (
    keypoint_metrics,
    pnp_metrics,
    write_keypoint_csv,
    write_pnp_csv,
)


def _reference_keypoint_auc(kp_l2_errors, num_gt_inframe, thresh=20.0):
    """Literal port of reference dream/analysis.py:910-923 (loop form)."""
    delta_pixel = 0.01
    pck_values = np.arange(0, thresh, delta_pixel)
    y_values = []
    for value in pck_values:
        y_values.append(len(np.where(kp_l2_errors < value)[0]))
    return np.trapezoid(y_values, dx=delta_pixel) / thresh / num_gt_inframe


def test_keypoint_metrics_bookkeeping():
    res = (100, 100)
    gt = np.array([
        [50.0, 50.0],   # in frame, found
        [10.0, 10.0],   # in frame, missing
        [120.0, 50.0],  # out of frame, missing (correct)
        [-5.0, 50.0],   # out of frame, found (incorrect)
    ])
    det = np.array([
        [52.0, 50.0],
        [-999.999, -999.999],
        [-999.999, -999.999],
        [3.0, 50.0],
    ])
    m = keypoint_metrics(det, gt, res)
    assert m["num_gt_inframe"] == 2
    assert m["num_found_gt_inframe"] == 1
    assert m["num_missing_gt_inframe"] == 1
    assert m["num_gt_outframe"] == 2
    assert m["num_missing_gt_outframe"] == 1
    assert m["num_found_gt_outframe"] == 1
    np.testing.assert_allclose(m["l2_error_mean_px"], 2.0)


def test_keypoint_auc_matches_reference_loop():
    rng = np.random.RandomState(0)
    n = 500
    gt = rng.uniform(5, 95, size=(n, 2))
    det = gt + rng.randn(n, 2) * 4.0
    det[::10] = [-999.999, -999.999]  # some missing

    m = keypoint_metrics(det, gt, (100, 100))
    found = ~((det[:, 0] < -999.0) & (det[:, 1] < -999.0))
    errors = np.linalg.norm(det[found] - gt[found], axis=1)
    expected = _reference_keypoint_auc(errors, n)
    np.testing.assert_allclose(m["l2_error_auc"], expected, rtol=1e-9)


def test_pnp_metrics_golden():
    # 6 frames: 4 successes, 1 failure (-999.99), 1 not-possible (3 inframe).
    pnp_add = [0.01, 0.02, 0.05, 0.2, -999.99, -999.99]
    n_inframe = [7, 7, 6, 5, 4, 3]
    m = pnp_metrics(pnp_add, n_inframe)
    assert m["num_pnp_possible"] == 5
    assert m["num_pnp_found"] == 4
    assert m["num_pnp_not_found"] == 1
    np.testing.assert_allclose(m["add_mean"], np.mean([0.01, 0.02, 0.05, 0.2]))

    # AUC oracle: literal port of reference dream/analysis.py:970-980.
    add_found = np.array([0.01, 0.02, 0.05, 0.2])
    delta = 0.00001
    values = np.arange(0.0, 0.1, delta)
    counts = [len(np.where(add_found <= v)[0]) / 5.0 for v in values]
    expected = np.trapezoid(counts, dx=delta) / 0.1
    np.testing.assert_allclose(m["add_auc"], expected, rtol=1e-9)


def test_csv_writers(tmp_path):
    names = ["000000", "000001"]
    det = np.arange(2 * 3 * 2, dtype=float).reshape(2, 3, 2)
    gt = det + 1.0
    kp_path = str(tmp_path / "keypoints.csv")
    write_keypoint_csv(kp_path, names, det, gt)
    with open(kp_path) as f:
        rows = list(csv.reader(f))
    assert rows[0] == (
        ["name"]
        + ["kp0x", "kp0y", "kp1x", "kp1y", "kp2x", "kp2y"]
        + ["kp0x_gt", "kp0y_gt", "kp1x_gt", "kp1y_gt", "kp2x_gt", "kp2y_gt"]
    )
    assert rows[1][0] == "000000"
    assert float(rows[1][1]) == 0.0 and float(rows[1][7]) == 1.0

    pnp_path = str(tmp_path / "pnp_results.csv")
    write_pnp_csv(
        pnp_path, names, [True, False],
        [[1, 2, 3, 0, 0, 0, 1], [-999.99] * 7],
        [0.05, -999.99], [7, 3],
    )
    with open(pnp_path) as f:
        rows = list(csv.reader(f))
    assert rows[0][:2] == ["name", "pnp_success"]
    assert rows[2][1] == "False"


def test_sample_range_analysis(tmp_path):
    import jax.numpy as jnp
    from PIL import Image

    from dream_tpu.analysis import sample_range_analysis
    from dream_tpu.ops.belief_maps import create_belief_maps

    kp = jnp.array([[[10.0, 10.0], [20.0, 15.0], [5.0, 20.0], [15.0, 5.0]]])
    maps = np.asarray(create_belief_maps(kp, (32, 24)))  # [1, 4, 24, 32]
    net_in = [Image.new("RGB", (128, 96))]

    sample_range_analysis(
        raw_images=[None],
        sample_kp_proj_detected_netout=np.asarray(kp),
        sample_kp_proj_gt_netout=np.asarray(kp) + 1.0,
        sample_belief_maps=maps,
        sample_names=["000001"],
        sample_ranks=[0],
        image_prefix="best",
        output_dir=str(tmp_path),
        keypoint_names=["a", "b", "c", "d"],
        images_net_input=net_in,
    )
    files = sorted(os.listdir(tmp_path))
    assert "best_belief_maps_rank_0_id_000001.png" in files
    assert "best_belief_maps_kp_rank_0_id_000001.png" in files
    assert "best_net_input_kp_rank_0_id_000001.png" in files
