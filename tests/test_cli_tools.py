"""CLI tool smoke tests: plot CLIs on generated CSVs, video visualization
frames, multi-run analysis, and a non-panda (kuka, 8 kp) manipulator path."""

import os
import pickle
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from dream_tpu.analysis import write_keypoint_csv, write_pnp_csv


def test_oks_plots_cli(tmp_path):
    from dream_tpu import oks_plots

    rng = np.random.RandomState(0)
    n = 40
    gt = rng.uniform(10, 470, (n, 7, 2))
    det = gt + rng.randn(n, 7, 2) * 3.0
    csv_path = str(tmp_path / "keypoints.csv")
    write_keypoint_csv(csv_path, [f"{i:06d}" for i in range(n)], det, gt)

    out = str(tmp_path / "pck.pdf")
    oks_plots.main(["--data", csv_path, "--labels", "synth", "--output", out])
    assert os.path.exists(out)

    # Curve/AUC consistency with keypoint_metrics (within the in-frame rules).
    _, _, auc, _ = oks_plots.pck_curve_from_csv(csv_path)
    assert 0.5 < auc <= 1.0


def test_add_plots_cli(tmp_path):
    from dream_tpu import add_plots

    rng = np.random.RandomState(1)
    n = 30
    adds = np.abs(rng.randn(n) * 0.03).tolist()
    adds[0] = -999.99  # one PnP failure
    poses = [[0, 0, 1, 0, 0, 0, 1]] * n
    csv_path = str(tmp_path / "pnp_results.csv")
    write_pnp_csv(csv_path, [f"{i:06d}" for i in range(n)],
                  [a > -999.0 for a in adds], poses, adds, [7] * n)

    out = str(tmp_path / "add.pdf")
    add_plots.main(["--data", csv_path, "--labels", "synth", "--output", out])
    assert os.path.exists(out)

    values, counts, auc, found, n_possible = add_plots.add_curve_from_csv(csv_path)
    assert len(found) == n - 1 and n_possible == n
    assert 0.0 < auc < 1.0


def test_analyze_training_loss_plot(tmp_path):
    from analyze_training import analyze_training

    run_dir = tmp_path / "run"
    run_dir.mkdir()
    log = {
        "epochs": [1, 2, 3],
        "batch_training_losses": [[0.5, 0.4], [0.3, 0.2], [0.15, 0.1]],
        "batch_validation_losses": [[0.6], [0.35], [0.2]],
    }
    with open(run_dir / "training_log.pkl", "wb") as f:
        pickle.dump(log, f)
    (run_dir / "model.msgpack").write_bytes(b"x")
    (run_dir / "model.yaml").write_text("{}")

    class Args:
        input_params_path = str(run_dir / "model.msgpack")
        input_config_path = None
        output_dir = str(tmp_path / "out")
        force_overwrite = False
        analyses = ["loss"]
        batch_size = 1

    analyze_training(Args())
    assert os.path.exists(tmp_path / "out" / "train_valid_loss.png")


def test_analyze_training_multi(tmp_path):
    from analyze_training_multi import analyze_training_multi

    for i, scale in enumerate([1.0, 0.8, 1.3]):
        d = tmp_path / f"train_{i}"
        d.mkdir()
        log = {
            "epochs": [1, 2, 3, 4],
            "losses": [scale * x for x in [0.5, 0.3, 0.2, 0.1]],
            "validation_losses": [scale * x for x in [0.6, 0.4, 0.25, 0.15]],
            "random_seed": i,
        }
        with open(d / "training_log.pkl", "wb") as f:
            pickle.dump(log, f)

    class Args:
        input_dir = str(tmp_path)
        output_dir = str(tmp_path / "agg")
        force_overwrite = False

    analyze_training_multi(Args())
    out = set(os.listdir(tmp_path / "agg"))
    assert "training_results_instances.png" in out
    assert "training_results_aggregate.png" in out


@pytest.mark.parametrize("manip,n_kp", [("kuka", 8), ("baxter", 17)])
def test_other_manipulators_end_to_end(tmp_path, manip, n_kp):
    """Full kuka/baxter path: synthetic data with their keypoint names ->
    network build -> batch processor -> inference shapes."""
    import jax
    import jax.numpy as jnp

    from dream_tpu import data as dream_data
    from dream_tpu.network import DreamNetwork
    from dream_tpu.utils.config import load_yaml

    manip_cfg = load_yaml(os.path.join(REPO, "manip_configs", f"{manip}.yaml"))
    kp_names = [k["name"] for k in manip_cfg["manipulator"]["keypoints"]]
    assert len(kp_names) == n_kp

    data_dir = str(tmp_path / "data")
    dream_data.generate_synthetic_ndds(
        data_dir, n_frames=4, image_resolution=(160, 120),
        keypoint_names=kp_names, object_class=manip, seed=2,
    )

    cfg = {
        "architecture": {
            "type": "vgg", "target": "belief_maps",
            "input_heads": ["image_rgb"], "output_heads": ["belief_maps"],
            "image_normalization": {"mean": [0.5] * 3, "stdev": [0.5] * 3},
            "loss": {"type": "mse"},
            "image_preprocessing": "resize",
        },
        "manipulator": manip_cfg["manipulator"],
        "training": {"config": {"net_input_resolution": [64, 64]},
                     "platform": {}},
    }
    net = DreamNetwork(cfg)
    net.init_variables()

    ds = dream_data.ManipulatorNDDSDataset(
        data_dir, manip, kp_names, (64, 64), (16, 16),
        net.image_normalization, "resize",
    )
    proc = dream_data.make_batch_processor(
        ds.image_raw_resolution, (64, 64), (16, 16), "resize",
        net.image_normalization, include_belief_maps=True,
    )
    hb = ds.host_batch([0, 1])
    batch = proc(jax.random.PRNGKey(0), jnp.asarray(hb["image_rgb_raw"]),
                 jnp.asarray(hb["keypoint_projections_raw"]))
    assert batch["belief_maps"].shape == (2, n_kp, 16, 16)
    belief, kps = net.inference(batch["image_rgb_input"])
    assert belief.shape == (2, n_kp, 16, 16)
    assert kps.shape == (2, n_kp, 2)


def test_parity_check_add_convention_resolution(tmp_path):
    """parity_check.resolve_add_convention detects which rotation convention
    a reference pnp_results.csv was computed with (the pyrr matrix33
    ambiguity, see dream_tpu/ops/geometric_vision.py:add_from_pose)."""
    import csv

    import jax.numpy as jnp

    from dream_tpu import data as dream_data
    from dream_tpu.ops import geometric_vision as gv
    from dream_tpu.utils import find_ndds_data_in_dir
    from dream_tpu.utils.ndds import load_keypoints
    from parity_check import resolve_add_convention

    data_dir = str(tmp_path / "data")
    dream_data.generate_synthetic_ndds(
        data_dir, n_frames=6, image_resolution=(160, 120), seed=9,
        out_of_frame_fraction=0.0,
    )
    found, _ = find_ndds_data_in_dir(data_dir)
    names = dream_data.DEFAULT_KEYPOINT_NAMES

    rng = np.random.RandomState(0)
    for convention in ("standard", "transposed"):
        csv_path = str(tmp_path / f"ref_pnp_{convention}.csv")
        with open(csv_path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["name", "pnp_success", "pose_x", "pose_y", "pose_z",
                        "pose_qx", "pose_qy", "pose_qz", "pose_qw", "add",
                        "n_inframe_gt_projs"])
            for datum in found:
                kp = load_keypoints(datum["data_path"], "panda", names)
                X = jnp.asarray(kp["positions_wrt_cam"], jnp.float32)
                rvec = jnp.asarray(rng.randn(3) * 0.02, jnp.float32)
                q = gv.convert_rvec_to_quaternion(rvec)
                t = rng.randn(3) * 0.02
                add = float(gv.add_from_pose(
                    jnp.asarray(t, jnp.float32), q, X,
                    rotation_convention=convention,
                ))
                w.writerow([datum["name"], "True", *t, *np.asarray(q), add, 7])
        winner, detail = resolve_add_convention(csv_path, data_dir, "panda", names)
        assert winner == convention, (convention, detail)
        assert detail["n_frames"] == 6


@pytest.mark.parametrize("int8_frames", [0, 2])
def test_visualize_network_inference_ndds_gt_overlays(tmp_path, int8_frames):
    """Video-viz CLI on an NDDS dataset: batched inference produces every
    requested frame type, and GT keypoints are overlaid in green
    (reference scripts/visualize_network_inference.py:293-318,451-455).
    int8_frames=2 additionally runs the pipeline through the quantized
    conv stack (dream_tpu extension)."""
    from dream_tpu import data as dream_data
    from dream_tpu.network import DreamNetwork
    from dream_tpu.utils.config import load_yaml
    import visualize_network_inference as vni
    from PIL import Image

    manip_cfg = load_yaml(os.path.join(REPO, "manip_configs", "panda.yaml"))
    kp_names = [k["name"] for k in manip_cfg["manipulator"]["keypoints"]]
    data_dir = str(tmp_path / "data")
    dream_data.generate_synthetic_ndds(
        data_dir, n_frames=5, image_resolution=(160, 120), seed=4,
        out_of_frame_fraction=0.0,
    )

    cfg = {
        "architecture": {
            "type": "vgg", "target": "belief_maps",
            "input_heads": ["image_rgb"], "output_heads": ["belief_maps"],
            "image_normalization": {"mean": [0.5] * 3, "stdev": [0.5] * 3},
            "loss": {"type": "mse"},
            "image_preprocessing": "resize",
        },
        "manipulator": manip_cfg["manipulator"],
        "training": {"config": {"net_input_resolution": [64, 64]},
                     "platform": {}},
    }
    net = DreamNetwork(cfg)
    net.init_variables()
    net.save_network(str(tmp_path), "model")

    out_dir = str(tmp_path / "viz")

    class Args:
        input_params_path = str(tmp_path / "model.msgpack")
        network_config = None
        dataset_dir = data_dir
        output_dir = out_dir
        force_overwrite = True
        visualization_types = list(vni.ALL_VIZ_TYPES)
        batch_size = 2  # frames (5) don't divide the batch -> exercises tail
        num_workers = 2
        fps = 30.0
        start_frame = 1
        end_frame = None
        int8_calibration_frames = int8_frames

    vni.visualize_network_inference(Args())

    for vt in vni.ALL_VIZ_TYPES:
        frames = sorted(os.listdir(os.path.join(out_dir, vt + "_frames")))
        assert frames == [f"{i:06d}.png" for i in range(4)], (vt, frames)

    # GT keypoints render as exact pure-green filled circles on the raw
    # overlay (in-frame by construction: out_of_frame_fraction=0).
    img = np.asarray(
        Image.open(os.path.join(out_dir, "kp_overlay_raw_frames", "000000.png"))
    )
    green = (img[..., 0] == 0) & (img[..., 1] == 128) & (img[..., 2] == 0)
    assert green.any(), "expected green GT keypoint overlays on the NDDS path"
