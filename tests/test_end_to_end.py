"""Full-pipeline integration test: synthetic NDDS dataset -> train CLI ->
checkpoints -> resume -> dataset analysis -> sane metrics.

The reference has no automated integration test (README metric walkthrough is
manual); this closes that gap.  Runs on small resolutions so CPU time stays
bounded.
"""

import os
import pickle
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from dream_tpu.data.synthetic import generate_synthetic_ndds
from dream_tpu.utils.config import save_yaml


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    data_dir = str(root / "data")
    generate_synthetic_ndds(
        data_dir, n_frames=16, image_resolution=(160, 120), seed=11,
        out_of_frame_fraction=0.0,
    )
    arch_path = str(root / "arch.yaml")
    save_yaml(
        {
            "architecture": {
                "type": "vgg",
                "target": "belief_maps",
                "input_heads": ["image_rgb"],
                "output_heads": ["belief_maps"],
                "image_normalization": {"mean": [0.5] * 3, "stdev": [0.5] * 3},
                "loss": {"type": "mse"},
            },
            "training": {
                "config": {
                    "image_preprocessing": "shrink-and-crop",
                    "net_input_resolution": [96, 96],
                }
            },
        },
        arch_path,
    )
    manip_path = os.path.join(REPO, "manip_configs", "panda.yaml")
    return {"data": data_dir, "arch": arch_path, "manip": manip_path, "root": root}


def test_train_resume_analyze(env):
    from train_network import make_parser, train_network
    from dream_tpu import analysis as dream_analysis

    out_dir = str(env["root"] / "train_out")
    argv = [
        "-i", env["data"], "-m", env["manip"], "-ar", env["arch"],
        "-e", "2", "-b", "4", "-o", out_dir, "-s", "42", "-w", "2",
        "-lr", "0.001", "-not-a",
    ]
    args = make_parser().parse_args(argv)
    train_network(args)

    # Checkpoint layout parity (reference scripts/train_network.py:612-659).
    files = set(os.listdir(out_dir))
    assert "best_network.yaml" in files and "best_network.msgpack" in files
    assert "epoch_2.yaml" in files and "epoch_2.msgpack" in files
    assert "epoch_1.msgpack" not in files  # previous epoch cleaned up
    assert "training_log.pkl" in files

    with open(os.path.join(out_dir, "training_log.pkl"), "rb") as f:
        log = pickle.load(f)
    assert log["epochs"] == [1, 2]
    assert log["random_seed"] == 42
    assert len(log["losses"]) == 2
    # Training must make progress on this easy synthetic set.
    assert log["losses"][-1] < log["losses"][0]

    # Resume for one more epoch: seed-pinned split, consistent config.
    args2 = make_parser().parse_args(argv + ["-r", "-e", "3"])
    train_network(args2)
    files = set(os.listdir(out_dir))
    assert "epoch_3.msgpack" in files and "epoch_2.msgpack" not in files
    with open(os.path.join(out_dir, "training_log.pkl"), "rb") as f:
        log2 = pickle.load(f)
    assert log2["epochs"] == [1, 2, 3]
    assert log2["epochs_resumed"] == [3]

    # Dataset analysis end to end.
    analysis_dir = str(env["root"] / "analysis_out")
    kp_metrics, pnp_results = dream_analysis.analyze_ndds_dataset(
        os.path.join(out_dir, "best_network.msgpack"),
        os.path.join(out_dir, "best_network.yaml"),
        env["data"],
        analysis_dir,
        visualize_belief_maps=True,
        pnp_analysis=True,
        batch_size=8,
        num_workers=2,
    )
    for fname in ["keypoints.csv", "pnp_results.csv", "analysis_results.txt"]:
        assert os.path.exists(os.path.join(analysis_dir, fname)), fname

    assert kp_metrics["num_gt_inframe"] > 0
    # Untrained-ish net: just require the plumbing produced finite metrics.
    assert pnp_results["num_pnp_possible"] > 0

    report = open(os.path.join(analysis_dir, "analysis_results.txt")).read()
    assert "Number of frames in this dataset: 16" in report
    # Dual-convention ADD reporting (pyrr matrix33 ambiguity, see
    # geometric_vision.add_from_pose): both conventions must appear until
    # real reference data settles which one the published numbers used.
    assert "alternate (transposed-R) rotation convention" in report


def test_train_on_mesh(env):
    """Data-parallel training over a 4-device virtual mesh via the CLI."""
    import jax

    from train_network import make_parser, train_network

    assert len(jax.devices()) >= 4
    out_dir = str(env["root"] / "train_mesh")
    args = make_parser().parse_args([
        "-i", env["data"], "-m", env["manip"], "-ar", env["arch"],
        "-e", "1", "-b", "8", "-o", out_dir, "-s", "1", "-w", "2",
        "-not-a", "--mesh-data", "4",
    ])
    train_network(args)
    import pickle

    with open(os.path.join(out_dir, "training_log.pkl"), "rb") as f:
        log = pickle.load(f)
    assert len(log["losses"]) == 1
    assert np.isfinite(log["losses"][0])


def test_train_cache_device_valid_every(env):
    """Device-resident dataset cache + thinned validation (host-overhead
    path: async checkpoint writes, per-epoch loss fetch)."""
    from train_network import make_parser, train_network

    out_dir = str(env["root"] / "train_cached")
    args = make_parser().parse_args([
        "-i", env["data"], "-m", env["manip"], "-ar", env["arch"],
        "-e", "3", "-b", "4", "-o", out_dir, "-s", "7", "-w", "2",
        "-not-a", "--cache-device", "--valid-every", "2",
        "--checkpoint-every", "3",
    ])
    train_network(args)

    files = set(os.listdir(out_dir))
    assert "best_network.msgpack" in files
    assert "epoch_3.msgpack" in files and "epoch_3.opt.msgpack" in files
    assert "epoch_1.msgpack" not in files and "epoch_2.msgpack" not in files

    with open(os.path.join(out_dir, "training_log.pkl"), "rb") as f:
        log = pickle.load(f)
    assert log["epochs"] == [1, 2, 3]
    assert all(np.isfinite(v) for v in log["losses"])
    # Epoch 1 skipped validation (NaN); epochs 2 (every-2) and 3 (final) ran.
    assert np.isnan(log["validation_losses"][0])
    assert np.isfinite(log["validation_losses"][1])
    assert np.isfinite(log["validation_losses"][2])


def test_train_ema_checkpoints(env):
    """--ema-decay: the per-step parameter EMA (updated inside the scanned
    dispatch) is validated on its own loss and checkpointed as
    best_network_ema.* / epoch_N.ema.msgpack, loadable like any checkpoint."""
    from flax import serialization
    import jax

    from train_network import make_parser, train_network

    out_dir = str(env["root"] / "train_ema")
    args = make_parser().parse_args([
        "-i", env["data"], "-m", env["manip"], "-ar", env["arch"],
        "-e", "3", "-b", "4", "-o", out_dir, "-s", "7", "-w", "2",
        "-not-a", "--cache-device", "--ema-decay", "0.9",
        "--checkpoint-every", "3",
    ])
    net = train_network(args)

    files = set(os.listdir(out_dir))
    assert "best_network_ema.msgpack" in files
    assert "epoch_3.ema.msgpack" in files

    # EMA params: same tree, values between init and final (not equal to
    # the raw params, but converging toward them).
    raw = jax.device_get(net.variables)
    with open(os.path.join(out_dir, "epoch_3.ema.msgpack"), "rb") as f:
        ema = serialization.from_bytes(raw, f.read())
    raw_l = jax.tree_util.tree_leaves(raw["params"])
    ema_l = jax.tree_util.tree_leaves(ema["params"])
    assert len(raw_l) == len(ema_l)
    assert any(
        float(np.abs(np.asarray(r) - np.asarray(e)).max()) > 0
        for r, e in zip(raw_l, ema_l)
    ), "EMA equals raw params (update not applied?)"

    # The EMA checkpoint drives inference like any other.
    from dream_tpu.network import create_network_from_config_file
    net2 = create_network_from_config_file(
        os.path.join(out_dir, "best_network.yaml"),
        os.path.join(out_dir, "best_network_ema.msgpack"),
    )
    result = net2.keypoints_from_image(np.zeros((120, 160, 3), np.uint8))
    assert result["detected_keypoints"].shape == (7, 2)


def test_analyze_ransac_and_robust_pnp_paths(env):
    """End-to-end analysis with --ransac and the robust-PnP extensions.

    Regression-pins the round-1 finding that RANSAC traded outliers for
    failed frames: with the consensus fallback, RANSAC's PnP success count
    can never drop below single-solve's.  (Runs after
    test_train_resume_analyze, reusing its trained checkpoint.)
    """
    from dream_tpu import analysis as dream_analysis

    out_dir = str(env["root"] / "train_out")
    ckpt = os.path.join(out_dir, "best_network.msgpack")
    if not os.path.exists(ckpt):
        pytest.skip("training test did not run first")
    cfg = os.path.join(out_dir, "best_network.yaml")

    def run(tag, **kwargs):
        adir = str(env["root"] / f"analysis_{tag}")
        return dream_analysis.analyze_ndds_dataset(
            ckpt, cfg, env["data"], adir,
            visualize_belief_maps=False, pnp_analysis=True,
            batch_size=8, num_workers=2, **kwargs,
        )

    _, pnp_plain = run("plain")
    _, pnp_ransac = run("ransac", pnp_ransac=True)
    _, pnp_robust = run(
        "robust", pnp_weight_by_score=True, pnp_reject_outliers_px=10.0
    )
    _, pnp_soft = run(
        "soft", pnp_soft_detections=True, pnp_reject_outliers_px=5.0
    )

    assert pnp_ransac["num_pnp_found"] >= pnp_plain["num_pnp_found"]
    # Soft detections can only ADD above-floor correspondences, so the
    # success count never drops below the canonical-detection solve.
    assert pnp_soft["num_pnp_found"] >= pnp_plain["num_pnp_found"]
    for result in (pnp_plain, pnp_ransac, pnp_robust, pnp_soft):
        assert result["num_pnp_possible"] == pnp_plain["num_pnp_possible"]
        assert 0.0 <= result["add_auc"] <= 1.0


def test_resolve_pnp_offline_cli(env):
    """scripts/resolve_pnp.py recomputes the PnP stage from a keypoints.csv
    without re-running inference: detections synthesized from dataset GT
    (plus one gross outlier) must produce near-perfect ADD with LOO
    rejection and a written pnp_results.csv."""
    from dream_tpu.analysis import write_keypoint_csv
    from dream_tpu.utils.ndds import find_ndds_data_in_dir, load_keypoints
    from resolve_pnp import make_parser as resolve_parser, resolve_pnp

    found = find_ndds_data_in_dir(env["data"])
    names, det, gt = [], [], []
    keypoint_names = [
        "panda_link0", "panda_link2", "panda_link3", "panda_link4",
        "panda_link6", "panda_link7", "panda_hand",
    ]
    rng = np.random.RandomState(0)
    for s in found[0]:
        kp = load_keypoints(s["data_path"], "panda", keypoint_names)
        proj = np.asarray(kp["projections"], np.float32)
        noisy = proj + rng.randn(*proj.shape).astype(np.float32) * 0.3
        noisy[0] += 40.0  # one gross outlier per frame
        names.append(s["name"])
        det.append(noisy)
        gt.append(proj)

    out_root = env["root"] / "resolve_pnp"
    os.makedirs(out_root, exist_ok=True)
    kcsv = str(out_root / "keypoints.csv")
    write_keypoint_csv(kcsv, names, np.array(det), np.array(gt))

    base = [
        "-k", kcsv, "-d", env["data"],
        "-m", env["manip"],
    ]
    plain = resolve_pnp(resolve_parser().parse_args(
        base + ["-o", str(out_root / "plain")]
    ))
    robust = resolve_pnp(resolve_parser().parse_args(
        base + ["-o", str(out_root / "robust"), "--pnp-reject-outliers-px", "5"]
    ))
    assert os.path.exists(out_root / "plain" / "pnp_results.csv")
    assert os.path.exists(out_root / "robust" / "pnp_resolve_results.txt")
    assert robust["num_pnp_found"] == robust["num_pnp_possible"]
    # LOO rejection must remove the planted outlier's influence.
    assert robust["add_auc"] > plain["add_auc"]
    # 0.3 px detection noise at 160x120 (short focal length) bounds the
    # achievable ADD; the planted 40 px outlier must not dominate it.
    assert robust["add_mean"] < 0.03, robust["add_mean"]
    assert robust["add_mean"] < 0.5 * plain["add_mean"]
