"""DreamNetwork facade tests: config-driven build, inference pipeline,
training step, save/load round trip.

Uses a small net-input resolution so real forwards are fast on CPU; the
config schema is identical to the 400x400 shipped configs.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import dream_tpu
from dream_tpu.network import DreamNetwork, create_network_from_config_file
from dream_tpu.ops.belief_maps import create_belief_maps


def _vgg_config(net_input=(64, 64), n_stages=None, loss="mse"):
    arch = {
        "type": "vgg",
        "target": "belief_maps",
        "input_heads": ["image_rgb"],
        "output_heads": ["belief_maps"],
        "image_normalization": {"mean": [0.5] * 3, "stdev": [0.5] * 3},
        "loss": {"type": loss},
        "image_preprocessing": "shrink-and-crop",
    }
    if n_stages:
        arch["n_stages"] = n_stages
    return {
        "architecture": arch,
        "manipulator": {
            "name": "panda",
            "keypoints": [
                {"name": f"kp{i}", "friendly_name": f"KP{i}"} for i in range(4)
            ],
        },
        "training": {
            "config": {
                "net_input_resolution": list(net_input),
                "optimizer": {"type": "adam", "learning_rate": 1e-3},
            },
            "platform": {},
        },
    }


def test_network_build_and_resolutions():
    net = DreamNetwork(_vgg_config())
    assert net.n_keypoints == 4
    assert net.trained_net_input_resolution() == (64, 64)
    assert net.trained_net_output_resolution() == (16, 16)
    assert net.peak_offset_due_to_upsampling() == 0.4395

    # Raw-resolution plumbing.
    netin, netout = net.net_resolutions_from_image_raw_resolution((128, 96))
    assert netin == (64, 64) and netout == (16, 16)


def test_network_config_mismatch_rejected():
    cfg = _vgg_config()
    cfg["training"]["config"]["net_output_resolution"] = [99, 99]
    with pytest.raises(AssertionError):
        DreamNetwork(cfg)


def test_shipped_configs_parse():
    """The four shipped arch configs build real 400x400 networks (no init)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    manip = dream_tpu.utilities.load_yaml(
        os.path.join(repo, "manip_configs", "panda.yaml")
    )
    expected_out = {
        "dream_vgg_q.yaml": (100, 100),
        "dream_vgg_f.yaml": (400, 400),
        "dream_resnet_h.yaml": (208, 208),
        "dream_resnet_f.yaml": (416, 416),
    }
    for fname, out_res in expected_out.items():
        arch = dream_tpu.utilities.load_yaml(
            os.path.join(repo, "arch_configs", fname)
        )
        cfg = {
            "architecture": arch["architecture"],
            "manipulator": manip["manipulator"],
            "training": {
                "config": dict(arch["training"]["config"]),
                "platform": {},
            },
        }
        net = DreamNetwork(cfg)
        assert net.trained_net_output_resolution() == out_res, fname
        assert net.n_keypoints == 7


def test_inference_recovers_planted_keypoints():
    """End-to-end: train-free check that the jitted inference decode applies
    the peak pipeline to the model output (planted via a known belief map)."""
    net = DreamNetwork(_vgg_config())
    net.init_variables()

    # Instead of a trained model, drive the decode directly: the inference fn
    # is model forward + keypoints_from_belief_maps; test the decode branch
    # by checking output shapes and sentinel behavior on an untrained net.
    x = jnp.zeros((2, 64, 64, 3))
    belief, kps = net.inference(x)
    assert belief.shape == (2, 4, 16, 16)
    assert kps.shape == (2, 4, 2)


def test_training_reduces_loss_and_learns_peak():
    """Overfit a single tiny batch: loss must drop and the detected keypoint
    must converge to the GT location — the full train->infer loop."""
    net = DreamNetwork(_vgg_config())
    net.enable_training()

    rng = np.random.RandomState(0)
    images = jnp.array(rng.rand(2, 64, 64, 3).astype(np.float32))
    # Keypoints must sit in [4, 10] so the sigma=2 stamp window fits inside a
    # 16x16 map (the reference's strict in-frame window check zeroes the map
    # otherwise, dream/image_proc.py:894-899).
    kp_netout = jnp.array([[[4.0, 4.0], [10.0, 4.0], [4.0, 10.0], [9.0, 9.0]]] * 2)
    target = create_belief_maps(kp_netout, (16, 16))
    assert float(jnp.min(jnp.max(target, axis=(2, 3)))) == 1.0  # all maps stamped

    first_loss = float(net.train([images], target))
    for _ in range(400):
        loss = net.train([images], target)
    final_loss = float(loss)
    assert final_loss < first_loss * 0.1, (first_loss, final_loss)

    _, kps = net.inference(images)
    kps = np.asarray(kps)
    err = np.linalg.norm(kps[0] - np.asarray(kp_netout)[0] - 0.4395, axis=1)
    # Overfit net must localize at least 3 of the 4 planted keypoints; the
    # disambiguation gate may legitimately sentinel a still-noisy map.
    assert np.sum(err < 1.5) >= 3, kps[0]


def test_eval_loss_matches_known_value():
    net = DreamNetwork(_vgg_config())
    net.init_variables()
    images = jnp.zeros((1, 64, 64, 3))
    target = jnp.zeros((1, 4, 16, 16))
    loss = float(net.loss([images], target))
    out, _ = net.apply_model(net.variables, images)
    expected = float(jnp.mean(out[0] ** 2))
    np.testing.assert_allclose(loss, expected, rtol=1e-5)


def test_save_load_round_trip(tmp_path):
    net = DreamNetwork(_vgg_config())
    net.init_variables()
    x = jnp.array(np.random.RandomState(1).rand(1, 64, 64, 3).astype(np.float32))
    belief1, _ = net.inference(x)

    net.save_network(str(tmp_path), "best_network")
    assert os.path.exists(tmp_path / "best_network.yaml")
    assert os.path.exists(tmp_path / "best_network.msgpack")

    net2 = create_network_from_config_file(
        str(tmp_path / "best_network.yaml"),
        str(tmp_path / "best_network.msgpack"),
    )
    belief2, _ = net2.inference(x)
    np.testing.assert_allclose(
        np.asarray(belief1), np.asarray(belief2), atol=1e-6
    )


def test_float16_compressed_checkpoint_round_trip(tmp_path):
    """scripts/compress_checkpoint.py artifacts load as ordinary f32 params
    (load_network_params casts to the template dtypes) and the belief maps
    stay within f16-rounding of the original."""
    import subprocess
    import sys

    net = DreamNetwork(_vgg_config())
    net.init_variables()
    x = jnp.array(np.random.RandomState(2).rand(1, 64, 64, 3).astype(np.float32))
    belief1, _ = net.inference(x)
    net.save_network(str(tmp_path), "full")

    script = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts", "compress_checkpoint.py",
    )
    subprocess.run(
        [sys.executable, script, str(tmp_path / "full.msgpack"),
         str(tmp_path / "f16.msgpack")],
        check=True,
    )
    assert os.path.getsize(tmp_path / "f16.msgpack") < 0.6 * os.path.getsize(
        tmp_path / "full.msgpack"
    )
    assert os.path.exists(tmp_path / "f16.yaml")

    net2 = create_network_from_config_file(
        str(tmp_path / "f16.yaml"), str(tmp_path / "f16.msgpack")
    )
    leaf = jax.tree_util.tree_leaves(net2.variables["params"])[0]
    assert leaf.dtype == jnp.float32, leaf.dtype
    belief2, _ = net2.inference(x)
    scale = float(np.abs(np.asarray(belief1)).max()) + 1e-9
    assert float(np.abs(np.asarray(belief1) - np.asarray(belief2)).max()) < (
        2e-3 * scale + 2e-3
    )


def test_multistage_network_loss():
    net = DreamNetwork(_vgg_config(n_stages=2))
    net.enable_training()
    images = jnp.zeros((1, 64, 64, 3))
    target = jnp.zeros((1, 4, 16, 16))
    loss = net.train([images], target)
    assert np.isfinite(float(loss))


def test_resnet_network_with_batch_stats(tmp_path):
    cfg = _vgg_config()
    cfg["architecture"]["type"] = "resnet"
    net = DreamNetwork(cfg)
    # Shrink the trunk for test speed.
    net.model = dream_tpu.models.ResnetSimple(n_keypoints=4, layers=(1, 1, 1, 1))
    net.enable_training()
    images = jnp.zeros((2, 64, 64, 3))
    target = jnp.zeros((2, 4, 32, 32))
    l1 = float(net.train([images], target))
    assert "batch_stats" in net.variables
    l2 = float(net.train([images], target))
    assert np.isfinite(l1) and np.isfinite(l2)

    net.save_network(str(tmp_path), "rn")
    assert os.path.exists(tmp_path / "rn.msgpack")


def test_keypoints_from_image_pipeline():
    from PIL import Image

    net = DreamNetwork(_vgg_config())
    net.init_variables()
    img = Image.fromarray(
        (np.random.RandomState(0).rand(96, 128, 3) * 255).astype(np.uint8)
    )
    result = net.keypoints_from_image(img, debug=True)
    assert result["detected_keypoints"].shape == (4, 2)
    assert result["belief_maps"].shape == (4, 16, 16)
    assert result["image_rgb_net_input"].shape == (64, 64, 3)


def test_fused_training_matches_unfused():
    """train_raw (fused processor+step) must optimize like the 2-dispatch
    path: same loss value on the first step from identical state."""
    import dream_tpu.data as dream_data

    cfg = _vgg_config()
    net_a = DreamNetwork(cfg)
    net_b = DreamNetwork(cfg)
    net_a.init_variables(seed=3)
    net_b.init_variables(seed=3)

    processor = dream_data.make_batch_processor(
        (128, 96), (64, 64), (16, 16), "shrink-and-crop",
        cfg["architecture"]["image_normalization"],
        augment=False, include_belief_maps=True,
    )
    net_a.enable_training()
    net_b.enable_fused_training(processor)

    rng = np.random.RandomState(0)
    raw = jnp.asarray(rng.randint(0, 255, (2, 96, 128, 3), dtype=np.uint8))
    kp_raw = jnp.asarray(rng.uniform(20, 100, (2, 4, 2)).astype(np.float32))

    batch = processor(jax.random.PRNGKey(0), raw, kp_raw)
    loss_a = float(net_a.train([batch["image_rgb_input"]], batch["belief_maps"]))
    loss_b = float(net_b.train_raw(jax.random.PRNGKey(0), raw, kp_raw))
    np.testing.assert_allclose(loss_a, loss_b, rtol=1e-5)

    # Both make progress over a few steps.
    for _ in range(5):
        loss_b = float(net_b.train_raw(jax.random.PRNGKey(0), raw, kp_raw))
    assert loss_b < loss_a


def test_spatial_softmax_config_inference():
    """vgg + spatial_softmax config: model emits keypoints directly
    (reference dream/network.py:196-209,511-515)."""
    cfg = _vgg_config()
    cfg["architecture"]["spatial_softmax"] = {
        "learned_beta": True, "initial_beta": 1.0,
    }
    cfg["architecture"]["output_heads"] = ["belief_maps", "keypoints"]
    net = DreamNetwork(cfg)
    net.init_variables()
    belief, kps = net.inference(jnp.zeros((2, 64, 64, 3)))
    assert belief.shape == (2, 4, 16, 16)
    assert kps.shape == (2, 4, 2)
    # Soft-argmax output: finite coords inside the netout frame, no sentinels.
    k = np.asarray(kps)
    assert np.all(np.isfinite(k)) and k.min() >= 0.0 and k.max() <= 16.0

    # Training such a config is explicitly unimplemented (reference parity).
    net.enable_training()
    with pytest.raises(AssertionError):
        net.train([jnp.zeros((1, 64, 64, 3))], jnp.zeros((1, 4, 16, 16)))


def test_huber_loss_config():
    net = DreamNetwork(_vgg_config(loss="huber"))
    net.init_variables()
    img = jnp.ones((1, 64, 64, 3))
    target = jnp.zeros((1, 4, 16, 16))
    loss = float(net.loss([img], target))
    out, _ = net.apply_model(net.variables, img)
    d = np.abs(np.asarray(out[0]))
    expected = np.mean(np.where(d < 1.0, 0.5 * d * d, d - 0.5))
    np.testing.assert_allclose(loss, expected, rtol=1e-5)


def test_weighted_mse_loss_config():
    """weighted_mse: matches the closed form and removes the all-zero
    optimum (zero output costs ~pos_weight x more at peak pixels)."""
    cfg = _vgg_config()
    cfg["architecture"]["loss"] = {"type": "weighted_mse", "pos_weight": 50.0}
    net = DreamNetwork(cfg)
    net.init_variables()
    img = jnp.ones((1, 64, 64, 3))
    target = np.zeros((1, 4, 16, 16), np.float32)
    target[0, :, 8, 8] = 1.0  # planted peaks
    loss = float(net.loss([img], jnp.asarray(target)))
    out, _ = net.apply_model(net.variables, img)
    pred = np.asarray(out[0])  # [1,16,16,4]
    t = np.moveaxis(target, 1, -1)
    w = 1.0 + 49.0 * np.clip(t, 0, 1)
    expected = np.sum(w * (pred - t) ** 2) / np.sum(w)
    np.testing.assert_allclose(loss, expected, rtol=1e-5)

    # The same prediction scores much worse against a peaked target than
    # under plain MSE relative scaling: an all-zero prediction pays the
    # pos_weight at the peak.
    zero_pred = np.zeros_like(t)
    mse_zero = np.mean((zero_pred - t) ** 2)
    wmse_zero = np.sum(w * (zero_pred - t) ** 2) / np.sum(w)
    assert wmse_zero > 10.0 * mse_zero


def test_weighted_mse_symmetric_penalizes_false_positives():
    """symmetric weighted_mse: identical to the target-only weighting at the
    optimum (pred == target), but false-positive belief mass — the channel-
    confused degenerate solution the 400x400 F-decoders fell into — pays
    pos_weight x instead of weight 1."""
    from dream_tpu.network import _weighted_mse_loss

    pw = 50.0
    plain = _weighted_mse_loss(pw)
    sym = _weighted_mse_loss(pw, symmetric=True)

    target = np.zeros((1, 16, 16, 2), np.float32)
    target[0, 8, 8, 0] = 1.0
    target[0, 4, 4, 1] = 1.0
    t = jnp.asarray(target)

    # At the optimum both are zero.
    assert float(plain(t, t)) == 0.0 and float(sym(t, t)) == 0.0
    # Near the optimum they agree (weights coincide where pred ~= target).
    near = t * 0.95
    np.testing.assert_allclose(
        float(plain(near, t)), float(sym(near, t)), rtol=1e-4
    )

    # The degenerate union solution: each channel also carries the OTHER
    # channel's peak.  Symmetric weighting must punish it ~pos_weight x.
    union = jnp.asarray(
        np.maximum(target, target[..., ::-1])
    )
    ratio = float(sym(union, t)) / float(plain(union, t))
    assert ratio > 10.0, ratio

    # Gradient flows toward removing the false positive (no NaNs, correct
    # sign at the spurious peak).
    g = jax.grad(lambda p: sym(p, t))(union)
    assert np.isfinite(np.asarray(g)).all()
    assert float(g[0, 4, 4, 0]) > 0.0  # spurious mass pushed down


def test_scanned_epoch_training():
    """enable_scanned_training runs a whole epoch (lax.scan over gathers of a
    device-resident set) in one dispatch and optimizes equivalently to the
    per-step fused path."""
    import dream_tpu.data as dream_data

    cfg = _vgg_config()
    net = DreamNetwork(cfg)
    net.init_variables(seed=5)

    processor = dream_data.make_batch_processor(
        (128, 96), (64, 64), (16, 16), "shrink-and-crop",
        cfg["architecture"]["image_normalization"],
        augment=True, include_belief_maps=True,
    )
    net.enable_scanned_training(processor)

    rng = np.random.RandomState(1)
    images = jnp.asarray(rng.randint(0, 255, (10, 96, 128, 3), dtype=np.uint8))
    kps = jnp.asarray(rng.uniform(20, 100, (10, 4, 2)).astype(np.float32))
    idx = np.stack([rng.permutation(10)[:4] for _ in range(5)])  # 5 steps, b=4

    params_before = jax.tree_util.tree_leaves(net.variables["params"])[0].copy()
    losses = net.train_epoch_raw(jax.random.PRNGKey(0), images, kps, idx)
    losses = np.asarray(jax.device_get(losses))
    assert losses.shape == (5,)
    assert np.all(np.isfinite(losses))
    params_after = jax.tree_util.tree_leaves(net.variables["params"])[0]
    assert not np.allclose(params_before, np.asarray(params_after))

    # Several epochs reduce the loss (learning, not just mutating).
    first = losses.mean()
    for e in range(1, 4):
        losses = net.train_epoch_raw(jax.random.PRNGKey(e), images, kps, idx)
    assert float(np.mean(jax.device_get(losses))) < first


def test_mixed_precision_training():
    """compute_dtype bfloat16 trains: conv compute in bf16, params stay
    float32, loss accumulates in float32 and decreases comparably to f32."""
    import dream_tpu.data as dream_data

    def run(dtype_name, epochs=4):
        cfg = _vgg_config(loss="weighted_mse")
        cfg["architecture"]["loss"]["pos_weight"] = 20.0
        if dtype_name:
            cfg["architecture"]["compute_dtype"] = dtype_name
        net = DreamNetwork(cfg)
        net.init_variables(seed=5)
        processor = dream_data.make_batch_processor(
            (128, 96), (64, 64), (16, 16), "shrink-and-crop",
            cfg["architecture"]["image_normalization"],
            augment=False, include_belief_maps=True,
        )
        net.enable_scanned_training(processor)
        rng = np.random.RandomState(1)
        images = jnp.asarray(rng.randint(0, 255, (8, 96, 128, 3), dtype=np.uint8))
        kps = jnp.asarray(rng.uniform(20, 100, (8, 4, 2)).astype(np.float32))
        idx = np.stack([rng.permutation(8)[:4] for _ in range(2)])
        losses = None
        for e in range(epochs):
            losses = net.train_epoch_raw(jax.random.PRNGKey(e), images, kps, idx)
        # Params remain float32 master copies.
        for leaf in jax.tree_util.tree_leaves(net.variables["params"]):
            assert leaf.dtype == jnp.float32
        return np.asarray(jax.device_get(losses))

    losses_f32 = run(None)
    losses_bf16 = run("bfloat16")
    assert np.all(np.isfinite(losses_bf16))
    # bf16 training makes comparable progress (same order of magnitude).
    assert losses_bf16.mean() < 3.0 * losses_f32.mean() + 1e-6


def test_fused_training_ema_update():
    """enable_ema + the fused per-step path: the EMA shadow moves toward the
    raw parameters with the configured decay (the e2e test covers the
    scanned-epoch path; this pins train_raw)."""
    import dream_tpu.data as dream_data

    cfg = _vgg_config()
    net = DreamNetwork(cfg)
    net.init_variables(seed=9)

    processor = dream_data.make_batch_processor(
        (128, 96), (64, 64), (16, 16), "shrink-and-crop",
        cfg["architecture"]["image_normalization"],
        augment=False, include_belief_maps=True,
    )
    net.enable_ema(0.5)
    net.enable_fused_training(processor)

    ema_before = jax.tree_util.tree_map(np.asarray, net.ema_params)

    rng = np.random.RandomState(0)
    raw = jnp.asarray(rng.randint(0, 255, (2, 96, 128, 3), dtype=np.uint8))
    kp_raw = jnp.asarray(rng.uniform(20, 100, (2, 4, 2)).astype(np.float32))
    net.train_raw(jax.random.PRNGKey(0), raw, kp_raw)

    # One step at decay 0.5: ema' = 0.5*ema0 + 0.5*params1.
    leaves_e0 = jax.tree_util.tree_leaves(ema_before)
    leaves_e1 = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, net.ema_params)
    )
    leaves_p1 = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, net.variables["params"])
    )
    for e0, e1, p1 in zip(leaves_e0, leaves_e1, leaves_p1):
        np.testing.assert_allclose(e1, 0.5 * e0 + 0.5 * p1, atol=1e-6)

    # ema_variables() swaps the averaged params in and is loss-evaluable.
    batch = processor(jax.random.PRNGKey(0), raw, kp_raw)
    loss = float(net.loss([batch["image_rgb_input"]], batch["belief_maps"],
                          variables=net.ema_variables()))
    assert np.isfinite(loss)
