"""Data pipeline tests: dataset loading, device batch transform, augmentation
keypoint tracking, loader determinism."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dream_tpu import data as dream_data
from dream_tpu.ops import coords as coord_ops


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("synth"))
    dream_data.generate_synthetic_ndds(
        out, n_frames=10, image_resolution=(160, 120), seed=3
    )
    dataset = dream_data.ManipulatorNDDSDataset(
        out,
        "panda",
        dream_data.DEFAULT_KEYPOINT_NAMES,
        network_input_resolution=(96, 96),
        network_output_resolution=(24, 24),
        image_normalization={"mean": [0.5] * 3, "stdev": [0.5] * 3},
        image_preprocessing="shrink-and-crop",
    )
    return dataset


def test_dataset_basics(synth):
    assert len(synth) == 10
    assert synth.image_raw_resolution == (160, 120)
    batch = synth.host_batch([0, 3, 5])
    assert batch["image_rgb_raw"].shape == (3, 120, 160, 3)
    assert batch["image_rgb_raw"].dtype == np.uint8
    assert batch["keypoint_projections_raw"].shape == (3, 7, 2)
    assert batch["keypoint_positions"].shape == (3, 7, 3)
    assert synth.sample_names([0, 3]) == ["000000", "000003"]


def test_batch_processor_no_augment(synth):
    process = dream_data.make_batch_processor(
        synth.image_raw_resolution,
        synth.network_input_resolution,
        synth.network_output_resolution,
        synth.image_preprocessing,
        synth.image_normalization,
        augment=False,
        include_belief_maps=True,
    )
    batch = synth.host_batch([0, 1])
    out = process(
        jax.random.PRNGKey(0),
        jnp.array(batch["image_rgb_raw"]),
        jnp.array(batch["keypoint_projections_raw"]),
    )
    assert out["image_rgb_input"].shape == (2, 96, 96, 3)
    # Normalized with mean/std 0.5 -> values in [-1, 1].
    vals = np.asarray(out["image_rgb_input"])
    assert vals.min() >= -1.0 - 1e-5 and vals.max() <= 1.0 + 1e-5
    assert out["belief_maps"].shape == (2, 7, 24, 24)

    # Keypoint conversion matches the standalone affine path.
    expected_netin = coord_ops.convert_keypoints_to_netin_from_raw(
        batch["keypoint_projections_raw"],
        synth.image_raw_resolution,
        synth.network_input_resolution,
        "shrink-and-crop",
    )
    np.testing.assert_allclose(
        np.asarray(out["keypoint_projections_input"]),
        np.asarray(expected_netin),
        atol=1e-4,
    )

    # Belief maps peak where the netout keypoints are (for in-frame kps).
    kp_netout = np.asarray(out["keypoint_projections_output"])
    maps = np.asarray(out["belief_maps"])
    for b in range(2):
        for k in range(7):
            x, y = kp_netout[b, k]
            if 4 <= x < 24 - 5 and 4 <= y < 24 - 5:
                iy, ix = np.unravel_index(maps[b, k].argmax(), maps[b, k].shape)
                assert abs(ix - x) <= 1.0 and abs(iy - y) <= 1.0


def test_augmentation_tracks_keypoints():
    # A synthetic image with a bright dot: after augmentation the dot must
    # move to where the transformed keypoint says it is.
    h = w = 64
    image = np.zeros((h, w, 3), dtype=np.float32)
    image[30, 40] = 255.0
    kp = jnp.array([[40.0, 30.0]])

    cfg = dream_data.AugmentConfig(
        p_noise=0.0, p_brightness_contrast=0.0, p_shift_scale_rotate=1.0
    )
    out_img, out_kp = dream_data.augment_batch(
        jax.random.PRNGKey(42), jnp.array(image)[None], kp[None], cfg
    )
    out_img = np.asarray(out_img)[0]
    out_kp = np.asarray(out_kp)[0, 0]
    # The transform must have actually moved the point.
    assert np.linalg.norm(out_kp - [40.0, 30.0]) > 0.5
    bright_y, bright_x = np.unravel_index(
        out_img[..., 0].argmax(), out_img[..., 0].shape
    )
    assert abs(bright_x - out_kp[0]) <= 1.5
    assert abs(bright_y - out_kp[1]) <= 1.5


def test_augmentation_identity_when_disabled():
    image = np.random.RandomState(0).rand(32, 32, 3).astype(np.float32) * 255
    kp = jnp.array([[[10.0, 12.0]]])
    cfg = dream_data.AugmentConfig(
        p_noise=0.0, p_brightness_contrast=0.0, p_shift_scale_rotate=0.0
    )
    out_img, out_kp = dream_data.augment_batch(
        jax.random.PRNGKey(0), jnp.array(image)[None], kp, cfg
    )
    np.testing.assert_allclose(np.asarray(out_img)[0], image, atol=1e-2)
    np.testing.assert_allclose(np.asarray(out_kp), np.asarray(kp), atol=1e-5)


def test_dataloader_determinism_and_split(synth):
    train_idx, valid_idx = dream_data.split_indices(len(synth), 0.8, seed=7)
    assert len(train_idx) == 8 and len(valid_idx) == 2
    # Seed-pinned: same seed -> same split (resume contract).
    train_idx2, valid_idx2 = dream_data.split_indices(len(synth), 0.8, seed=7)
    np.testing.assert_array_equal(train_idx, train_idx2)

    loader = dream_data.DataLoader(
        synth, batch_size=4, shuffle=True, seed=5, indices=train_idx
    )
    assert len(loader) == 2
    b1 = [b["indices"].tolist() for b in loader]
    loader2 = dream_data.DataLoader(
        synth, batch_size=4, shuffle=True, seed=5, indices=train_idx
    )
    b2 = [b["indices"].tolist() for b in loader2]
    assert b1 == b2
    loader.set_epoch(1)
    b3 = [b["indices"].tolist() for b in loader]
    assert b1 != b3  # reshuffles across epochs


def test_native_loader_matches_pil(synth):
    from dream_tpu.data import native_loader

    if not native_loader.native_available():
        import pytest
        pytest.skip("native loader not built in this environment")

    ds_native = dream_data.ManipulatorNDDSDataset(
        (synth.ndds_dataset_data, synth.ndds_dataset_config),
        "panda", dream_data.DEFAULT_KEYPOINT_NAMES,
        (96, 96), (24, 24), None, "resize", use_native_loader=True,
    )
    ds_pil = dream_data.ManipulatorNDDSDataset(
        (synth.ndds_dataset_data, synth.ndds_dataset_config),
        "panda", dream_data.DEFAULT_KEYPOINT_NAMES,
        (96, 96), (24, 24), None, "resize", use_native_loader=False,
    )
    a = ds_native.load_images([0, 2, 4])
    b = ds_pil.load_images([0, 2, 4])
    np.testing.assert_array_equal(a, b)


def test_device_cached_loader_matches_dataloader(synth):
    """DeviceCachedLoader serves the same batches as DataLoader (device-side
    gathers over an HBM-resident dataset)."""
    idx = [1, 3, 5, 7, 9, 2]
    dl = dream_data.DataLoader(synth, 3, shuffle=True, seed=7, indices=idx)
    cl = dream_data.DeviceCachedLoader(synth, 3, shuffle=True, seed=7, indices=idx)
    dl.set_epoch(2)
    cl.set_epoch(2)
    got_d = list(dl)
    got_c = list(cl)
    assert len(got_d) == len(got_c) == 2
    for bd, bc in zip(got_d, got_c):
        np.testing.assert_array_equal(bd["indices"], np.asarray(bc["indices"]))
        np.testing.assert_array_equal(
            bd["image_rgb_raw"], np.asarray(bc["image_rgb_raw"])
        )
        np.testing.assert_allclose(
            bd["keypoint_projections_raw"],
            np.asarray(bc["keypoint_projections_raw"]),
        )


def test_heavy_debug_dumps_to_disk(tmp_path):
    """HEAVY level dumps GT overlays + belief-map mosaics; INTERACTIVE adds
    the offline contact sheet (reference dream/datasets.py:210-271, whose
    HEAVY branch is an unimplemented TODO)."""
    data_dir = str(tmp_path / "data")
    dream_data.generate_synthetic_ndds(
        data_dir, n_frames=3, image_resolution=(160, 120), seed=5
    )
    debug_dir = str(tmp_path / "dbg")
    dataset = dream_data.ManipulatorNDDSDataset(
        data_dir,
        "panda",
        dream_data.DEFAULT_KEYPOINT_NAMES,
        network_input_resolution=(96, 96),
        network_output_resolution=(24, 24),
        image_preprocessing="shrink-and-crop",
        debug_mode=dream_data.ManipulatorNDDSDatasetDebugLevels.INTERACTIVE,
        debug_dir=debug_dir,
    )
    dataset.host_batch([0, 2])
    import os

    files = sorted(os.listdir(debug_dir))
    for name in ("000000", "000002"):
        for kind in ("gt_overlay_raw", "gt_overlay_net_input", "gt_belief_maps"):
            assert f"{name}_{kind}.png" in files
    assert "000001_gt_overlay_raw.png" not in files
    assert "index.html" in files
    sheet = open(os.path.join(debug_dir, "index.html")).read()
    assert "000002_gt_belief_maps.png" in sheet
    # Re-serving the same samples does not redo the work.
    before = len(files)
    dataset.host_batch([0])
    assert len(os.listdir(debug_dir)) == before


def test_dataloader_abandoned_iteration_cleans_up(synth):
    """Abandoning iteration early (break / generator close) must shut the
    prefetch thread pool down instead of leaking its worker thread."""
    import gc
    import threading
    import time

    gc.collect()
    base = threading.active_count()
    it = iter(dream_data.DataLoader(synth, 2, shuffle=False))
    next(it)
    it.close()  # what a consumer's `break` triggers on GC / scope exit
    deadline = time.time() + 5.0
    while threading.active_count() > base and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= base


def test_synthetic_domain_randomization(tmp_path):
    """DR frames keep the exact same GT contract (projections/positions from
    the same seed-pinned pose draw) while the pixels are randomized
    (textures, distractors, occluders, lighting)."""
    import json

    plain_dir = str(tmp_path / "plain")
    dr_dir = str(tmp_path / "dr")
    dream_data.generate_synthetic_ndds(
        plain_dir, n_frames=3, image_resolution=(160, 120), seed=13,
        out_of_frame_fraction=0.0,
    )
    dream_data.generate_synthetic_ndds(
        dr_dir, n_frames=3, image_resolution=(160, 120), seed=13,
        out_of_frame_fraction=0.0, domain_randomization=True,
    )
    from PIL import Image

    for i in range(3):
        img_p = np.asarray(Image.open(os.path.join(plain_dir, f"{i:06d}.rgb.png")))
        img_d = np.asarray(Image.open(os.path.join(dr_dir, f"{i:06d}.rgb.png")))
        assert img_p.shape == img_d.shape == (120, 160, 3)
        assert np.mean(np.abs(img_p.astype(float) - img_d)) > 1.0

    # DR datasets load through the normal NDDS pipeline.
    ds = dream_data.ManipulatorNDDSDataset(
        dr_dir, "panda", dream_data.DEFAULT_KEYPOINT_NAMES,
        (64, 64), (16, 16), None, "resize",
    )
    hb = ds.host_batch([0, 1, 2])
    assert hb["image_rgb_raw"].shape == (3, 120, 160, 3)
    assert np.isfinite(hb["keypoint_projections_raw"]).all()


def test_chain_points_unified_and_many_keypoints(tmp_path):
    """chain_points is the single chain builder: truncation for <=7, helix
    extension beyond (kuka 8 / baxter 17 scales), shared by both the on-disk
    generator and the in-memory scene renderer; extended chains must not be
    collinear (PnP geometry) and must still land mostly in frame."""
    from dream_tpu.data import synthetic

    # <=7: exact canonical prefix.
    np.testing.assert_array_equal(
        synthetic.chain_points(7), synthetic._CANONICAL_CHAIN
    )
    np.testing.assert_array_equal(
        synthetic.chain_points(3), synthetic._CANONICAL_CHAIN[:3]
    )
    # Extension is deterministic, continuous, and non-collinear.
    c17 = synthetic.chain_points(17)
    assert c17.shape == (17, 3)
    np.testing.assert_array_equal(c17[:7], synthetic._CANONICAL_CHAIN)
    tail = c17[7:] - c17[7:].mean(axis=0)
    # Rank 3 spread: no two singular values vanish (not a line).
    s = np.linalg.svd(tail, compute_uv=False)
    assert s[1] > 1e-3, s

    # In-memory renderer and on-disk generator share the geometry.
    rng = np.random.RandomState(5)
    img, projs, pos = synthetic.render_random_scene(rng, (160, 120), n_keypoints=17)
    assert img.shape == (120, 160, 3) and projs.shape == (17, 2)
    d = np.linalg.norm(pos - pos.mean(axis=0), axis=1)
    np.testing.assert_allclose(
        sorted(d), sorted(np.linalg.norm(c17 - c17.mean(axis=0), axis=1)),
        rtol=1e-6,
    )

    # 17-keypoint dataset drives the full host pipeline (baxter-like names).
    names = [f"kp_{i}" for i in range(17)]
    out = str(tmp_path / "baxter_like")
    dream_data.generate_synthetic_ndds(
        out, n_frames=4, image_resolution=(160, 120), seed=7,
        keypoint_names=names, object_class="baxter",
        out_of_frame_fraction=0.0,
    )
    ds = dream_data.ManipulatorNDDSDataset(
        out, "baxter", names, (96, 96), (24, 24),
        {"mean": [0.5] * 3, "stdev": [0.5] * 3}, "shrink-and-crop",
    )
    hb = ds.host_batch([0, 1, 2, 3])
    assert hb["keypoint_projections_raw"].shape == (4, 17, 2)
    assert hb["keypoint_positions"].shape == (4, 17, 3)
    # Most keypoints are inside the raw frame (camera distance scales with
    # chain radius).
    kp = hb["keypoint_projections_raw"].reshape(-1, 2)
    in_frame = (
        (kp[:, 0] >= 0) & (kp[:, 0] < 160) & (kp[:, 1] >= 0) & (kp[:, 1] < 120)
    )
    assert in_frame.mean() > 0.7, in_frame.mean()

    process = dream_data.make_batch_processor(
        (160, 120), (96, 96), (24, 24), "shrink-and-crop",
        {"mean": [0.5] * 3, "stdev": [0.5] * 3},
        augment=True, include_belief_maps=True,
    )
    pb = process(
        jax.random.PRNGKey(0),
        jnp.array(hb["image_rgb_raw"]),
        jnp.array(hb["keypoint_projections_raw"]),
    )
    assert pb["belief_maps"].shape == (4, 17, 24, 24)
    assert bool(jnp.isfinite(pb["belief_maps"]).all())
