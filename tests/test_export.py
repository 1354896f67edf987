"""jax.export inference-artifact tests (dream_tpu/export.py).

The artifact must be self-contained (weights as constants), return
RAW-frame keypoint coords matching the live per-frame pipeline, use the
portable XLA decode, and support int8-quantized pipelines.
"""

import numpy as np

import jax.numpy as jnp

from dream_tpu.export import export_inference, load_inference
from dream_tpu.network import DreamNetwork
from tests.test_network import _vgg_config


def _live_raw_keypoints(net, frames):
    """Per-frame live pipeline (keypoints_from_image) — the contract the
    artifact must reproduce."""
    return np.stack([
        net.keypoints_from_image(f)["detected_keypoints"] for f in frames
    ])


def test_export_roundtrip_matches_live_network():
    net = DreamNetwork(_vgg_config())
    net.init_variables(seed=0)

    data = export_inference(net, raw_resolution=(128, 96), batch_size=2)
    assert isinstance(data, bytes) and len(data) > 1000

    call = load_inference(data)
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 255, size=(2, 96, 128, 3), dtype=np.uint8)
    belief, kps = call(frames)
    assert belief.shape[:2] == (2, 4)
    ref_kps = _live_raw_keypoints(net, frames)
    # Sentinel no-detections must stay below the reference's -999 check.
    detected = ref_kps > -999.0
    np.testing.assert_array_equal(np.asarray(kps) > -999.0, detected)
    np.testing.assert_allclose(
        np.asarray(kps)[detected], ref_kps[detected], atol=1e-3
    )


def test_export_int8_pipeline():
    net = DreamNetwork(_vgg_config())
    net.init_variables(seed=0)
    rng = np.random.RandomState(1)
    calib = [jnp.asarray(
        rng.uniform(-1, 1, size=(2, 64, 64, 3)).astype(np.float32)
    )]
    net.enable_int8_inference(calib)

    data = export_inference(net, raw_resolution=(128, 96), batch_size=1)
    call = load_inference(data)
    frames = rng.randint(0, 255, size=(1, 96, 128, 3), dtype=np.uint8)
    belief, kps = call(frames)
    ref_kps = _live_raw_keypoints(net, frames)  # int8 live path (enabled)
    detected = ref_kps > -999.0
    np.testing.assert_array_equal(np.asarray(kps) > -999.0, detected)
    np.testing.assert_allclose(
        np.asarray(kps)[detected], ref_kps[detected], atol=1e-3
    )


def test_export_cpu_platform_explicit():
    """Explicit --platforms lowering must produce a loadable artifact (the
    exported graph uses the portable XLA decode, never pallas_call)."""
    net = DreamNetwork(_vgg_config())
    net.init_variables(seed=0)
    data = export_inference(
        net, raw_resolution=(64, 64), batch_size=1, platforms=["cpu"]
    )
    call = load_inference(data)
    frames = np.zeros((1, 64, 64, 3), np.uint8)
    belief, kps = call(frames)
    assert np.asarray(kps).shape == (1, 4, 2)


def test_artifact_metadata_sidecar(tmp_path):
    """Sidecar self-description + ArtifactInference fallback to it."""
    import json

    from dream_tpu.export import artifact_metadata
    from dream_tpu.serve import ArtifactInference

    net = DreamNetwork(_vgg_config())
    net.init_variables(seed=0)
    meta = artifact_metadata(net, (128, 96), 1)
    assert meta["keypoint_names"] == [f"kp{i}" for i in range(4)]
    assert meta["input"]["shape"] == [1, 96, 128, 3]
    assert meta["int8"] is False

    artifact = tmp_path / "net.jaxexport"
    artifact.write_bytes(
        export_inference(net, raw_resolution=(128, 96), batch_size=1)
    )
    (tmp_path / "net.jaxexport.meta.json").write_text(json.dumps(meta))
    adapter = ArtifactInference(str(artifact))  # names from sidecar
    assert adapter.keypoint_names == meta["keypoint_names"]
    assert adapter.friendly_keypoint_names == ["KP0", "KP1", "KP2", "KP3"]
