"""jax.export inference-artifact tests (dream_tpu/export.py).

The artifact must be self-contained (weights as constants), reproduce the
live network's outputs exactly, and support int8-quantized pipelines.
"""

import numpy as np

import jax.numpy as jnp

from dream_tpu.export import export_inference, load_inference
from dream_tpu.network import DreamNetwork
from dream_tpu.ops.image_proc import preprocess_and_normalize
from tests.test_network import _vgg_config


def _reference_outputs(net, frames):
    net_in = preprocess_and_normalize(
        jnp.asarray(frames), net.trained_net_input_resolution(),
        net.image_preprocessing(), net.image_normalization,
    )
    return net.inference(net_in)


def test_export_roundtrip_matches_live_network():
    net = DreamNetwork(_vgg_config())
    net.init_variables(seed=0)

    data = export_inference(net, raw_resolution=(128, 96), batch_size=2)
    assert isinstance(data, bytes) and len(data) > 1000

    call = load_inference(data)
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 255, size=(2, 96, 128, 3), dtype=np.uint8)
    belief, kps = call(frames)
    ref_belief, ref_kps = _reference_outputs(net, frames)
    np.testing.assert_allclose(
        np.asarray(belief), np.asarray(ref_belief), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(kps), np.asarray(ref_kps), atol=1e-4)


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
    ref_belief, ref_kps = _reference_outputs(net, frames)
    np.testing.assert_allclose(
        np.asarray(belief), np.asarray(ref_belief), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(kps), np.asarray(ref_kps), atol=1e-4)
