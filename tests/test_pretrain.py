"""Encoder self-pretraining: autoencoder step + encoder graft into models.

Covers the ImageNet-init substitute (reference dream/models.py:587
pretrained=True has no offline equivalent; see dream_tpu/models/pretrain.py).
"""

import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from dream_tpu.models.pretrain import (
    ENCODER_KEYS,
    EncoderAutoencoder,
    extract_encoder_params,
    graft_encoder_params,
)


def test_autoencoder_shapes_and_extract():
    model = EncoderAutoencoder()
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (1, 16, 16, 3)  # 1/4 resolution reconstruction
    enc = extract_encoder_params(variables)
    assert set(enc["params"].keys()) == set(ENCODER_KEYS)


def test_graft_into_single_stage_hourglass():
    from dream_tpu.models import DreamHourglass

    ae = EncoderAutoencoder()
    ae_vars = ae.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)))
    enc = extract_encoder_params(ae_vars)

    hg = DreamHourglass(n_keypoints=3)
    hg_vars = hg.init(jax.random.PRNGKey(2), jnp.zeros((1, 32, 32, 3)))
    merged, n_grafted, n_skipped = graft_encoder_params(
        jax.device_get(hg_vars["params"]), enc
    )
    assert n_skipped == 0
    # 16 convs in the trunk -> 32 leaves (kernel+bias each).
    assert n_grafted == 32
    np.testing.assert_array_equal(
        merged["down3"]["conv1"]["kernel"],
        np.asarray(enc["params"]["down3"]["conv1"]["kernel"]),
    )
    # Non-encoder params untouched.
    np.testing.assert_array_equal(
        merged["head"]["conv0"]["kernel"],
        np.asarray(hg_vars["params"]["head"]["conv0"]["kernel"]),
    )


def test_graft_into_multistage_skips_mismatched_down1():
    from dream_tpu.models import DreamHourglassMultiStage

    ae_vars = EncoderAutoencoder().init(
        jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3))
    )
    enc = extract_encoder_params(ae_vars)

    ms = DreamHourglassMultiStage(n_keypoints=3, n_stages=2)
    ms_vars = ms.init(jax.random.PRNGKey(2), jnp.zeros((1, 32, 32, 3)))
    merged, n_grafted, n_skipped = graft_encoder_params(
        jax.device_get(ms_vars["params"]), enc
    )
    # Stage 2's down1.conv0 takes image+belief concat: kernel shape differs
    # and must be skipped, everything else grafts into both stages.
    assert n_skipped == 1
    assert n_grafted == 2 * 32 - 1
    np.testing.assert_array_equal(
        merged["stage2"]["down2"]["conv0"]["kernel"],
        np.asarray(enc["params"]["down2"]["conv0"]["kernel"]),
    )
    np.testing.assert_array_equal(
        merged["stage2"]["down1"]["conv0"]["kernel"],
        np.asarray(ms_vars["params"]["stage2"]["down1"]["conv0"]["kernel"]),
    )


def test_init_encoder_cli_path(tmp_path):
    """pretrain_encoder CLI (2 tiny steps) -> train_network --init-encoder."""
    from flax import serialization

    from pretrain_encoder import make_parser as pretrain_parser
    from pretrain_encoder import pretrain_encoder

    out = str(tmp_path / "enc.msgpack")
    args = pretrain_parser().parse_args(
        ["-o", out, "--steps", "2", "-b", "2", "--resolution", "64",
         "--log-every", "1"]
    )
    pretrain_encoder(args)
    assert os.path.exists(out)

    from dream_tpu.network import create_network_from_config_data
    from tests.test_network import _vgg_config

    net = create_network_from_config_data(_vgg_config())
    net.init_variables(seed=0)
    before = np.asarray(
        net.variables["params"]["down1"]["conv0"]["kernel"]
    ).copy()
    n_grafted, n_skipped = net.init_encoder_from(out)
    assert n_grafted == 32
    after = np.asarray(net.variables["params"]["down1"]["conv0"]["kernel"])
    assert not np.array_equal(before, after)
