"""Deploy-time ResnetSimple: BatchNorm folded into convs, int8-quantizable.

The training-time ``ResnetSimple`` (models/resnet_simple.py) carries
BatchNorm layers; for inference the affine BN transform folds exactly into
the preceding conv (the standard deploy transform):

    BN(conv(x, W)) = conv(x, W * s) + (beta - mean * s),
    s = scale / sqrt(var + eps)     (per output channel)

``fold_batchnorm_resnet`` walks a trained ResnetSimple variables dict
(params + batch_stats) and produces the parameter tree for
``ResnetSimpleDeploy`` — the same topology with biased convs and no BN.
The deploy model in ``mode='float'`` is bit-exact against the source model
in inference mode (pinned by tests); ``mode='int8'`` quantizes every conv
and transposed conv (per-channel weights, calibrated per-tensor activation
scales — see models/quant.py) except the 1x1 belief head, which stays in
the float compute dtype.

This is the resnet arm of the int8 PTQ extension (no reference analog —
reference inference is torch fp32, dream/models.py:17-155).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from dream_tpu.models.layers import conv1x1, max_pool_torch
from dream_tpu.models.quant import QuantConv, QuantConvTranspose

_BN_EPS = 1e-5


def _fold(conv_params, bn_params, bn_stats):
    """Fold one BN (scale,bias,mean,var) into a bias-free conv kernel."""
    s = np.asarray(bn_params["scale"], np.float64) / np.sqrt(
        np.asarray(bn_stats["var"], np.float64) + _BN_EPS
    )
    kernel = np.asarray(conv_params["kernel"], np.float64) * s
    bias = np.asarray(bn_params["bias"], np.float64) - np.asarray(
        bn_stats["mean"], np.float64
    ) * s
    return {
        "kernel": jnp.asarray(kernel, jnp.float32),
        "bias": jnp.asarray(bias, jnp.float32),
    }


def fold_batchnorm_resnet(variables):
    """ResnetSimple variables (params + batch_stats) -> ResnetSimpleDeploy params."""
    params = variables["params"]
    stats = variables["batch_stats"]
    out = {"conv1": _fold(params["conv1"], params["bn1"], stats["bn1"])}
    for layer_name, layer_params in params.items():
        if not layer_name.startswith("layer"):
            continue
        layer_out = {}
        for block_name, block in layer_params.items():
            block_stats = stats[layer_name][block_name]
            folded = {}
            for i in (1, 2, 3):
                folded[f"conv{i}"] = _fold(
                    block[f"conv{i}"], block[f"bn{i}"], block_stats[f"bn{i}"]
                )
            if "downsample_conv" in block:
                folded["downsample_conv"] = _fold(
                    block["downsample_conv"],
                    block["downsample_bn"],
                    block_stats["downsample_bn"],
                )
            layer_out[block_name] = folded
        out[layer_name] = layer_out
    for up_name, up in params.items():
        if not up_name.startswith("up"):
            continue
        deconv = dict(up["deconv"])
        kernel = np.asarray(deconv["kernel"], np.float64)
        dc_bias = np.asarray(deconv.get("bias", np.zeros(kernel.shape[-1])), np.float64)
        s = np.asarray(up["bn"]["scale"], np.float64) / np.sqrt(
            np.asarray(stats[up_name]["bn"]["var"], np.float64) + _BN_EPS
        )
        out[f"{up_name}_deconv"] = {
            "kernel": jnp.asarray(kernel * s, jnp.float32),
            "bias": jnp.asarray(
                np.asarray(up["bn"]["bias"], np.float64)
                + (dc_bias - np.asarray(stats[up_name]["bn"]["mean"], np.float64)) * s,
                jnp.float32,
            ),
        }
    out["head"] = dict(params["head"])
    return {"params": out}


class _BottleneckDeploy(nn.Module):
    features: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    mode: str = "float"

    @nn.compact
    def __call__(self, x):
        identity = x
        out = QuantConv(
            self.features, kernel_size=1, padding=0, name="conv1",
            mode=self.mode, dtype=self.dtype,
        )(x)
        out = nn.relu(out)
        out = QuantConv(
            self.features, kernel_size=3, padding=1, stride=self.stride,
            name="conv2", mode=self.mode, dtype=self.dtype,
        )(out)
        out = nn.relu(out)
        out = QuantConv(
            self.features * 4, kernel_size=1, padding=0, name="conv3",
            mode=self.mode, dtype=self.dtype,
        )(out)
        if self.downsample:
            identity = QuantConv(
                self.features * 4, kernel_size=1, padding=0,
                stride=self.stride, name="downsample_conv", mode=self.mode,
                dtype=self.dtype,
            )(x)
        # The residual add runs in the float compute dtype (requantization
        # across the skip would compound two activation scales).
        return nn.relu(out + identity)


class _ResNetLayerDeploy(nn.Module):
    features: int
    n_blocks: int
    stride: int
    dtype: Any = jnp.float32
    mode: str = "float"

    @nn.compact
    def __call__(self, x):
        x = _BottleneckDeploy(
            self.features, stride=self.stride, downsample=True, name="block0",
            dtype=self.dtype, mode=self.mode,
        )(x)
        for i in range(1, self.n_blocks):
            x = _BottleneckDeploy(
                self.features, name=f"block{i}", dtype=self.dtype,
                mode=self.mode,
            )(x)
        return x


class ResnetSimpleDeploy(nn.Module):
    """Inference-only ResnetSimple with folded BN (+ optional int8 convs).

    ``mode``: 'float' (bit-exact vs the BN model in eval mode),
    'calibrate' (float compute, records activation amax into the 'quant'
    collection), or 'int8'.
    """

    n_keypoints: int = 7
    full: bool = False
    layers: Sequence[int] = (3, 4, 23, 3)  # resnet101
    dtype: Any = jnp.float32
    mode: str = "float"

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        x = QuantConv(
            64, kernel_size=7, padding=3, stride=2, name="conv1",
            mode=self.mode, dtype=self.dtype,
        )(x)
        x = nn.relu(x)
        x = max_pool_torch(x, window=3, stride=2, padding=1)

        x = _ResNetLayerDeploy(64, self.layers[0], stride=1, name="layer1",
                               dtype=self.dtype, mode=self.mode)(x)
        x = _ResNetLayerDeploy(128, self.layers[1], stride=2, name="layer2",
                               dtype=self.dtype, mode=self.mode)(x)
        x = _ResNetLayerDeploy(256, self.layers[2], stride=2, name="layer3",
                               dtype=self.dtype, mode=self.mode)(x)
        x = _ResNetLayerDeploy(512, self.layers[3], stride=2, name="layer4",
                               dtype=self.dtype, mode=self.mode)(x)

        for i in range(4):
            x = QuantConvTranspose(
                256, kernel_size=4, stride=2, padding=1, name=f"up{i}_deconv",
                mode=self.mode, dtype=self.dtype,
            )(x)
            x = nn.relu(x)
        if self.full:
            x = QuantConvTranspose(
                256, kernel_size=4, stride=2, padding=1, name="up4_deconv",
                mode=self.mode, dtype=self.dtype,
            )(x)
            x = nn.relu(x)

        # 1x1 belief head stays in the float compute dtype (subpixel decode
        # reads its output at 1/100 px).
        x = conv1x1(self.n_keypoints, name="head", dtype=self.dtype)(x)
        return [x.astype(jnp.float32)]
