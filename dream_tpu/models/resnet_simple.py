"""ResnetSimple: ResNet-101 trunk + transposed-conv decoder, in flax NHWC.

Parity with reference dream/models.py:17-155: torchvision resnet101 backbone
(conv1/bn1/relu/maxpool + layers 1-4) followed by four ConvTranspose2d
(k4, s2, p1) + BatchNorm + ReLU blocks and a 1x1 belief head ("half"
resolution), or an extra fifth deconv block for the "full" variant.

BatchNorm uses torch semantics (momentum 0.1 -> flax momentum 0.9,
eps 1e-5); pass ``train=True`` plus a ``batch_stats`` mutable collection for
training, ``train=False`` for inference.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from dream_tpu.models.layers import TorchConvTranspose, max_pool_torch

_BN_MOMENTUM = 0.9  # torch BN_MOMENTUM = 0.1 (reference dream/models.py:35)


def _bn(name: str, train: bool, dtype=jnp.float32) -> nn.BatchNorm:
    return nn.BatchNorm(
        use_running_average=not train, momentum=_BN_MOMENTUM, epsilon=1e-5,
        name=name, dtype=dtype,
    )


class Bottleneck(nn.Module):
    """torchvision ResNet bottleneck block (expansion 4)."""

    features: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = nn.Conv(self.features, (1, 1), use_bias=False, name="conv1",
                      dtype=self.dtype)(x)
        out = _bn("bn1", train, self.dtype)(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.features,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)),
            use_bias=False,
            name="conv2",
            dtype=self.dtype,
        )(out)
        out = _bn("bn2", train, self.dtype)(out)
        out = nn.relu(out)
        out = nn.Conv(self.features * 4, (1, 1), use_bias=False, name="conv3",
                      dtype=self.dtype)(out)
        out = _bn("bn3", train, self.dtype)(out)
        if self.downsample:
            identity = nn.Conv(
                self.features * 4,
                (1, 1),
                strides=(self.stride, self.stride),
                use_bias=False,
                name="downsample_conv",
                dtype=self.dtype,
            )(x)
            identity = _bn("downsample_bn", train, self.dtype)(identity)
        return nn.relu(out + identity)


class _ResNetLayer(nn.Module):
    features: int
    n_blocks: int
    stride: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Bottleneck(
            self.features, stride=self.stride, downsample=True, name="block0",
            dtype=self.dtype,
        )(x, train)
        for i in range(1, self.n_blocks):
            x = Bottleneck(self.features, name=f"block{i}", dtype=self.dtype)(x, train)
        return x


class _DeconvBNRelu(nn.Module):
    """ConvTranspose(k4,s2,p1) + BN + ReLU (reference dream/models.py:37-77)."""

    features: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = TorchConvTranspose(
            self.features, kernel_size=4, stride=2, padding=1, name="deconv",
            dtype=self.dtype,
        )(x)
        x = _bn("bn", train, self.dtype)(x)
        return nn.relu(x)


class ResnetSimple(nn.Module):
    """DREAM-resnet-H ("half") / -F ("full") belief-map regressor.

    Input ``[B, H, W, 3]`` -> ``[ [B, h, w, n_keypoints] ]`` (single-stage
    list, matching the reference's return convention at dream/models.py:138-155).
    """

    n_keypoints: int = 7
    full: bool = False
    layers: Sequence[int] = (3, 4, 23, 3)  # resnet101
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)), use_bias=False,
            name="conv1", dtype=self.dtype,
        )(x)
        x = _bn("bn1", train, self.dtype)(x)
        x = nn.relu(x)
        x = max_pool_torch(x, window=3, stride=2, padding=1)

        x = _ResNetLayer(64, self.layers[0], stride=1, name="layer1", dtype=self.dtype)(x, train)
        x = _ResNetLayer(128, self.layers[1], stride=2, name="layer2", dtype=self.dtype)(x, train)
        x = _ResNetLayer(256, self.layers[2], stride=2, name="layer3", dtype=self.dtype)(x, train)
        x = _ResNetLayer(512, self.layers[3], stride=2, name="layer4", dtype=self.dtype)(x, train)

        for i in range(4):
            x = _DeconvBNRelu(256, name=f"up{i}", dtype=self.dtype)(x, train)

        if self.full:
            x = _DeconvBNRelu(256, name="up4", dtype=self.dtype)(x, train)

        x = nn.Conv(self.n_keypoints, (1, 1), name="head", dtype=self.dtype)(x)
        return [x.astype(jnp.float32)]
