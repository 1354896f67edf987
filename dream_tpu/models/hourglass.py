"""DreamHourglass and DreamHourglassMultiStage in flax (NHWC, TPU-first).

Architectural parity with the reference (reference dream/models.py:350-827):
a VGG19-style encoder sliced into five down blocks with 2x2 max-pools between
them, then either an upsample decoder (nearest x2 + convs, quarter- or
full-resolution) or a transposed-conv decoder (full resolution), optional
additive skip connections, and a 64->32->n_keypoints belief-map head.

The multi-stage variant chains N hourglasses, feeding each later stage the
input image concatenated with the previous stage's (upsampled) belief maps
(reference dream/models.py:478-553) — written as a loop over submodules
rather than the reference's six copy-pasted blocks.

All convs carry ImageNet-initialization-free defaults; converted torchvision
VGG19 weights can be loaded via scripts/convert_torch_weights.py for parity
with the reference's pretrained encoders (reference dream/models.py:587).
"""

from __future__ import annotations

from typing import Any, List

import jax.numpy as jnp
from flax import linen as nn

from dream_tpu.models.layers import (
    TorchConvTranspose,
    conv3x3,
    max_pool_torch,
    upsample_nearest,
)
from dream_tpu.models.quant import quant_conv3x3
from dream_tpu.ops.spatial_softmax import soft_argmax


def _conv3x3(features, name, dtype, quant_mode):
    """3x3 conv; int8-quantizable when a quant_mode is threaded through
    (post-training quantization, see models/quant.py — no reference analog)."""
    if quant_mode:
        return quant_conv3x3(features, name=name, mode=quant_mode, dtype=dtype)
    return conv3x3(features, name=name, dtype=dtype)


class _VggDownBlock(nn.Module):
    """n_convs x (3x3 conv + ReLU); mirrors the reference's vgg feature slices."""

    features: int
    n_convs: int
    dtype: Any = jnp.float32
    quant_mode: Any = None

    @nn.compact
    def __call__(self, x):
        for i in range(self.n_convs):
            x = nn.relu(
                _conv3x3(self.features, f"conv{i}", self.dtype, self.quant_mode)(x)
            )
        return x


class _DeconvBlock(nn.Module):
    """ConvTranspose(k3,s2,p1,op1) + ReLU [+ 3x3 conv + ReLU].

    Parity: reference dream/models.py:618-686.
    """

    features: int
    with_conv: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.relu(
            TorchConvTranspose(
                self.features, kernel_size=3, stride=2, padding=1, output_padding=1,
                name="deconv", dtype=self.dtype,
            )(x)
        )
        if self.with_conv:
            x = nn.relu(conv3x3(self.features, name="conv", dtype=self.dtype)(x))
        return x


class _UpsampleBlock(nn.Module):
    """Nearest x2 + conv/ReLU/conv — NOTE no trailing ReLU, matching the
    reference exactly (reference dream/models.py:690-710)."""

    mid_features: int
    out_features: int
    dtype: Any = jnp.float32
    quant_mode: Any = None

    @nn.compact
    def __call__(self, x):
        x = upsample_nearest(x, 2)
        x = nn.relu(
            _conv3x3(self.mid_features, "conv0", self.dtype, self.quant_mode)(x)
        )
        return _conv3x3(self.out_features, "conv1", self.dtype, self.quant_mode)(x)


class _UpsampleBlockFull(nn.Module):
    """Nearest x2 + (conv+ReLU) x2, used by the full_output path
    (reference dream/models.py:712-733)."""

    features: int
    dtype: Any = jnp.float32
    quant_mode: Any = None

    @nn.compact
    def __call__(self, x):
        x = upsample_nearest(x, 2)
        x = nn.relu(
            _conv3x3(self.features, "conv0", self.dtype, self.quant_mode)(x)
        )
        return nn.relu(
            _conv3x3(self.features, "conv1", self.dtype, self.quant_mode)(x)
        )


class _BeliefHead(nn.Module):
    """64 -> 64 -> 32 -> n_keypoints belief head (reference dream/models.py:736-747)."""

    n_keypoints: int
    dtype: Any = jnp.float32
    quant_mode: Any = None

    @nn.compact
    def __call__(self, x):
        x = nn.relu(_conv3x3(64, "conv0", self.dtype, self.quant_mode)(x))
        x = nn.relu(_conv3x3(32, "conv1", self.dtype, self.quant_mode)(x))
        # conv2 (the belief-map output layer) stays in the float compute
        # dtype under quantization: its output is read at subpixel
        # resolution by the peak decoder.
        # Belief maps return in float32 for stable loss/decode regardless of
        # the compute dtype.
        return conv3x3(self.n_keypoints, name="conv2", dtype=self.dtype)(x).astype(
            jnp.float32
        )


class DreamHourglass(nn.Module):
    """Single-stage hourglass belief-map regressor.

    Args mirror the reference ctor (reference dream/models.py:557-575).
    Input: ``[B, H, W, n_image_input_channels]``; output: list whose first
    element is ``[B, h, w, n_keypoints]`` belief maps (+ soft-argmax keypoints
    if ``internalize_spatial_softmax``).
    """

    n_keypoints: int
    n_image_input_channels: int = 3
    internalize_spatial_softmax: bool = False
    learned_beta: bool = True
    initial_beta: float = 1.0
    skip_connections: bool = False
    deconv_decoder: bool = False
    full_output: bool = False
    dtype: Any = jnp.float32
    # Post-training int8 quantization mode (None | 'calibrate' | 'int8');
    # quantizes every 3x3 conv except the belief-map output layer.  The
    # deconv decoder variant keeps its transposed convs in float (vgg-F
    # only; the fractionally-strided taps would need zero-aware scales).
    quant_mode: Any = None

    @nn.compact
    def __call__(self, x):
        q = self.quant_mode
        # Encoder: VGG19 feature slices (reference dream/models.py:587-615).
        x = x.astype(self.dtype)
        x_0_1 = _VggDownBlock(64, 2, name="down1", dtype=self.dtype, quant_mode=q)(x)
        x_0_1_d = max_pool_torch(x_0_1)
        x_0_2 = _VggDownBlock(128, 2, name="down2", dtype=self.dtype, quant_mode=q)(x_0_1_d)
        x_0_2_d = max_pool_torch(x_0_2)
        x_0_3 = _VggDownBlock(256, 4, name="down3", dtype=self.dtype, quant_mode=q)(x_0_2_d)
        x_0_3_d = max_pool_torch(x_0_3)
        x_0_4 = _VggDownBlock(512, 4, name="down4", dtype=self.dtype, quant_mode=q)(x_0_3_d)
        x_0_4_d = max_pool_torch(x_0_4)
        x_0_5 = _VggDownBlock(512, 4, name="down5", dtype=self.dtype, quant_mode=q)(x_0_4_d)

        decoder_input = x_0_5 + x_0_4_d if self.skip_connections else x_0_5

        if self.deconv_decoder:
            y = _DeconvBlock(256, name="deconv4", dtype=self.dtype)(decoder_input)
            y = _DeconvBlock(128, name="deconv3", dtype=self.dtype)(
                y + x_0_3_d if self.skip_connections else y
            )
            y = _DeconvBlock(64, name="deconv2", dtype=self.dtype)(
                y + x_0_2_d if self.skip_connections else y
            )
            y = _DeconvBlock(64, with_conv=False, name="deconv1", dtype=self.dtype)(
                y + x_0_1_d if self.skip_connections else y
            )
            head_in = y + x_0_1 if self.skip_connections else y
        else:
            y = _UpsampleBlock(256, 256, name="upsample4", dtype=self.dtype, quant_mode=q)(decoder_input)
            y = _UpsampleBlock(128, 64, name="upsample3", dtype=self.dtype, quant_mode=q)(
                y + x_0_3_d if self.skip_connections else y
            )
            if self.full_output:
                y = _UpsampleBlockFull(64, name="upsample2", dtype=self.dtype, quant_mode=q)(y)
                y = _UpsampleBlockFull(64, name="upsample1", dtype=self.dtype, quant_mode=q)(y)
            head_in = y

        belief_maps = _BeliefHead(self.n_keypoints, name="head", dtype=self.dtype, quant_mode=q)(head_in)

        outputs = [belief_maps]
        if self.internalize_spatial_softmax:
            if self.learned_beta:
                beta = self.param(
                    "beta",
                    lambda _key, shape: jnp.full(shape, self.initial_beta),
                    (self.n_keypoints,),
                )
            else:
                beta = jnp.full((self.n_keypoints,), self.initial_beta)
            # soft_argmax expects [..., n_kp, H, W]
            hm = jnp.moveaxis(belief_maps, -1, -3)
            outputs.append(soft_argmax(hm, beta))
        return outputs


class DreamHourglassMultiStage(nn.Module):
    """1-6 chained hourglass refinement stages (reference dream/models.py:350-553).

    Later stages consume ``concat([image, prev_stage_maps_upsampled])``; with
    the quarter-resolution upsample decoder the previous maps are nearest-x4
    upsampled back to input resolution first (reference dream/models.py:487-492).
    Returns the per-stage belief maps, last stage last.
    """

    n_keypoints: int
    n_stages: int = 2
    n_image_input_channels: int = 3
    internalize_spatial_softmax: bool = False
    learned_beta: bool = True
    initial_beta: float = 1.0
    skip_connections: bool = False
    deconv_decoder: bool = False
    full_output: bool = False
    dtype: Any = jnp.float32
    quant_mode: Any = None

    @nn.compact
    def __call__(self, x):
        assert 1 <= self.n_stages <= 6, (
            "DreamHourglassMultiStage supports 1 to 6 stages."
        )
        outputs: List[jnp.ndarray] = []
        prev = None
        for stage in range(self.n_stages):
            if stage == 0:
                stage_in = x
            else:
                if self.deconv_decoder or self.full_output:
                    prev_up = prev
                else:
                    prev_up = upsample_nearest(prev, 4)
                stage_in = jnp.concatenate([x, prev_up], axis=-1)
            stage_out = DreamHourglass(
                n_keypoints=self.n_keypoints,
                n_image_input_channels=stage_in.shape[-1],
                internalize_spatial_softmax=self.internalize_spatial_softmax,
                learned_beta=self.learned_beta,
                initial_beta=self.initial_beta,
                skip_connections=self.skip_connections,
                deconv_decoder=self.deconv_decoder,
                full_output=self.full_output,
                dtype=self.dtype,
                quant_mode=self.quant_mode,
                name=f"stage{stage + 1}",
            )(stage_in)
            prev = stage_out[0]
            outputs.append(prev)
        return outputs
