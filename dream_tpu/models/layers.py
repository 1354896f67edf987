"""Layer primitives with torch-compatible arithmetic, NHWC layout.

dream_tpu models must be able to load converted weights from the reference's
released PyTorch checkpoints (reference trained_models/DOWNLOAD.sh), so the
layer primitives here reproduce torch's exact output-size arithmetic and tap
alignment:

- ``TorchConvTranspose``: torch ConvTranspose2d semantics via a fractionally
  strided ``lax.conv_general_dilated`` (lhs_dilation) with explicit padding
  ``k-1-p`` (+ output_padding on the high side).  flax's own ConvTranspose has
  different tap alignment for even kernels.
- ``max_pool_torch``: floor-mode pooling (torch default, ceil_mode=False).
- ``upsample_nearest``: exact x2/x4 nearest-neighbor (torch nn.Upsample default).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


class TorchConvTranspose(nn.Module):
    """ConvTranspose2d(out_ch, k, stride, padding, output_padding) in NHWC.

    Parameter layout is ``[kh, kw, in_ch, out_ch]`` (HWIO).  Weight converters
    from torch must transpose torch's ``[in, out, kh, kw]`` and flip the
    spatial taps.  ``dtype`` is the computation dtype (params stay float32).
    """

    features: int
    kernel_size: int
    stride: int = 2
    padding: int = 1
    output_padding: int = 0
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k, s, p, op = self.kernel_size, self.stride, self.padding, self.output_padding
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (k, k, in_ch, self.features),
        )
        pad = (k - 1 - p, k - 1 - p + op)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=(1, 1),
            padding=(pad, pad),
            lhs_dilation=(s, s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(self.dtype)
        return y


def max_pool_torch(x, window: int = 2, stride: int | None = None, padding: int = 0):
    """torch MaxPool2d with ceil_mode=False (floor) on NHWC arrays."""
    stride = stride or window
    pad = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=pad,
    )


def upsample_nearest(x, factor: int = 2):
    """Exact nearest-neighbor upsample (torch nn.Upsample default mode)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(
        x[:, :, None, :, None, :], (b, h, factor, w, factor, c)
    )
    return x.reshape(b, h * factor, w * factor, c)


def conv3x3(features: int, name: str | None = None, dtype: Any = jnp.float32) -> nn.Conv:
    """3x3 stride-1 pad-1 conv (torch Conv2d(k=3,s=1,p=1) == SAME)."""
    return nn.Conv(
        features, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)), name=name,
        dtype=dtype,
    )


def conv1x1(features: int, name: str | None = None, dtype: Any = jnp.float32) -> nn.Conv:
    return nn.Conv(
        features, (1, 1), strides=(1, 1), padding="VALID", name=name, dtype=dtype
    )
