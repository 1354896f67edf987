"""Differentiable soft-argmax keypoint decoding from heatmaps.

Functional TPU-native equivalent of the reference's SoftArgmaxPavlo module
(reference dream/spatial_softmax.py:15-95): 7x7 average pool, max-subtracted
temperature softmax over the spatial dims, then the expectation of the pixel
index grids.  Implemented as one fused XLA expression over NHWC-style
``[..., n_kp, H, W]`` heatmaps; the learned-beta variant lives in
``dream_tpu.models.heads.SoftArgmax`` which calls into this kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def avg_pool_7x7_same(heatmaps):
    """7x7, stride-1 average pool with zero padding 3 (count includes pads).

    Matches torch.nn.AvgPool2d(7, stride=1, padding=3) with default
    count_include_pad=True (reference dream/spatial_softmax.py:18).
    """
    x = jnp.asarray(heatmaps, dtype=jnp.float32)
    batch_shape = x.shape[:-2]
    h, w = x.shape[-2:]
    flat = x.reshape((-1, 1, h, w))
    pooled = jax.lax.reduce_window(
        flat,
        0.0,
        jax.lax.add,
        window_dimensions=(1, 1, 7, 7),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (0, 0), (3, 3), (3, 3)),
    ) / 49.0
    return pooled.reshape(batch_shape + (h, w))


def soft_argmax(heatmaps, beta, size_mult: float = 1.0, epsilon: float = 1e-8):
    """Expected (x, y) pixel coordinates under a softened heatmap distribution.

    Args:
      heatmaps: ``[..., n_kp, H, W]``.
      beta: ``[n_kp]`` (or broadcastable) softmax inverse-temperature.
      size_mult: coordinate scale factor.

    Returns:
      ``[..., n_kp, 2]`` (x, y) coordinates.

    Parity: reference dream/spatial_softmax.py:24-95 (avg-pool, max-subtract,
    exp(beta*x), normalize with +epsilon, expectation over col/row grids).
    """
    x = jnp.asarray(heatmaps, dtype=jnp.float32)
    h, w = x.shape[-2:]

    pooled = avg_pool_7x7_same(x)
    flat = pooled.reshape(x.shape[:-2] + (h * w,))
    flat = flat - jnp.max(flat, axis=-1, keepdims=True)
    beta = jnp.asarray(beta, dtype=jnp.float32)
    exp_maps = jnp.exp(beta[..., None] * flat)
    denom = jnp.sum(exp_maps, axis=-1, keepdims=True) + epsilon
    probs = exp_maps / denom

    col_idx = jnp.arange(w, dtype=jnp.float32) * size_mult
    row_idx = jnp.arange(h, dtype=jnp.float32) * size_mult
    probs2d = probs.reshape(x.shape[:-2] + (h, w))
    x_vals = jnp.sum(probs2d * col_idx[None, :], axis=(-2, -1))
    y_vals = jnp.sum(probs2d * row_idx[:, None], axis=(-2, -1))
    return jnp.stack([x_vals, y_vals], axis=-1)
