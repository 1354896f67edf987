"""Output heads: SoftArgmax module (learned-beta soft keypoint decoding).

flax module wrapper over the :func:`dream_tpu.ops.spatial_softmax.soft_argmax`
kernel — the counterpart of the reference's SoftArgmaxPavlo nn.Module
(reference dream/spatial_softmax.py:15-95) with the same learned/fixed beta
options.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from dream_tpu.ops.spatial_softmax import soft_argmax


class SoftArgmax(nn.Module):
    """Differentiable keypoint coordinates from ``[..., n_kp, H, W]`` heatmaps."""

    n_keypoints: int
    learned_beta: bool = False
    initial_beta: float = 25.0
    size_mult: float = 1.0

    @nn.compact
    def __call__(self, heatmaps):
        if self.learned_beta:
            beta = self.param(
                "beta",
                lambda _key, shape: jnp.full(shape, self.initial_beta),
                (self.n_keypoints,),
            )
        else:
            beta = jnp.full((self.n_keypoints,), self.initial_beta)
        return soft_argmax(heatmaps, beta, size_mult=self.size_mult)
