"""DopeNetworkBelief: legacy CPM-style cascaded belief network, flax NHWC.

Parity with reference dream/models.py:158-347: VGG19 features through
conv4_2 (1/8 resolution), two adapter convs (512->256->128), then six
cascaded CPM stages.  Stage 1 uses 3x3 convs with a 128->512 1x1 expansion;
stages 2-6 use 7x7 convs on ``concat([prev_belief, features])``.  ``stage_out``
truncates the cascade and the forward returns all intermediate stage outputs
(reference dream/models.py:259-294).

Unused by the shipped configs (KNOWN_ARCHITECTURES covers vgg/resnet) but
kept for component parity with the reference model zoo.
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp
from flax import linen as nn

from dream_tpu.models.layers import conv1x1, max_pool_torch


def _conv(features, kernel, name):
    pad = kernel // 2
    return nn.Conv(
        features, (kernel, kernel), padding=((pad, pad), (pad, pad)), name=name
    )


class _VggFeatures(nn.Module):
    """VGG19 features[0:23] + 512->256->128 adapter (reference dream/models.py:182-202)."""

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate([64, 64]):
            x = nn.relu(_conv(f, 3, f"conv1_{i}")(x))
        x = max_pool_torch(x)
        for i, f in enumerate([128, 128]):
            x = nn.relu(_conv(f, 3, f"conv2_{i}")(x))
        x = max_pool_torch(x)
        for i, f in enumerate([256, 256, 256, 256]):
            x = nn.relu(_conv(f, 3, f"conv3_{i}")(x))
        x = max_pool_torch(x)
        for i, f in enumerate([512, 512]):
            x = nn.relu(_conv(f, 3, f"conv4_{i}")(x))
        x = nn.relu(_conv(256, 3, "adapt0")(x))
        x = nn.relu(_conv(128, 3, "adapt1")(x))
        return x


class _CpmStage(nn.Module):
    """One CPM refinement stage (reference dream/models.py:296-347)."""

    out_channels: int
    first: bool = False

    @nn.compact
    def __call__(self, x):
        kernel = 3 if self.first else 7
        n_mid = 2 if self.first else 4  # middle (relu+conv) repeats
        x = _conv(128, kernel, "conv_in")(x)
        for i in range(n_mid):
            x = nn.relu(x)
            x = _conv(128, kernel, f"conv_mid{i}")(x)
        x = nn.relu(x)
        x = conv1x1(512 if self.first else 128, "conv_expand")(x)
        x = nn.relu(x)
        return conv1x1(self.out_channels, "conv_out")(x)


class DopeNetworkBelief(nn.Module):
    n_keypoints: int = 7
    stage_out: int = 6

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        features = _VggFeatures(name="vgg")(x)
        outputs: List[jnp.ndarray] = []
        out = _CpmStage(self.n_keypoints, first=True, name="stage1")(features)
        outputs.append(out)
        for s in range(2, self.stage_out + 1):
            stage_in = jnp.concatenate([out, features], axis=-1)
            out = _CpmStage(self.n_keypoints, name=f"stage{s}")(stage_in)
            outputs.append(out)
        return outputs
