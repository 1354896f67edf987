"""Self-supervised encoder pretraining (denoising autoencoder).

The reference's sample efficiency comes from ImageNet-pretrained encoders:
every shipped model starts from torchvision weights (reference
dream/models.py:587 ``vgg19(pretrained=True)``, :22 ``resnet101``).  This
egress-free environment has no ImageNet weights, so dream_tpu offers two
substitutes:

1. convert real torchvision/DREAM ``.pth`` files when present
   (scripts/convert_torch_weights.py), and
2. THIS module: self-pretrain the VGG19-layout encoder as a denoising
   autoencoder on streamed synthetic scenes (scripts/pretrain_encoder.py),
   then warm-start training via ``train_network.py --init-encoder`` — the
   from-scratch vgg-Q otherwise burns thousands of steps escaping the
   zero-output plateau.

The autoencoder's ``down1..down5`` submodules are the EXACT modules
DreamHourglass uses (same names, widths, structure), so the pretrained
subtree grafts directly into any hourglass params pytree
(DreamNetwork.init_encoder_from).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from dream_tpu.models.hourglass import _VggDownBlock
from dream_tpu.models.layers import conv3x3, max_pool_torch, upsample_nearest


class EncoderAutoencoder(nn.Module):
    """VGG19-layout encoder + light reconstruction decoder.

    Input: noisy normalized image ``[B, H, W, 3]``.
    Output: reconstruction at 1/4 input resolution ``[B, H/4, W/4, 3]`` —
    enough spatial pressure to learn edges/parts without paying for a
    full-resolution decoder.
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        # Identical encoder trunk to DreamHourglass (same submodule names).
        x = _VggDownBlock(64, 2, name="down1", dtype=self.dtype)(x)
        x = max_pool_torch(x)
        x = _VggDownBlock(128, 2, name="down2", dtype=self.dtype)(x)
        x = max_pool_torch(x)
        x = _VggDownBlock(256, 4, name="down3", dtype=self.dtype)(x)
        x = max_pool_torch(x)
        x = _VggDownBlock(512, 4, name="down4", dtype=self.dtype)(x)
        x = max_pool_torch(x)
        x = _VggDownBlock(512, 4, name="down5", dtype=self.dtype)(x)

        # Reconstruction decoder (discarded after pretraining).
        x = upsample_nearest(x, 2)
        x = nn.relu(conv3x3(256, name="rec4", dtype=self.dtype)(x))
        x = upsample_nearest(x, 2)
        x = nn.relu(conv3x3(128, name="rec3", dtype=self.dtype)(x))
        return conv3x3(3, name="rec_out", dtype=self.dtype)(x).astype(jnp.float32)


ENCODER_KEYS = ("down1", "down2", "down3", "down4", "down5")


def extract_encoder_params(variables) -> dict:
    """Pull the encoder subtree out of autoencoder variables."""
    params = variables["params"]
    return {"params": {k: params[k] for k in ENCODER_KEYS if k in params}}


def graft_encoder_params(target_params: dict, encoder_params: dict) -> tuple:
    """Recursively merge encoder weights into a model params pytree.

    Matches by submodule name (``down1``..``down5``) at ANY depth (handles
    both single-stage params and multistage ``stage1/down1`` layouts) and
    only replaces leaves whose shapes agree — multistage stages >1 take an
    image+belief concat, so their ``down1.conv0`` has a different ``cin``
    and correctly stays untouched.

    Returns ``(merged_params, n_grafted_leaves, n_skipped_leaves)``.
    """
    import numpy as np

    enc = encoder_params["params"] if "params" in encoder_params else encoder_params
    stats = {"grafted": 0, "skipped": 0}

    def merge_subtree(dst, src):
        out = {}
        for key, val in dst.items():
            if key in src and isinstance(val, dict) and isinstance(src[key], dict):
                out[key] = merge_subtree(val, src[key])
            elif key in src and not isinstance(val, dict):
                if tuple(np.shape(src[key])) == tuple(np.shape(val)):
                    out[key] = src[key]
                    stats["grafted"] += 1
                else:
                    out[key] = val
                    stats["skipped"] += 1
            else:
                out[key] = val
        return out

    def walk(node):
        if not isinstance(node, dict):
            return node
        out = {}
        for key, val in node.items():
            if key in enc and isinstance(val, dict):
                out[key] = merge_subtree(val, enc[key])
            else:
                out[key] = walk(val)
        return out

    merged = walk(target_params)
    return merged, stats["grafted"], stats["skipped"]
