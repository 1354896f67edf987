"""On-device batched image preprocessing.

The reference preprocesses one PIL image at a time on the host
(reference dream/image_proc.py:26-51,291-351).  Here preprocessing is a
batched jnp transform ``uint8 [B, H, W, 3] -> float [B, h, w, 3]`` that lives
*inside* the jitted inference/train graphs, so the host only ever decodes
bytes.  Resize uses ``jax.image.resize`` (bilinear, antialiased on
downscale), the array analog of PIL's BILINEAR filter.

Layout note: images are NHWC throughout dream_tpu (TPU-native layout), unlike
the reference's NCHW torch tensors.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from dream_tpu.utils.resolutions import (
    KNOWN_IMAGE_PREPROC_TYPES,
    resolution_after_preprocessing,
    shrink_resolution,
    shrink_and_crop_resolution,
)

# Re-export the keypoint coordinate converters here so that users of the
# reference's ``dream.image_proc`` module (reference dream/image_proc.py:135-260)
# find the same names on this module.
from dream_tpu.ops.coords import (  # noqa: F401
    KeypointAffine,
    convert_keypoints_to_netin_from_netout,
    convert_keypoints_to_netout_from_netin,
    convert_keypoints_to_netin_from_raw,
    convert_keypoints_to_raw_from_netin,
)
from dream_tpu.ops.belief_maps import (  # noqa: F401
    create_belief_maps,
    peaks_from_belief_maps,
    keypoints_from_belief_maps,
)


def resize_bilinear(images, resolution: Sequence[int], antialias: bool = True):
    """Bilinear resize of ``[..., H, W, C]`` images to (width, height)."""
    x = jnp.asarray(images)
    w, h = int(resolution[0]), int(resolution[1])
    out_shape = x.shape[:-3] + (h, w, x.shape[-1])
    return jax.image.resize(
        x.astype(jnp.float32), out_shape, method="bilinear", antialias=antialias
    )


def shrink_and_crop_images(images, image_ref_resolution: Sequence[int]):
    """Center-crop to reference aspect then resize (static shapes).

    Parity: reference dream/image_proc.py:291-315.  Input resolution is read
    from the array shape, so the crop box is a trace-time constant.
    """
    x = jnp.asarray(images)
    in_res = (x.shape[-2], x.shape[-3])  # (width, height)
    cropped_res, (cu, cv) = shrink_and_crop_resolution(in_res, image_ref_resolution)
    cropped = x[..., cv : cv + cropped_res[1], cu : cu + cropped_res[0], :]
    return resize_bilinear(cropped, image_ref_resolution)


def preprocess_images(
    images,
    image_ref_resolution: Sequence[int],
    image_preprocessing: str,
):
    """Batched device equivalent of reference dream/image_proc.py:26-51.

    Args:
      images: ``[..., H, W, 3]`` uint8 or float (0-255 or 0-1 scale preserved).
      image_ref_resolution: static (width, height) target.
      image_preprocessing: one of KNOWN_IMAGE_PREPROC_TYPES.
    """
    assert image_preprocessing in KNOWN_IMAGE_PREPROC_TYPES, (
        f'Image preprocessing type "{image_preprocessing}" is not recognized.'
    )
    x = jnp.asarray(images)
    if image_preprocessing == "none":
        return x.astype(jnp.float32)
    if image_preprocessing in ("resize", "shrink"):
        in_res = (x.shape[-2], x.shape[-3])
        target = resolution_after_preprocessing(
            in_res, image_ref_resolution, image_preprocessing
        )
        return resize_bilinear(x, target)
    return shrink_and_crop_images(x, image_ref_resolution)


def normalize_images(
    images,
    mean: Sequence[float],
    stdev: Sequence[float],
    input_scale: float = 255.0,
):
    """uint8/0-255 images -> normalized float32, channels-last.

    Equivalent of torchvision ToTensor (scale to [0,1]) + Normalize
    (reference dream/network.py:449-456).
    """
    x = jnp.asarray(images, dtype=jnp.float32) / input_scale
    m = jnp.asarray(mean, dtype=jnp.float32)
    s = jnp.asarray(stdev, dtype=jnp.float32)
    return (x - m) / s


def preprocess_and_normalize(
    images,
    image_ref_resolution: Sequence[int],
    image_preprocessing: str,
    image_normalization: Optional[dict],
):
    """Fused preprocess + normalize used by the jitted inference pipeline.

    ``images`` is uint8 ``[..., H, W, 3]``; returns float32 net input.
    """
    x = preprocess_images(images, image_ref_resolution, image_preprocessing)
    if image_normalization:
        return normalize_images(
            x, image_normalization["mean"], image_normalization["stdev"]
        )
    return x / 255.0
