"""Deployable inference artifacts via jax.export (StableHLO AOT).

Serializes the ENTIRE single-jit inference pipeline — raw uint8 frames ->
on-device preprocess/normalize -> conv stack (float or int8) -> belief-map
peak decode -> keypoint coords — into one self-contained StableHLO
artifact with the trained weights baked in as constants.  A serving
process deserializes and calls it without dream_tpu, flax, or the original
checkpoint present; versioned StableHLO gives forward-compatible
deployment across JAX/XLA releases.

No reference analog: the reference deploys by shipping the .pth + the full
torch/dream source tree (reference scripts/launch_dream_ros.py:124-130).

Cross-platform lowering is supported (e.g. export a TPU artifact from a
CPU host) via ``platforms``.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jax_export

from dream_tpu.ops import image_proc as image_proc_ops


def build_raw_inference_fn(dream_network, raw_resolution: Tuple[int, int]):
    """Closure ``raw_uint8 [B, H, W, 3] -> (belief_maps, keypoints)`` with the
    network's weights (and int8 scales, if enabled) captured as constants.

    ``raw_resolution`` is (width, height) of the incoming frames; the
    network's trained preprocessing mode and normalization are applied on
    device, exactly as ``DreamNetwork.keypoints_from_image`` does per frame.
    """
    dream_network.init_variables()
    net_input_res = dream_network.trained_net_input_resolution()
    preproc = dream_network.image_preprocessing()
    normalization = dream_network.image_normalization
    variables = dream_network.variables
    inference_fn = dream_network._inference_fn

    def run(raw_uint8):
        net_in = image_proc_ops.preprocess_and_normalize(
            raw_uint8, net_input_res, preproc, normalization
        )
        return inference_fn(variables, net_in)

    return run


def export_inference(
    dream_network,
    raw_resolution: Tuple[int, int],
    batch_size: int,
    platforms: Optional[Sequence[str]] = None,
) -> bytes:
    """Serialize the full inference pipeline to a StableHLO artifact.

    ``platforms``: lowering platforms (e.g. ``["tpu"]`` or
    ``["tpu", "cpu"]``); defaults to the current backend.
    """
    run = build_raw_inference_fn(dream_network, raw_resolution)
    w, h = raw_resolution
    spec = jax.ShapeDtypeStruct((batch_size, h, w, 3), jnp.uint8)
    exported = jax_export.export(
        jax.jit(run),
        platforms=tuple(platforms) if platforms else None,
    )(spec)
    return bytes(exported.serialize())


def load_inference(data: bytes):
    """Deserialize an artifact; returns ``call(raw_uint8) -> (belief, kps)``.

    The only import a consumer needs is jax itself.
    """
    return jax_export.deserialize(data).call
