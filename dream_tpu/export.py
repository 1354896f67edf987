"""Deployable inference artifacts via jax.export (StableHLO AOT).

Serializes the ENTIRE single-jit inference pipeline — raw uint8 frames ->
on-device preprocess/normalize -> conv stack (float or int8) -> belief-map
peak decode -> **raw-frame keypoint coords** — into one self-contained
StableHLO artifact with the trained weights baked in as constants.  A
serving process deserializes and calls it without dream_tpu, flax, or the
original checkpoint present; versioned StableHLO gives forward-compatible
deployment across JAX/XLA releases.

Two portability choices are made for the exported graph (differing from
live inference):

- the peak decode uses the pure-XLA composite, not the TPU Pallas kernel
  (a serialized ``pallas_call`` would pin the artifact to one Mosaic
  version and break cross-platform lowering; the decode is a few percent
  of the pipeline);
- keypoints are returned in RAW-frame pixels — the netout->netin->raw
  affine is a trace-time constant of ``raw_resolution``, so it is baked
  in; consumers get coordinates directly usable against their frames.
  The no-detection sentinel stays "< -999" (affines only scale it more
  negative).

No reference analog: the reference deploys by shipping the .pth + the full
torch/dream source tree (reference scripts/launch_dream_ros.py:124-130).

Cross-platform lowering is supported (e.g. export a TPU artifact from a
CPU host, or a tpu+cpu artifact from this TPU host) via ``platforms``.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jax_export

from dream_tpu.ops import belief_maps as bm_ops
from dream_tpu.ops import coords as coord_ops
from dream_tpu.ops import image_proc as image_proc_ops


def serialized_int8_impl(dream_network) -> Optional[str]:
    """Which int8 graph an exported artifact for this network carries.

    Matches the live selection (``DreamNetwork._int8_impl``) except that a
    live 'pallas' selection serializes as 'xla_chain': Mosaic custom calls
    are not portable StableHLO, and the XLA fused-requant chain is
    numerically closest to the live pallas path (they share the chain
    structure and differ by <=1 int8 step per
    tests/test_vgg_int8_deploy.py), unlike the QuantConv graph whose down1
    runs with bf16 round trips.
    """
    if getattr(dream_network, "_int8_model", None) is None:
        return None
    impl = getattr(dream_network, "_int8_impl", None)
    if impl == "pallas":
        return "xla_chain"
    if impl in ("xla_chain", "quantconv"):
        return impl
    # Nets quantized before the selector existed carry the QuantConv graph.
    return "quantconv"


def build_raw_inference_fn(dream_network, raw_resolution: Tuple[int, int]):
    """Closure ``raw_uint8 [B, H, W, 3] -> (belief_maps, keypoints_raw)``
    with the network's weights (and int8 scales/folded params, if
    ``enable_int8_inference`` ran) captured as constants.

    ``raw_resolution`` is (width, height) of the incoming frames; the
    network's trained preprocessing mode and normalization run on device,
    and detected keypoints are mapped back into the raw frame exactly as
    ``DreamNetwork.keypoints_from_image`` does per frame.
    """
    net = dream_network
    assert net.network_config["architecture"]["output_heads"] == [
        "belief_maps"
    ], "export supports the belief-map head networks (all shipped configs)."
    net.init_variables()
    net_input_res = net.trained_net_input_resolution()
    preproc = net.image_preprocessing()
    normalization = net.image_normalization
    netin_res, netout_res = net.net_resolutions_from_image_raw_resolution(
        raw_resolution
    )
    kp_to_raw = coord_ops.affine_raw_from_netin(
        netin_res, raw_resolution, preproc
    ).compose(coord_ops.affine_netin_from_netout(netout_res, netin_res))
    offset = net.peak_offset_due_to_upsampling()
    use_scores = net.use_belief_peak_scores
    gap = net.belief_peak_next_best_score

    export_impl = serialized_int8_impl(net)
    if export_impl is not None:
        # Serialize the int8 graph `serialized_int8_impl` picked: the live
        # implementation, except a live Pallas selection is re-lowered
        # through the XLA chain (portable StableHLO, closest numerics).
        int8_params = net._int8_params
        if export_impl == "xla_chain":
            from dream_tpu.models import vgg_int8_deploy

            qvars = net._int8_quant_vars
            export_dtype = net.compute_dtype

            def apply_model(net_in):
                return [
                    vgg_int8_deploy.vgg_q_int8_infer(
                        int8_params, qvars, net_in, dtype=export_dtype,
                        backend="xla",
                    )
                ]
        else:
            int8_model = net._int8_model
            int8_vars = {"params": int8_params, "quant": net._int8_quant_vars}

            def apply_model(net_in):
                return int8_model.apply(int8_vars, net_in)

    else:
        variables = net.variables

        def apply_model(net_in):
            return net.apply_model(variables, net_in, train=False)[0]

    def run(raw_uint8):
        net_in = image_proc_ops.preprocess_and_normalize(
            raw_uint8, net_input_res, preproc, normalization
        )
        belief = jnp.moveaxis(apply_model(net_in)[-1], -1, 1)
        keypoints, _ = bm_ops.keypoints_from_belief_maps(
            belief, offset,
            use_belief_peak_scores=use_scores,
            belief_peak_next_best_score=gap,
            decode_backend="xla",
        )
        return belief, kp_to_raw(keypoints)

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
    """Deserialize an artifact; returns ``call(raw_uint8) -> (belief, kps_raw)``.

    The only import a consumer needs is jax itself.
    """
    return jax_export.deserialize(data).call


def artifact_metadata(
    dream_network, raw_resolution: Tuple[int, int], batch_size: int
) -> dict:
    """Self-description sidecar for an exported artifact (written as
    ``<artifact>.meta.json`` by the export CLI): everything a serving
    process needs beyond the StableHLO itself — keypoint names, the
    manipulator, input contract, and detection sentinel semantics.  The
    artifact file stays pure StableHLO so bare ``jax.export.deserialize``
    consumers are unaffected.
    """
    net = dream_network
    w, h = raw_resolution
    return {
        "format": "dream_tpu.jaxexport.v1",
        "manipulator": net.manipulator_name,
        "keypoint_names": list(net.keypoint_names),
        "friendly_keypoint_names": list(net.friendly_keypoint_names),
        "input": {
            "shape": [batch_size, h, w, 3],
            "dtype": "uint8",
            "raw_resolution_wh": [w, h],
        },
        "outputs": [
            "belief_maps [B, n_kp, h_out, w_out] float32",
            "keypoints_raw [B, n_kp, 2] float32 (sentinel: < -999 = no detection)",
        ],
        "int8": getattr(net, "_int8_model", None) is not None,
        # Which int8 graph the artifact actually carries ('quantconv' /
        # 'xla_chain'; null for float artifacts) — consumers comparing
        # against live-path numerics need to know (a live 'pallas'
        # selection serializes as 'xla_chain').
        "int8_impl": serialized_int8_impl(net),
        "architecture": net.network_config["architecture"]["type"],
    }
