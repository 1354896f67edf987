"""vgg-Q int8 deployment graph on the fused Pallas conv kernel.

Assembles the DreamHourglass quarter-resolution inference stack
(models/hourglass.py — parity with reference dream/models.py:557-747) as a
chain of ``ops.pallas_conv.conv3x3_int8`` calls: activations stay int8 in
the kernel's halo layout from down2.conv0 through head.conv0 (16 of the 19
convs, ~82% of the 139 GFLOPs), with max-pool / nearest-upsample applied
directly on int8 between blocks.  Convs outside the kernel:

- ``down1`` (conv0 has 3 input channels; conv1 is 64->64 at 400x400, where
  padding both lane dims to Mosaic's 128-multiple int8-matmul contract
  would 4x its FLOPs) runs in plain bf16, pooling included.  int8 buys
  nothing there (12.3 of 140 GFLOPs) and XLA's int8 conv at 400x400
  materializes its s32[B,400,400,64] accumulator plus a same-size layout
  copy — 14.65 G of HBM at b=128 (probed r4: OOMs the 15.75 G chip) and
  ~24 ms of pure HBM copy traffic per batch.  bf16 down1 is also strictly
  closer to the float reference.
- ``head.conv1`` re-uses the XLA int8 conv because its consumer
  (``head.conv2``) is the float belief-map output layer and has no
  calibrated activation scale to requantize against,
- ``head.conv2`` stays float (see models/quant.py: the belief-map output is
  read at subpixel resolution by the peak decoder).

Sub-128 channel counts inside the chain (down2.conv0's 64 input channels,
up3.conv1's and head.conv0's 64/32-wide tensors) are zero-padded to 128
lanes — exact, and the ~8% extra int8 ops are far cheaper than XLA's
unfused alternative.

Requantization scales fold the producer's dequant and the consumer's
quantization into one per-channel multiply: ``k_j = s_x_j * s_w_j / s_out_j``
where ``s_out_j`` is the NEXT conv's calibrated ``act_amax / 127`` — valid
because max-pool and nearest-upsample commute with monotone quantization
(the global amax survives both), so the calibrated input amax of conv j+1
IS the correct output scale for conv j.

Numerics vs the XLA QuantConv path (models/quant.py): identical int8 taps
and int32 accumulation; the requantized intermediate differs only where the
XLA path's extra bf16 round trip between convs rounds differently (<= 1
int8 step on a small fraction of elements).  Validated against the float
model by the same fidelity gates as the XLA path
(tests/test_vgg_int8_deploy.py, scripts/tpu_smoke.py).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax import lax

from dream_tpu.models.quant import _quantize_weights
from dream_tpu.ops import pallas_conv as pc

# (block, conv, relu_after) in forward order for the Pallas-chained segment.
# The consumer of each entry is the next entry; head.conv0's consumer is
# head.conv1 (handled in XLA).  Mosaic's int8 MXU dot requires both lane
# dims (Ci and Co) to be multiples of 128 (probed r4: 64/32-channel shapes
# fail the backend compile, >=128 multiples pass), so sub-128 channel counts
# are zero-padded to 128 (exact: zero weights emit zero channels, zero input
# channels contribute nothing).  down1.conv1 (64->64 at 400x400) is excluded
# — lane-padding would 4x its 11.8 GFLOPs — and runs in XLA with down1.conv0.
_CHAIN = [
    ("down2", "conv0", True),
    ("down2", "conv1", True),
    ("down3", "conv0", True),
    ("down3", "conv1", True),
    ("down3", "conv2", True),
    ("down3", "conv3", True),
    ("down4", "conv0", True),
    ("down4", "conv1", True),
    ("down4", "conv2", True),
    ("down4", "conv3", True),
    ("down5", "conv0", True),
    ("down5", "conv1", True),
    ("down5", "conv2", True),
    ("down5", "conv3", True),
    ("upsample4", "conv0", True),
    ("upsample4", "conv1", False),  # _UpsampleBlock has no trailing ReLU
    ("upsample3", "conv0", True),
    ("upsample3", "conv1", False),
    ("head", "conv0", True),
]
# Structural ops BEFORE the named conv: 2x2 max-pool / 2x nearest upsample.
# (down2.conv0's pool runs in the XLA prologue with down1.)
_PRE = {
    ("down3", "conv0"): "pool",
    ("down4", "conv0"): "pool",
    ("down5", "conv0"): "pool",
    ("upsample4", "conv0"): "up",
    ("upsample3", "conv0"): "up",
}


def _pool2_int8(xp, h, w):
    x = pc.unpad_activation(xp, h, w)
    x = lax.reduce_window(
        x, jnp.int8(-128), lax.max,
        (1, 2, 2, 1), (1, 2, 2, 1), ((0, 0),) * 4,
    )
    return pc.pad_activation(x), h // 2, w // 2


def _up2_int8(xp, h, w):
    x = pc.unpad_activation(xp, h, w)
    b, _, _, c = x.shape
    x = jnp.broadcast_to(
        x[:, :, None, :, None, :], (b, h, 2, w, 2, c)
    ).reshape(b, h * 2, w * 2, c)
    return pc.pad_activation(x), h * 2, w * 2


def _amax(qvars: Dict[str, Any], block: str, conv: str) -> jax.Array:
    return qvars[block][conv]["act_amax"]


def _pad_lanes(x: jax.Array, to: int) -> jax.Array:
    """Zero-pad the channel (lane) dim up to ``to`` (no-op when equal)."""
    c = x.shape[-1]
    if c == to:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(0, to - c)]
    return jnp.pad(x, pad)


def _lane128(c: int) -> int:
    return 128 * (-(-c // 128))


def supports(model) -> bool:
    """The fused chain covers the single-stage upsample-decoder hourglass
    (vgg-Q: quarter-res decoder, no skips, no full_output, 3-ch input)."""
    from dream_tpu.models.hourglass import DreamHourglass

    return (
        isinstance(model, DreamHourglass)
        and not model.deconv_decoder
        and not model.full_output
        and not model.skip_connections
        and not model.internalize_spatial_softmax
        and model.n_image_input_channels == 3
    )


def vgg_q_int8_infer(params, qvars, net_in, *, dtype=jnp.bfloat16,
                     backend: str = "pallas", interpret: bool = False):
    """int8 inference: normalized f32 net input -> f32 belief maps (NHWC).

    ``params``/``qvars`` are the float param tree and the calibrated
    ``quant`` collection from ``quant_mode='calibrate'`` passes (identical
    trees to the XLA int8 path — no new checkpoint or calibration format).

    ``backend`` selects the conv implementation for the chained segment:

    - ``"pallas"``: the fused Mosaic kernel (ops/pallas_conv.py) with its
      halo layout and 128-lane padding;
    - ``"xla"``: XLA's native int8 convs with the same fused-requant
      epilogue (i32 accumulate -> per-channel scale + bias -> ReLU ->
      round/clip -> int8), so activations stay int8 in HBM between convs
      with no lane padding and no bf16 round trips.  Unlike the QuantConv
      graph (models/quant.py), the producer emits int8 directly instead of
      dequantizing to the compute dtype and re-quantizing in the consumer.

    Both backends share the chain/prologue/head structure and produce the
    same int8 taps and int32 accumulations; they differ only in <=1-int8-step
    rounding of the requantized intermediates.
    """
    assert backend in ("pallas", "xla"), backend
    bsz, h, w, _ = net_in.shape
    assert h % 16 == 0 and w % 16 == 0, (h, w)

    def amax_scale(block, conv):
        return jnp.maximum(_amax(qvars, block, conv), 1e-12) / 127.0

    # bf16 prologue: down1 + pool in bf16 (see module docstring — int8 at
    # 400x400 OOMs/thrashes HBM on the s32 accumulator), then quantize the
    # pooled activation once at down2.conv0's calibrated scale.
    def _bf16_conv(x, kernel, bias):
        y = lax.conv_general_dilated(
            x, kernel.astype(jnp.bfloat16), window_strides=(1, 1),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jnp.maximum(y + bias.astype(jnp.bfloat16), 0)

    x = net_in.astype(jnp.bfloat16)
    x = _bf16_conv(x, params["down1"]["conv0"]["kernel"],
                   params["down1"]["conv0"]["bias"])
    x = _bf16_conv(x, params["down1"]["conv1"]["kernel"],
                   params["down1"]["conv1"]["bias"])
    x = lax.reduce_window(
        x, jnp.bfloat16(-jnp.inf), lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
        ((0, 0),) * 4,
    )
    s_q = amax_scale("down2", "conv0")
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / s_q), -127, 127
                   ).astype(jnp.int8)
    cur_h, cur_w = h // 2, w // 2

    def chain_scales(idx, block, conv, kernel, bias):
        """(w_q, kvec, bvec) with the consumer's requant scale folded in."""
        w_q, s_w = _quantize_weights(kernel)
        s_x = amax_scale(block, conv)
        if idx + 1 < len(_CHAIN):
            nb_block, nb_conv, _ = _CHAIN[idx + 1]
        else:
            nb_block, nb_conv = "head", "conv1"
        s_out = jnp.maximum(_amax(qvars, nb_block, nb_conv), 1e-12) / 127.0
        kvec = (s_x * s_w / s_out).astype(jnp.float32)
        bvec = bias.astype(jnp.float32) / s_out
        return w_q, kvec, bvec

    if backend == "xla":
        # XLA int8 chain: native int8 convs with the requant epilogue fused
        # behind each conv, int8 activations (and int8 pool/upsample)
        # between convs.
        for idx, (block, conv, relu) in enumerate(_CHAIN):
            pre = _PRE.get((block, conv))
            if pre == "pool":
                x_q = lax.reduce_window(
                    x_q, jnp.int8(-128), lax.max,
                    (1, 2, 2, 1), (1, 2, 2, 1), ((0, 0),) * 4,
                )
                cur_h, cur_w = cur_h // 2, cur_w // 2
            elif pre == "up":
                b_, c_ = x_q.shape[0], x_q.shape[-1]
                x_q = jnp.broadcast_to(
                    x_q[:, :, None, :, None, :],
                    (b_, cur_h, 2, cur_w, 2, c_),
                ).reshape(b_, cur_h * 2, cur_w * 2, c_)
                cur_h, cur_w = cur_h * 2, cur_w * 2
            w_q, kvec, bvec = chain_scales(
                idx, block, conv,
                params[block][conv]["kernel"], params[block][conv]["bias"],
            )
            y = lax.conv_general_dilated(
                x_q, w_q, window_strides=(1, 1), padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            yf = y.astype(jnp.float32) * kvec + bvec
            if relu:
                yf = jnp.maximum(yf, 0.0)
            x_q = jnp.clip(jnp.round(yf), -127.0, 127.0).astype(jnp.int8)
    else:
        # Pallas chain (lane-padded to the kernel's 128-multiple contract).
        xp = pc.pad_activation(_pad_lanes(x_q, _lane128(x_q.shape[-1])))
        for idx, (block, conv, relu) in enumerate(_CHAIN):
            pre = _PRE.get((block, conv))
            if pre == "pool":
                xp, cur_h, cur_w = _pool2_int8(xp, cur_h, cur_w)
            elif pre == "up":
                xp, cur_h, cur_w = _up2_int8(xp, cur_h, cur_w)
            kernel = params[block][conv]["kernel"]
            w_q, kvec, bvec = chain_scales(
                idx, block, conv, kernel, params[block][conv]["bias"],
            )
            ci, co = kernel.shape[2], kernel.shape[3]
            ci_p, co_p = _lane128(ci), _lane128(co)
            w9 = pc.pack_weights(
                _pad_lanes(
                    jnp.pad(w_q, ((0, 0), (0, 0), (0, ci_p - ci), (0, 0))),
                    co_p,
                )
            )
            xp = pc.conv3x3_int8(
                xp, w9, _pad_lanes(kvec, co_p), _pad_lanes(bvec, co_p),
                h=cur_h, w=cur_w, relu=relu, interpret=interpret,
            )
        xp = pc.unpad_activation(xp, cur_h, cur_w)
        x_q = xp

    n_head = params["head"]["conv0"]["kernel"].shape[-1]
    x_q = x_q[..., :n_head]

    # head.conv1 in XLA int8 (consumer is the float output conv).
    k1 = params["head"]["conv1"]["kernel"]
    b1 = params["head"]["conv1"]["bias"]
    w_q1, s_w1 = _quantize_weights(k1)
    s_x1 = jnp.maximum(_amax(qvars, "head", "conv1"), 1e-12) / 127.0
    y = lax.conv_general_dilated(
        x_q, w_q1, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    x = jnp.maximum(
        y.astype(jnp.float32) * (s_x1 * s_w1) + b1.astype(jnp.float32), 0.0
    ).astype(dtype)

    # head.conv2: float belief-map output layer (models/quant.py rationale).
    k2 = params["head"]["conv2"]["kernel"]
    b2 = params["head"]["conv2"]["bias"]
    out = lax.conv_general_dilated(
        x, k2.astype(dtype), window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b2.astype(dtype)
    return out.astype(jnp.float32)
