"""Post-training int8 quantization for the belief-map conv stacks.

TPU v5e executes int8 MXU contractions at twice the bf16 rate, and the
hourglass inference pipeline is conv-bound (~70% MXU utilization at bf16),
so an int8 conv stack is the remaining large single-chip speed lever.  The
reference has no quantization story (torch fp32 end-to-end); this is a
dream_tpu extension.

Scheme (standard symmetric PTQ):

- **Weights**: per-output-channel symmetric int8, ``s_w[c] = max|W[...,c]|/127``,
  quantized inside the traced graph (cheap elementwise on [kh,kw,ci,co], XLA
  folds it next to the conv).
- **Activations**: per-tensor symmetric int8 with a calibration-time amax.
  Calibration runs the f32 model over representative batches with the
  ``quant`` flax collection mutable; each ``QuantConv`` records
  ``max |x|`` over everything it saw.
- **Accumulation**: int32 (``preferred_element_type``), dequantized with the
  combined scale ``s_x * s_w[c]`` before bias + ReLU.

The first conv of the network quantizes fine (input is the normalized image,
range [-1, 1] exactly); the final belief-map head conv stays in the float
compute dtype — belief-map peak geometry is read at 1/100 px resolution by
the subpixel decoder and the last layer is where output quantization noise
would land unfiltered.

Usage: build the model with ``quant_mode='calibrate'``, run
``model.apply(vars, x, mutable=['quant'])`` over calibration batches, then
rebuild with ``quant_mode='int8'`` and apply with the merged variables.
``DreamNetwork.enable_int8_inference`` wraps this.

**QAT** (``quant_mode='qat'``): quantization-aware training for when PTQ's
small ADD-AUC cost matters.  The forward fake-quantizes weights
(per-output-channel) and activations (per-batch dynamic amax) through a
straight-through-estimator round — the conv contracts the integer-valued
arrays exactly as the int8 deploy graph will, but in the float domain, so
``jax.grad`` flows through the whole training step unchanged and the fused
/ scanned-epoch dispatchers need no mutable quant state.  Scales are
``stop_gradient`` constants (standard min-max QAT).  A qat-trained
checkpoint is then deployed through the ordinary calibrate->int8 PTQ path.

Two deliberate approximations in the qat<->deploy match:

- **Activation scales**: QAT uses the CURRENT batch's dynamic amax while the
  int8 deploy path uses a static calibrated amax, so the *weight* grid is
  exactly what training optimized against but the activation grid matches
  only to the extent the calibration distribution matches training.
  Calibrate PTQ on training-distribution batches when deploying a qat
  checkpoint.
- **Accumulation width**: QAT accumulates the integer-valued products in
  float32 (MXU) while deploy accumulates in int32.  Products reach
  127*127~16k, so a wide conv's dot products can exceed float32's 2^24
  exact-integer range and the match becomes approximate at scale (bounded
  by f32 rounding of partial sums — see
  tests/test_quant.py::test_quantconv_qat_int8_gap_wide_channels).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

# Calibration/quantized modes threaded through the model as a static
# module attribute ('calibrate' | 'int8' | 'qat' | None).
QUANT_MODES = (None, "calibrate", "int8", "qat")


def _ste_round(x):
    """Round with a straight-through gradient (identity backward)."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def _quantize_weights(kernel):
    """Per-output-channel symmetric int8 weights + f32 scales (HWIO)."""
    w32 = kernel.astype(jnp.float32)
    s_w = jnp.maximum(jnp.max(jnp.abs(w32), axis=(0, 1, 2)), 1e-12) / 127.0
    w_q = jnp.clip(jnp.round(w32 / s_w), -127.0, 127.0).astype(jnp.int8)
    return w_q, s_w


def _quantize_activations(x, amax):
    s_x = jnp.maximum(amax, 1e-12) / 127.0
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x), -127.0, 127.0)
    return x_q.astype(jnp.int8), s_x


class _QuantConvBase(nn.Module):
    """Shared float/calibrate/int8 machinery for conv-like modules.

    Subclasses declare the parameters and supply the lax conv kwargs; the
    mode handling (amax bookkeeping, weight/activation quantization, int32
    accumulation, dequant epilogue) lives here once.

    Per-dispatch weight quantization note: the f32->int8 weight transform
    runs inside the traced graph on every call.  For vgg-Q that is ~92 MB
    of extra HBM reads + an elementwise pass (~0.1 ms) against ~10-100 ms
    of conv work per batch — not worth precomputing at the cost of a second
    param-tree format.
    """

    def _run(self, x, kernel, bias, conv_kwargs):
        assert self.mode in ("float", "calibrate", "int8", "qat"), self.mode
        if self.mode == "qat":
            # Fake-quantize into the integer domain (STE round, saturating
            # clip) and contract the integer-valued arrays — same numerics
            # the int8 deploy graph sees, but differentiable and stateless.
            # Scales come from the CURRENT batch/weights via stop_gradient.
            w32 = kernel.astype(jnp.float32)
            s_w = jnp.maximum(
                jax.lax.stop_gradient(jnp.max(jnp.abs(w32), axis=(0, 1, 2))),
                1e-12,
            ) / 127.0
            w_q = jnp.clip(_ste_round(w32 / s_w), -127.0, 127.0)
            x32 = x.astype(jnp.float32)
            s_x = jnp.maximum(
                jax.lax.stop_gradient(jnp.max(jnp.abs(x32))), 1e-12
            ) / 127.0
            x_q = jnp.clip(_ste_round(x32 / s_x), -127.0, 127.0)
            # Contract in float32: x_q/w_q are integer-valued f32 already,
            # and a mixed bf16-input/f32-preferred conv breaks under
            # jax.grad (the transpose conv contracts the f32 cotangent
            # against a bf16 kernel and lax rejects the dtype mix).  QAT is
            # a fine-tune stage, so the f32 conv cost is acceptable.
            y = jax.lax.conv_general_dilated(
                x_q,
                w_q,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                **conv_kwargs,
            ) * (s_x * s_w) + bias.astype(jnp.float32)
            return y.astype(self.dtype)
        if self.mode != "int8":
            if self.mode == "calibrate":
                amax = self.variable(
                    "quant", "act_amax", lambda: jnp.zeros((), jnp.float32)
                )
                if not self.is_initializing():
                    amax.value = jnp.maximum(
                        amax.value, jnp.max(jnp.abs(x)).astype(jnp.float32)
                    )
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                kernel.astype(self.dtype),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                **conv_kwargs,
            )
            return y + bias.astype(self.dtype)

        # int8 path.  Scales are f32 regardless of compute dtype.
        amax = self.variable(
            "quant", "act_amax", lambda: jnp.zeros((), jnp.float32)
        )
        x_q, s_x = _quantize_activations(x, amax.value)
        w_q, s_w = _quantize_weights(kernel)
        y_i32 = jax.lax.conv_general_dilated(
            x_q,
            w_q,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
            **conv_kwargs,
        )
        y = y_i32.astype(jnp.float32) * (s_x * s_w) + bias.astype(jnp.float32)
        return y.astype(self.dtype)


class QuantConv(_QuantConvBase):
    """Conv with torch-Conv2d padding/stride semantics and an int8 path.

    Parameter names/shapes are identical to ``nn.Conv`` (HWIO ``kernel`` +
    ``bias``), so a trained float checkpoint loads unchanged; the ``quant``
    collection holds one scalar activation amax per conv.  ``mode='float'``
    is a plain conv (no quant variable at all — used by deploy-time graphs
    that are float-verified before quantization).
    """

    features: int
    kernel_size: int = 3
    padding: int = 1
    stride: int = 1
    mode: str = "calibrate"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, x.shape[-1], self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return self._run(
            x, kernel, bias,
            dict(
                window_strides=(self.stride, self.stride),
                padding=((self.padding, self.padding),) * 2,
            ),
        )


class QuantConvTranspose(_QuantConvBase):
    """torch ConvTranspose2d(k, s, p) semantics with an int8 path.

    Same fractionally-strided formulation as ``layers.TorchConvTranspose``
    (lhs_dilation + explicit ``k-1-p`` padding); the zeros lhs_dilation
    inserts are exact in the symmetric int8 domain, so quantization
    commutes with the dilation.
    """

    features: int
    kernel_size: int = 4
    stride: int = 2
    padding: int = 1
    mode: str = "calibrate"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k, s_, p = self.kernel_size, self.stride, self.padding
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, x.shape[-1], self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return self._run(
            x, kernel, bias,
            dict(
                window_strides=(1, 1),
                padding=((k - 1 - p, k - 1 - p),) * 2,
                lhs_dilation=(s_, s_),
            ),
        )


def quant_conv3x3(features: int, name: str, mode: str, dtype: Any) -> QuantConv:
    return QuantConv(
        features, kernel_size=3, padding=1, mode=mode, name=name, dtype=dtype
    )
