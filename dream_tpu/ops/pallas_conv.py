"""Pallas TPU kernel: fused int8 3x3 conv + requantization epilogue.

Why this exists (profiled, scripts/profile_breakdown.py round 4): XLA's int8
convolutions run the vgg-Q stack at ~66% of the v5e's 394 int8 TOPS while
its bf16 convolutions reach ~78% of 197 TFLOP/s, so int8 realized only 1.68x
of its theoretical 2x over bf16 (0.534 vs 0.896 ms/frame model-only).  The
requant chains are already fused (compiled bytes: int8 162.8 MB/frame < bf16
241.7) and epilogue op-count permutations are fusion noise — the in-conv MXU
efficiency is the cap.  This kernel owns the whole conv: int8 taps on the
MXU (int32 accumulation), the folded dequant+bias+ReLU+requant epilogue on
the VPU in the same pass, int8 in -> int8 out, so activations between convs
live in HBM as 1-byte tensors and never round-trip through a wider dtype.

Replaces the implicit-native conv layer of the reference (PyTorch cuDNN
fp32 convs, reference dream/models.py:557-827) for the int8 deployment
path; the reference has no quantization story at all.

## Data layout

Activations ride between convs in a shared padded layout ``[B, H+3, WP, C]``
int8 (``WP = 8*ceil((W+9)/8)``):

- rows 0,1 and H+2 are zeros (top halo gets 2 rows so every tap offset into
  the flattened band is non-negative; bottom halo 1);
- cols [8, W+8) hold the image (8-col left halo keeps every block aligned to
  the (sublane=8, lane=128) tile grid); cols 0-7 and [W+8, WP) are zeros.

A 3x3 same-pad conv on this layout is 9 matmuls over sublane-shifted slices
of the row-band flattened to ``[(R+4)*WP, Ci]``: output (row q, col p) of a
band starting at padded row rb reads flat index ``i + (dy+2)*WP + dx`` for
``i = (q-rb-2)*WP + p`` and taps ``dy, dx in {-1,0,1}`` — all offsets >= 0,
so each tap is one static slice + one MXU ``int8 @ int8 -> int32``.
Wrap-around taps only ever land in masked pad columns.

## Pipeline

Grid is ``(B,)``; activations stay in HBM (``memory_space=ANY``) and the
kernel double-buffers row bands through VMEM with manual async DMA:
band i+1 streams in while band i computes, and finished bands stream out —
VMEM holds just 2 input bands + 2 output bands + the (resident) weights.

The epilogue computes ``q = clip(round(relu(acc * k[c] + b[c])), lo, 127)``
with ``k = s_x * s_w / s_out`` and ``b = bias / s_out`` folded on the host
side, where ``s_out`` is the NEXT conv's calibrated activation scale — so
the emitted int8 is exactly the next conv's expected input and no
quantize/dequantize pass exists anywhere between convs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAD_TOP = 2
PAD_BOTTOM = 1
PAD_LEFT = 8
# Per-band f32 accumulator budget (bytes): R = floor(budget / (WP*Co*4)).
_ACC_BUDGET = 600_000


def padded_width(w: int) -> int:
    """Lane-aligned padded width: left halo 8, right halo >= 1, %8 == 0."""
    return 8 * (-(-(w + PAD_LEFT + 1) // 8))


def pad_activation(x: jax.Array) -> jax.Array:
    """[B, H, W, C] int8 -> [B, H+3, WP, C] in the kernel's halo layout."""
    b, h, w, c = x.shape
    wp = padded_width(w)
    return jnp.pad(
        x,
        ((0, 0), (PAD_TOP, PAD_BOTTOM), (PAD_LEFT, wp - w - PAD_LEFT), (0, 0)),
    )


def unpad_activation(xp: jax.Array, h: int, w: int) -> jax.Array:
    """Inverse of :func:`pad_activation`."""
    return xp[:, PAD_TOP : PAD_TOP + h, PAD_LEFT : PAD_LEFT + w, :]


def pack_weights(w_q: jax.Array) -> jax.Array:
    """HWIO int8 [3, 3, Ci, Co] -> [9*Ci, Co] in (dy, dx, ci) tap order."""
    kh, kw, ci, co = w_q.shape
    assert (kh, kw) == (3, 3), (kh, kw)
    return w_q.reshape(9 * ci, co)


def band_rows(h: int, wp: int, co: int) -> int:
    """Output rows per band, sized to the accumulator budget."""
    return max(1, min(h, _ACC_BUDGET // (wp * co * 4)))


def _conv_kernel(x_ref, w_ref, kb_ref, out_ref, xband, oband, zbuf,
                 in_sems, out_sems, zsem, *, h, w, wp, ci, co, r, relu):
    bi = pl.program_id(0)
    nb = pl.cdiv(h, r)
    m = r * wp

    # Zero the halo rows of this image's output (top 2, bottom 1).
    zbuf[...] = jnp.zeros_like(zbuf)
    ztop = pltpu.make_async_copy(
        zbuf.at[0:2], out_ref.at[bi, 0:2], zsem
    )
    ztop.start()
    ztop.wait()
    zbot = pltpu.make_async_copy(
        zbuf.at[0:1], out_ref.at[bi, h + 2 : h + 3], zsem
    )
    zbot.start()
    zbot.wait()

    def band_start(i):
        return jnp.minimum(i * r, h - r)

    def in_copy(i, slot):
        return pltpu.make_async_copy(
            x_ref.at[bi, pl.ds(band_start(i), r + 3)],
            xband.at[slot, 0 : r + 3],
            in_sems.at[slot],
        )

    def out_copy(i, slot):
        return pltpu.make_async_copy(
            oband.at[slot],
            out_ref.at[bi, pl.ds(band_start(i) + 2, r)],
            out_sems.at[slot],
        )

    in_copy(0, 0).start()

    # Valid-column mask in flat [m, 1] form (pad cols emit zeros so the
    # halo columns the NEXT conv reads stay zero).
    colp = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0) % wp
    colmask = (colp >= PAD_LEFT) & (colp < PAD_LEFT + w)

    def body(i, _):
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < nb)
        def _():
            in_copy(i + 1, 1 - slot).start()

        in_copy(i, slot).wait()

        # Reuse of this output slot: wait for the DMA issued 2 bands ago.
        @pl.when(i >= 2)
        def _():
            out_copy(i - 2, slot).wait()

        xf = xband[slot].reshape((r + 4) * wp, ci)
        acc = jnp.zeros((m, co), jnp.int32)
        for dy in range(3):
            for dx in range(-1, 2):
                o = (dy + 1) * wp + dx
                t = dy * 3 + (dx + 1)
                acc += jax.lax.dot_general(
                    xf[o : o + m],
                    w_ref[t * ci : (t + 1) * ci, :],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
        y = acc.astype(jnp.float32) * kb_ref[0:1, :] + kb_ref[1:2, :]
        if relu:
            y = jnp.maximum(y, 0.0)
            lo = 0.0
        else:
            lo = -127.0
        q = jnp.clip(jnp.round(y), lo, 127.0)
        q = jnp.where(colmask, q, 0.0).astype(jnp.int8)
        oband[slot] = q.reshape(r, wp, co)
        out_copy(i, slot).start()
        return 0

    jax.lax.fori_loop(0, nb, body, 0)

    @pl.when(nb >= 2)
    def _():
        out_copy(nb - 2, jax.lax.rem(nb, 2)).wait()

    out_copy(nb - 1, jax.lax.rem(nb - 1, 2)).wait()


@functools.partial(
    jax.jit, static_argnames=("h", "w", "relu", "interpret")
)
def conv3x3_int8(xp, w9, k, b, *, h, w, relu=True, interpret=False):
    """Fused int8 3x3 same-pad conv + requant on the halo layout.

    Args:
      xp: ``[B, H+3, WP, Ci]`` int8 activation in :func:`pad_activation`
        layout.
      w9: ``[9*Ci, Co]`` int8 packed weights (:func:`pack_weights`).
      k: ``[Co]`` f32 folded scale ``s_x * s_w / s_out``.
      b: ``[Co]`` f32 folded bias ``bias / s_out``.
      h, w: static valid image height/width.
      relu: fold a ReLU before requantization (clip floor 0 instead of -127).

    Returns ``[B, H+3, WP, Co]`` int8 in the same layout (halo rows/cols
    zeroed), directly consumable by the next ``conv3x3_int8``.
    """
    bsz, hp, wp, ci = xp.shape
    assert hp == h + PAD_TOP + PAD_BOTTOM and wp == padded_width(w), (
        xp.shape, h, w)
    co = w9.shape[-1]
    assert w9.shape == (9 * ci, co), (w9.shape, ci, co)
    r = band_rows(h, wp, co)
    kb = jnp.stack([k.astype(jnp.float32), b.astype(jnp.float32)])  # [2, Co]

    return pl.pallas_call(
        functools.partial(
            _conv_kernel, h=h, w=w, wp=wp, ci=ci, co=co, r=r, relu=relu
        ),
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # packed weights resident
            pl.BlockSpec(memory_space=pltpu.VMEM),  # [2, Co] scale/bias
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((bsz, hp, wp, co), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((2, r + 4, wp, ci), jnp.int8),   # input bands
            pltpu.VMEM((2, r, wp, co), jnp.int8),       # output bands
            pltpu.VMEM((2, wp, co), jnp.int8),          # zero halo rows
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, w9, kb)


def conv3x3_int8_reference(x_q, w_q, k, b, relu=True):
    """Plain-XLA oracle for :func:`conv3x3_int8` (unpadded layout).

    ``x_q``: [B, H, W, Ci] int8; ``w_q``: [3, 3, Ci, Co] int8.  Same
    epilogue math (round-half-even on f32), returns [B, H, W, Co] int8.
    """
    y = jax.lax.conv_general_dilated(
        x_q, w_q, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    yf = y.astype(jnp.float32) * k + b
    lo = 0.0
    if relu:
        yf = jnp.maximum(yf, 0.0)
    else:
        lo = -127.0
    return jnp.clip(jnp.round(yf), lo, 127.0).astype(jnp.int8)
