"""Pallas TPU kernel for the HBM-heavy half of belief-map peak extraction.

The decode pipeline splits naturally in two:

1. **map-sized work** (this kernel): Gaussian blur — two MXU matmuls against
   precomputed boundary-folded operators — then 4-neighbor local-max +
   threshold and peak scoring, fused in VMEM.  The XLA composite version
   (dream_tpu/ops/belief_maps.py) materializes the blurred map and four
   shifted copies; here each map is read once and only the scored map
   (-inf at non-peaks) and the peak count are written back.
2. **peak-sized work** (plain XLA): top-K selection over the scored map and
   5x5 subpixel refinement — tiny tensors where XLA's native top_k is
   already optimal (shared tail: belief_maps._subpixel_refine).

Semantics are identical to the composite path (same oracle tests against
numpy/scipy ports of reference dream/image_proc.py:913-1018).  A fully
fused single-kernel variant with in-kernel iterative top-K compiled
pathologically slowly in Mosaic (unrolled global-argmax chain), so this
split is the production configuration.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dream_tpu.ops.belief_maps import (
    DEFAULT_MAX_PEAKS,
    PEAK_BLUR_SIGMA,
    PEAK_THRESHOLD,
    _blur_operator,
    _subpixel_refine,
)


def _score_kernel(map_ref, th_ref, tw_ref, scored_ref, count_ref):
    m = map_ref[0]  # [H, W] unblurred map
    h, w = m.shape

    # Blur: T_h @ m @ T_w^T on the MXU.
    blurred = jnp.dot(
        jnp.dot(th_ref[:], m, preferred_element_type=jnp.float32),
        tw_ref[:].T,
        preferred_element_type=jnp.float32,
    )

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)

    # 4-neighbor comparisons with zero fill at the borders
    # (reference dream/image_proc.py:937-954).  pltpu.roll is circular with
    # non-negative shift; vacated rows/cols are masked to zero.
    up = jnp.where(row_ids >= 1, pltpu.roll(blurred, 1, axis=0), 0.0)
    down = jnp.where(row_ids < h - 1, pltpu.roll(blurred, h - 1, axis=0), 0.0)
    left = jnp.where(col_ids >= 1, pltpu.roll(blurred, 1, axis=1), 0.0)
    right = jnp.where(col_ids < w - 1, pltpu.roll(blurred, w - 1, axis=1), 0.0)
    peaks_mask = (
        (blurred >= up)
        & (blurred >= down)
        & (blurred >= left)
        & (blurred >= right)
        & (blurred > PEAK_THRESHOLD)
    )

    count_ref[0, 0, 0] = jnp.sum(peaks_mask.astype(jnp.int32))
    scored_ref[0] = jnp.where(peaks_mask, m, -jnp.inf)


@functools.partial(
    jax.jit, static_argnames=("max_peaks", "offset", "interpret")
)
def peaks_from_belief_maps_pallas(
    belief_maps,
    offset: float,
    max_peaks: int = DEFAULT_MAX_PEAKS,
    interpret: bool = False,
):
    """Fused-blur decode; same contract as belief_maps.peaks_from_belief_maps."""
    x = jnp.asarray(belief_maps, dtype=jnp.float32)
    batch_shape = x.shape[:-2]
    h, w = x.shape[-2], x.shape[-1]
    flat = x.reshape((-1, h, w))
    n = flat.shape[0]

    t_h = jnp.asarray(_blur_operator(h, float(PEAK_BLUR_SIGMA)))
    t_w = jnp.asarray(_blur_operator(w, float(PEAK_BLUR_SIGMA)))

    scored, count = pl.pallas_call(
        _score_kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, h, w), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, 1), jnp.int32),
        ],
        interpret=interpret,
    )(flat, t_h, t_w)
    count = count[:, 0, 0]

    # Peak-sized tail in plain XLA: top-K + subpixel refinement.
    coords, scores, _ = jax.vmap(
        lambda mp, sc: _subpixel_refine(mp, sc, offset, max_peaks)
    )(flat, scored)
    k_valid = jnp.arange(max_peaks)[None, :] < count[:, None]

    return {
        "coords": coords.reshape(batch_shape + (max_peaks, 2)),
        "scores": scores.reshape(batch_shape + (max_peaks,)),
        "valid": k_valid.reshape(batch_shape + (max_peaks,)),
        "count": count.reshape(batch_shape),
    }
