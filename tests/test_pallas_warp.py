"""Pallas augmentation-warp kernel vs the XLA gather formulation.

Interpret mode on CPU; the real-TPU path is exercised by scripts/tpu_smoke.py
and the training demo.  The kernel must match the gather path to float32
rounding: same taps and same hat weights, but the kernel evaluates source
coordinates in padded-plane space (+112), which costs ~2 mantissa bits in
the fractional weights — max observed |delta| ~5e-3 on the 0-255 scale
(~2e-5 relative), with bit-exactness on integer (identity) coordinates.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dream_tpu.data import augment
from dream_tpu.ops.pallas_warp import warp_batch_pallas


def _gather_warp_batch(images, affines):
    return jax.vmap(augment._warp_bilinear_reflect101)(
        images.astype(jnp.float32), affines
    )


def _affines(keys, h, w, cfg=None):
    cfg = cfg or augment.AugmentConfig(p_shift_scale_rotate=1.0)
    return jnp.stack(
        [augment._affine_matrix(k, h, w, cfg) for k in keys]
    )


@pytest.mark.parametrize("hw", [(64, 128), (120, 160)])
def test_warp_matches_gather_random_affines(hw):
    h, w = hw
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(3, h, w, 3).astype(np.float32) * 255.0)
    keys = jax.random.split(jax.random.PRNGKey(7), 3)
    affines = _affines(keys, h, w)

    ref = np.asarray(_gather_warp_batch(images, affines))
    # HIGHEST = exact-parity mode (f32 planes, 6-pass dot): float32-rounding
    # match with the gather path.
    out = np.asarray(
        warp_batch_pallas(images, affines, interpret=True,
                          precision="HIGHEST")
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-2)
    # DEFAULT = production mode: bf16 planes + one-pass dot.  Budget ~1.0
    # on the 0-255 scale (documented in pallas_warp.py; the GaussNoise
    # sigma 3-7 applied right after dwarfs it).
    out_d = np.asarray(warp_batch_pallas(images, affines, interpret=True))
    np.testing.assert_allclose(out_d, ref, atol=1.5)


def test_warp_identity_is_exact():
    rng = np.random.RandomState(1)
    images = jnp.asarray(rng.rand(2, 64, 128, 3).astype(np.float32) * 255.0)
    ident = jnp.broadcast_to(
        jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]), (2, 2, 3)
    )
    out = np.asarray(
        warp_batch_pallas(images, ident, interpret=True, precision="HIGHEST")
    )
    np.testing.assert_array_equal(out, np.asarray(images))
    # DEFAULT (bf16 planes) is exact too when the pixel VALUES are bf16-
    # representable (e.g. raw uint8-decoded frames).
    int_images = jnp.asarray(
        np.random.RandomState(9).randint(0, 256, (2, 64, 128, 3))
        .astype(np.float32)
    )
    out_i = np.asarray(warp_batch_pallas(int_images, ident, interpret=True))
    np.testing.assert_array_equal(out_i, np.asarray(int_images))


def test_warp_extreme_supported_affine():
    """Max rotation + max scale-down + max shift — the window-span bounds'
    worst case, including border reflection on every side."""
    h, w = 64, 128
    rng = np.random.RandomState(2)
    images = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32) * 255.0)

    angle = np.deg2rad(15.0)
    scale = 0.9  # scale-down -> inverse map magnifies -> widest source span
    cos, sin = np.cos(angle) * scale, np.sin(angle) * scale
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    dx, dy = 0.0625 * w, -0.0625 * h
    aff = jnp.asarray(
        [[[cos, sin, (1 - cos) * cx - sin * cy + dx],
          [-sin, cos, sin * cx + (1 - cos) * cy + dy]]],
        jnp.float32,
    )
    ref = np.asarray(_gather_warp_batch(images, aff))
    out = np.asarray(
        warp_batch_pallas(images, aff, interpret=True, precision="HIGHEST")
    )
    np.testing.assert_allclose(out, ref, atol=2e-2)


def test_warp_400x400_production_shape():
    """The production train-step shape (400x400x3)."""
    rng = np.random.RandomState(3)
    images = jnp.asarray(rng.rand(2, 400, 400, 3).astype(np.float32) * 255.0)
    keys = jax.random.split(jax.random.PRNGKey(11), 2)
    affines = _affines(keys, 400, 400)
    ref = np.asarray(_gather_warp_batch(images, affines))
    out = np.asarray(
        warp_batch_pallas(images, affines, interpret=True,
                          precision="HIGHEST")
    )
    np.testing.assert_allclose(out, ref, atol=2e-2)


def test_augment_batch_backend_equivalence():
    """augment_batch with the Pallas warp must reproduce the gather path:
    bit-identical keypoints (same PRNG draws) and float32-rounding-identical
    images."""
    rng = np.random.RandomState(4)
    images = jnp.asarray(rng.rand(4, 64, 128, 3).astype(np.float32) * 255.0)
    kps = jnp.asarray(rng.rand(4, 7, 2).astype(np.float32) * [[128.0, 64.0]])
    key = jax.random.PRNGKey(21)

    img_g, kp_g = augment.augment_batch(key, images, kps, warp_backend="gather")
    img_p, kp_p = augment.augment_batch(
        key, images, kps, warp_backend="pallas_interpret"
    )
    np.testing.assert_array_equal(np.asarray(kp_g), np.asarray(kp_p))
    # Production (DEFAULT) warp precision: bf16-plane budget on 0-255 scale.
    np.testing.assert_allclose(
        np.asarray(img_p), np.asarray(img_g), atol=1.5
    )
