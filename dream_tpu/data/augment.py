"""On-device data augmentation with keypoint tracking.

TPU-native replacement for the reference's per-sample host-side
albumentations pipeline (reference dream/datasets.py:143-159: GaussNoise,
RandomBrightnessContrast(brightness_by_max=False), ShiftScaleRotate
(rotate_limit=15), keypoints tracked, remove_invisible=False).  Each
augmentation is a batched jnp transform driven by an explicit jax PRNG key,
so augmentation runs inside the jitted train step, is deterministic under the
training seed, and never blocks the input pipeline.

Parameter defaults mirror albumentations' defaults at the reference's pin:
- GaussNoise: var_limit (10, 50) on the 0-255 scale, p=0.5
- RandomBrightnessContrast: +/-0.2 brightness (relative to image mean) and
  contrast, p=0.5
- ShiftScaleRotate: shift +/-6.25%, scale +/-10%, rotate +/-15deg,
  bilinear resample with reflect-101 border, p=0.5
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class AugmentConfig(NamedTuple):
    gauss_noise_var_limit: Tuple[float, float] = (10.0, 50.0)
    brightness_limit: float = 0.2
    contrast_limit: float = 0.2
    shift_limit: float = 0.0625
    scale_limit: float = 0.1
    rotate_limit_deg: float = 15.0
    p_noise: float = 0.5
    p_brightness_contrast: float = 0.5
    p_shift_scale_rotate: float = 0.5


DEFAULT_AUGMENT = AugmentConfig()


def _gauss_noise(key, image, cfg: AugmentConfig):
    k_apply, k_var, k_noise = jax.random.split(key, 3)
    var = jax.random.uniform(
        k_var, (), minval=cfg.gauss_noise_var_limit[0],
        maxval=cfg.gauss_noise_var_limit[1],
    )
    noise = jax.random.normal(k_noise, image.shape) * jnp.sqrt(var)
    apply = jax.random.bernoulli(k_apply, cfg.p_noise)
    return jnp.where(apply, image + noise, image)


def _brightness_contrast(key, image, cfg: AugmentConfig):
    k_apply, k_b, k_c = jax.random.split(key, 3)
    alpha = 1.0 + jax.random.uniform(
        k_c, (), minval=-cfg.contrast_limit, maxval=cfg.contrast_limit
    )
    beta = jax.random.uniform(
        k_b, (), minval=-cfg.brightness_limit, maxval=cfg.brightness_limit
    )
    mean = jnp.mean(image)
    # brightness_by_max=False: beta scales the image mean (albumentations).
    out = image * alpha + beta * mean
    apply = jax.random.bernoulli(k_apply, cfg.p_brightness_contrast)
    return jnp.where(apply, out, image)


def _affine_matrix(key, height, width, cfg: AugmentConfig):
    """2x3 forward affine (output<-input coords handled by inverse warp)."""
    k_apply, k_ang, k_sc, k_dx, k_dy = jax.random.split(key, 5)
    angle = jax.random.uniform(
        k_ang, (), minval=-cfg.rotate_limit_deg, maxval=cfg.rotate_limit_deg
    ) * (jnp.pi / 180.0)
    scale = 1.0 + jax.random.uniform(
        k_sc, (), minval=-cfg.scale_limit, maxval=cfg.scale_limit
    )
    dx = jax.random.uniform(k_dx, (), minval=-cfg.shift_limit, maxval=cfg.shift_limit) * width
    dy = jax.random.uniform(k_dy, (), minval=-cfg.shift_limit, maxval=cfg.shift_limit) * height

    apply = jax.random.bernoulli(k_apply, cfg.p_shift_scale_rotate)
    angle = jnp.where(apply, angle, 0.0)
    scale = jnp.where(apply, scale, 1.0)
    dx = jnp.where(apply, dx, 0.0)
    dy = jnp.where(apply, dy, 0.0)

    cx, cy = (width - 1) / 2.0, (height - 1) / 2.0
    cos, sin = jnp.cos(angle) * scale, jnp.sin(angle) * scale
    # Rotation about center + translation (cv2.getRotationMatrix2D convention).
    a = jnp.array(
        [
            [cos, sin, (1 - cos) * cx - sin * cy + dx],
            [-sin, cos, sin * cx + (1 - cos) * cy + dy],
        ]
    )
    return a


def _reflect101(x, n):
    """Fold a continuous coordinate into [0, n-1] with reflect-101 borders
    (cv2.BORDER_REFLECT_101 / scipy 'mirror')."""
    m = 2.0 * (n - 1)
    x = jnp.abs(jnp.mod(x, m))
    return jnp.where(x > (n - 1), m - x, x)


def _warp_bilinear_reflect101(image, affine):
    """Inverse-warp an [H, W, C] image by a forward 2x3 affine.

    TPU-native bilinear sampling: ONE ``lax.gather`` of a [2, 2, C] window
    per output pixel (all four taps in a single indexed fetch), then the
    bilinear combine on the VPU.  XLA's TPU gather cost is dominated by the
    index count, so fetching the 2x2 window per index instead of four
    separate flat ``jnp.take`` taps is ~1.45x faster (measured 180 -> 124 ms
    per 32x400x400x3 batch on v5e) and bit-exact against the 4-tap
    formulation.  ``jax.scipy.ndimage.map_coordinates`` lowers to per-element
    gathers that run ~4000x slower on TPU — measured 40 s vs 10 ms per
    8x400x400 batch.
    """
    h, w, c = image.shape
    A = jnp.concatenate([affine, jnp.array([[0.0, 0.0, 1.0]])], axis=0)
    Ainv = jnp.linalg.inv(A)
    ys, xs = jnp.mgrid[0:h, 0:w]
    src_x = Ainv[0, 0] * xs + Ainv[0, 1] * ys + Ainv[0, 2]
    src_y = Ainv[1, 0] * xs + Ainv[1, 1] * ys + Ainv[1, 2]
    src_x = _reflect101(src_x, w)
    src_y = _reflect101(src_y, h)

    x0 = jnp.clip(jnp.floor(src_x).astype(jnp.int32), 0, w - 2)
    y0 = jnp.clip(jnp.floor(src_y).astype(jnp.int32), 0, h - 2)
    tx = jnp.clip(src_x - x0, 0.0, 1.0)[..., None]
    ty = jnp.clip(src_y - y0, 0.0, 1.0)[..., None]

    starts = jnp.stack([y0.reshape(-1), x0.reshape(-1)], axis=-1)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(), start_index_map=(0, 1)
    )
    windows = jax.lax.gather(
        image, starts, dn, slice_sizes=(2, 2, c)
    )  # [h*w, 2, 2, C]
    v00 = windows[:, 0, 0].reshape(h, w, c)
    v01 = windows[:, 0, 1].reshape(h, w, c)
    v10 = windows[:, 1, 0].reshape(h, w, c)
    v11 = windows[:, 1, 1].reshape(h, w, c)
    return (
        v00 * (1 - tx) * (1 - ty)
        + v01 * tx * (1 - ty)
        + v10 * (1 - tx) * ty
        + v11 * tx * ty
    )


def _transform_keypoints(keypoints, affine):
    kp_h = jnp.concatenate(
        [keypoints, jnp.ones(keypoints.shape[:-1] + (1,))], axis=-1
    )
    return kp_h @ affine.T


def augment_sample(key, image, keypoints, cfg: AugmentConfig = DEFAULT_AUGMENT):
    """Augment one [H, W, C] 0-255 image + [n_kp, 2] pixel keypoints."""
    k_noise, k_bc, k_aff = jax.random.split(key, 3)
    h, w = image.shape[0], image.shape[1]
    affine = _affine_matrix(k_aff, h, w, cfg)
    image = _warp_bilinear_reflect101(image.astype(jnp.float32), affine)
    keypoints = _transform_keypoints(keypoints, affine)
    image = _brightness_contrast(k_bc, image, cfg)
    image = _gauss_noise(k_noise, image, cfg)
    return jnp.clip(image, 0.0, 255.0), keypoints


def augment_batch(
    key,
    images,
    keypoints,
    cfg: AugmentConfig = DEFAULT_AUGMENT,
    warp_backend: str = "auto",
):
    """Batched :func:`augment_sample`.

    ``warp_backend`` selects the bilinear-warp implementation:

    - ``"auto"``: the Pallas MXU kernel (ops/pallas_warp.py) on TPU when the
      shape qualifies, else the vmapped XLA gather path — the kernel turns
      the gather-bound warp (~110 ms of a 246 ms b=32x400x400 train step)
      into MXU one-hot contractions;
    - ``"gather"`` / ``"pallas"`` / ``"pallas_interpret"``: forced choice
      (interpret = CPU-testable kernel execution).

    Both paths consume identical PRNG splits, so the sampled augmentation
    parameters (and the keypoint transform) are bit-identical across
    backends; warped images agree to <= ~1/255 at the production MXU
    precision (DEFAULT — within the reference pipeline's own uint8
    augmentation rounding) and to float32 rounding at precision="HIGHEST"
    (tests/test_pallas_warp.py; see ops/pallas_warp.py module comment).
    """
    n = images.shape[0]
    h, w = images.shape[1], images.shape[2]
    keys = jax.random.split(key, n)

    if warp_backend == "auto":
        warp_backend = (
            "pallas"
            if jax.default_backend() == "tpu" and h % 8 == 0
            else "gather"
        )

    if warp_backend == "gather":
        return jax.vmap(lambda k, im, kp: augment_sample(k, im, kp, cfg))(
            keys, images, keypoints
        )

    assert warp_backend in ("pallas", "pallas_interpret"), warp_backend
    from dream_tpu.ops.pallas_warp import warp_batch_pallas

    # Same per-sample split structure as augment_sample so parameter draws
    # are bit-identical regardless of backend.
    k3 = jax.vmap(lambda k: jax.random.split(k, 3))(keys)  # [n, 3, 2]
    k_noise, k_bc, k_aff = k3[:, 0], k3[:, 1], k3[:, 2]
    affines = jax.vmap(lambda k: _affine_matrix(k, h, w, cfg))(k_aff)
    images = warp_batch_pallas(
        images.astype(jnp.float32), affines,
        interpret=(warp_backend == "pallas_interpret"),
    )
    keypoints = jax.vmap(_transform_keypoints)(keypoints, affines)
    images = jax.vmap(lambda k, im: _brightness_contrast(k, im, cfg))(
        k_bc, images
    )
    images = jax.vmap(lambda k, im: _gauss_noise(k, im, cfg))(k_noise, images)
    return jnp.clip(images, 0.0, 255.0), keypoints
