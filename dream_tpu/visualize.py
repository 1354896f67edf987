"""Host-side visualization: keypoint overlays, belief-map colormaps, mosaics.

Parity with the reference's visualization helpers
(reference dream/image_proc.py:462-863).  Visualization is host work by
design (not perf-critical); device arrays are pulled back only here.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence

import numpy as np
from PIL import Image as PILImage

_NAMED_COLORS = {
    "red": (255, 0, 0),
    "green": (0, 128, 0),
    "blue": (0, 0, 255),
    "white": (255, 255, 255),
    "black": (0, 0, 0),
    "yellow": (255, 255, 0),
    "cyan": (0, 255, 255),
    "magenta": (255, 0, 255),
    "orange": (255, 165, 0),
}


def _to_rgb(color) -> tuple:
    if isinstance(color, str):
        if color in _NAMED_COLORS:
            return _NAMED_COLORS[color]
        import webcolors

        c = webcolors.name_to_rgb(color)
        return (c.red, c.green, c.blue)
    return tuple(color)


def image_from_tensor(net_input_array, normalization: Optional[dict] = None):
    """Net-input array -> PIL image (reference dream/image_proc.py:596-609).

    ``net_input_array``: ``[H, W, 3]`` float array (NHWC, the TPU-native
    layout — the reference's is a CHW torch tensor).  With ``normalization``
    (``{"mean": [...], "stdev": [...]}``) the normalization is inverted
    first; otherwise values are assumed to already be in [0, 1].
    """
    arr = np.asarray(net_input_array, dtype=np.float32)
    assert arr.ndim == 3 and arr.shape[-1] == 3, (
        f"Expected [H, W, 3] net-input array, got shape {arr.shape}."
    )
    if normalization is not None:
        arr = arr * np.asarray(normalization["stdev"]) + np.asarray(
            normalization["mean"]
        )
    return PILImage.fromarray(
        np.uint8(np.clip(np.rint(arr * 255.0), 0.0, 255.0))
    )


def images_from_tensor(net_input_batch, normalization: Optional[dict] = None):
    """Batch version (reference dream/image_proc.py:611-631): ``[B, H, W, 3]``
    -> list of PIL images."""
    batch = np.asarray(net_input_batch)
    assert batch.ndim == 4, (
        f"Expected [B, H, W, 3] net-input batch, got shape {batch.shape}."
    )
    return [image_from_tensor(a, normalization) for a in batch]


def overlay_points_on_image(
    image_input,
    image_points,
    image_point_names: Optional[Sequence[str]] = None,
    annotation_color_dot="red",
    annotation_color_text="red",
    point_diameter: float = 6.0,
    point_thickness: int = -1,
):
    """Subpixel circle overlays (reference dream/image_proc.py:462-593).

    Skips sentinel/None points; returns a new PIL image.
    """
    import cv2

    if isinstance(image_input, str):
        image = PILImage.open(image_input).convert("RGB")
    elif isinstance(image_input, np.ndarray):
        image = PILImage.fromarray(image_input.astype(np.uint8))
    else:
        assert isinstance(image_input, PILImage.Image)
        image = image_input

    if image_points is None or len(image_points) == 0:
        return image

    n_points = len(image_points)
    if image_point_names:
        assert n_points == len(image_point_names)

    dot_colors = (
        [annotation_color_dot] * n_points
        if isinstance(annotation_color_dot, str)
        else list(annotation_color_dot)
    )
    text_colors = (
        [annotation_color_text] * n_points
        if isinstance(annotation_color_text, str)
        else list(annotation_color_text)
    )
    diameters = (
        [point_diameter] * n_points
        if isinstance(point_diameter, (int, float))
        else list(point_diameter)
    )

    drawn = np.array(image).copy()
    shift = 4
    factor = 1 << shift

    for idx in range(n_points):
        point = image_points[idx]
        if point is None or len(point) == 0:
            continue
        # Skip no-detection sentinels (scaled or raw).
        if point[0] < -999.0 or point[1] < -999.0 or not np.all(np.isfinite(point)):
            continue
        pt = (int(point[0] * factor), int(point[1] * factor))
        radius = int(diameters[idx] / 2.0 * factor)
        drawn = cv2.circle(
            drawn, pt, radius, _to_rgb(dot_colors[idx]),
            thickness=int(point_thickness), shift=shift,
        )
        if image_point_names:
            cv2.putText(
                drawn, image_point_names[idx],
                (int(point[0]) + 10, int(point[1])),
                cv2.FONT_HERSHEY_SIMPLEX, 0.75, _to_rgb(text_colors[idx]), 2,
            )
    return PILImage.fromarray(drawn)


def image_from_belief_map(
    belief_map, normalize=True, colormap="inferno", normalization_method=6
):
    """Colormapped belief-map image (reference dream/image_proc.py:634-723).

    Accepts a [H, W] array (jax or numpy).  Implements normalization methods
    0-6; default 6 = clamp to [0, 1].
    """
    import matplotlib.pyplot as plt

    bm = np.asarray(belief_map, dtype=np.float32)
    if bm.ndim == 3:
        assert bm.shape[0] == 1
        bm = bm[0]
    assert bm.ndim == 2

    if normalize:
        if normalization_method == 0:
            bm = bm - bm.min()
            bm = bm / (bm.max() + 1e-12)
        elif normalization_method == 1:
            bm = np.clip(bm, 0.0, bm.max())
            bm = bm / (bm.max() + 1e-12)
        elif normalization_method == 2:
            bm = bm - np.median(bm)
            bm = np.clip(bm, 0.0, bm.max())
            bm = bm / (bm.max() + 1e-12)
        elif normalization_method == 3:
            bm = bm - np.percentile(bm, 25)
            bm = np.clip(bm, 0.0, bm.max())
            bm = bm / (bm.max() + 1e-12)
        elif normalization_method == 4:
            bm = bm - np.percentile(bm, 75)
            bm = np.clip(bm, 0.0, bm.max())
            bm = bm / (bm.max() + 1e-12)
        elif normalization_method == 5:
            bm = np.clip(bm, 0.0, bm.max())
        elif normalization_method == 6:
            bm = np.clip(bm, 0.0, 1.0)
        else:
            raise AssertionError("Normalization method not defined.")

    if colormap:
        cmap = plt.get_cmap(colormap)
        rgba = cmap(bm)
        return PILImage.fromarray(np.uint8(255 * rgba[..., :3]))
    return PILImage.fromarray(np.uint8(255 * bm))


def images_from_belief_maps(belief_maps, **kwargs) -> List[PILImage.Image]:
    bm = np.asarray(belief_maps)
    assert bm.ndim == 3
    return [image_from_belief_map(m, **kwargs) for m in bm]


def mosaic_images(
    image_array_input,
    rows: Optional[int] = None,
    cols: Optional[int] = None,
    outer_padding_px: int = 0,
    inner_padding_px: int = 0,
    fill_color_rgb=(255, 255, 255),
) -> PILImage.Image:
    """Grid mosaic (reference dream/image_proc.py:752-863)."""
    assert image_array_input and not isinstance(image_array_input, str)
    if isinstance(image_array_input[0], str):
        images = [PILImage.open(p).convert("RGB") for p in image_array_input]
    else:
        images = list(image_array_input)

    n = len(images)
    w, h = images[0].size
    for im in images:
        assert im.size == (w, h), "All images must have the same resolution."

    assert rows or cols
    if not rows:
        rows = int(math.ceil(float(n) / float(cols)))
    if not cols:
        cols = int(math.ceil(float(n) / float(rows)))
    assert rows * cols >= n

    mosaic = PILImage.new(
        "RGB",
        (
            cols * w + 2 * outer_padding_px + (cols - 1) * inner_padding_px,
            rows * h + 2 * outer_padding_px + (rows - 1) * inner_padding_px,
        ),
        tuple(fill_color_rgb),
    )
    idx = 0
    for r in range(rows):
        for c in range(cols):
            if idx < n:
                mosaic.paste(
                    images[idx],
                    (
                        c * w + outer_padding_px + c * inner_padding_px,
                        r * h + outer_padding_px + r * inner_padding_px,
                    ),
                )
                idx += 1
    return mosaic


def overlay_pose_triad(
    image,
    camera_K,
    translation,
    quaternion_xyzw,
    axis_length_m: float = 0.1,
    thickness: int = 3,
):
    """Draw the recovered robot-base coordinate triad on the camera image.

    Projects the base-frame origin and axis endpoints through the
    camera-from-robot pose and draws RGB axis lines — the reference ROS
    node's keypoint_frame_overlay output (reference
    scripts/launch_dream_ros.py:498-626).
    """
    import cv2

    from dream_tpu.ops import geometric_vision as gv
    import jax.numpy as jnp

    if isinstance(image, np.ndarray):
        image = PILImage.fromarray(image.astype(np.uint8))
    R = np.asarray(gv.rotation_matrix_from_quaternion(jnp.asarray(quaternion_xyzw)))
    t = np.asarray(translation)
    K = np.asarray(camera_K)

    points_robot = np.array(
        [
            [0.0, 0.0, 0.0],
            [axis_length_m, 0.0, 0.0],
            [0.0, axis_length_m, 0.0],
            [0.0, 0.0, axis_length_m],
        ]
    )
    points_cam = points_robot @ R.T + t
    if np.any(points_cam[:, 2] <= 1e-6):
        return image  # behind the camera; skip like the reference's TF guard
    proj = points_cam @ K.T
    proj = proj[:, :2] / proj[:, 2:3]

    drawn = np.array(image).copy()
    origin = tuple(int(v) for v in proj[0])
    for axis_end, color in zip(
        proj[1:], [(255, 0, 0), (0, 255, 0), (0, 0, 255)]
    ):
        cv2.line(
            drawn, origin, tuple(int(v) for v in axis_end), color, thickness
        )
    return PILImage.fromarray(drawn)


def blend_belief_overlay(
    image: PILImage.Image, belief_map, alpha: float = 0.5, **kwargs
) -> PILImage.Image:
    """Upscaled belief-map blend over an RGB image (reference
    dream/datasets.py:257-262 pattern)."""
    bm_img = image_from_belief_map(belief_map, **kwargs).resize(
        image.size, resample=PILImage.BILINEAR
    )
    return PILImage.blend(image.convert("RGB"), bm_img, alpha=alpha)
