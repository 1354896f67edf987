"""Synthetic NDDS dataset generator.

Writes a real on-disk NDDS-format dataset (digit-prefixed ``NNNNNN.json`` +
``NNNNNN.rgb.png`` + ``_camera_settings.json`` / ``_object_settings.json``,
the exact contract parsed by dream_tpu.utils.ndds and the reference's
dream/utilities.py:67-232) containing a stick-figure "manipulator": a chain
of 3D keypoints posed rigidly with a random camera transform and rendered as
anti-aliased disks and limb segments over a textured background.

This replaces the reference's gdown-downloaded datasets (reference
data/DOWNLOAD.sh) for testing, benchmarking, and end-to-end training demos in
egress-free environments: a model trained on this data must drive detection
metrics toward perfect PCK on held-out synthetic frames, exercising the whole
train->eval->PnP pipeline.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence, Tuple

import numpy as np

DEFAULT_KEYPOINT_NAMES = [
    "panda_link0",
    "panda_link2",
    "panda_link3",
    "panda_link4",
    "panda_link6",
    "panda_link7",
    "panda_hand",
]

# A fixed, panda-arm-like kinematic chain in the robot base frame (meters).
_CANONICAL_CHAIN = np.array(
    [
        [0.00, 0.00, 0.05],
        [0.00, 0.00, 0.35],
        [0.08, 0.00, 0.55],
        [0.20, 0.05, 0.70],
        [0.35, 0.10, 0.72],
        [0.45, 0.12, 0.65],
        [0.52, 0.15, 0.55],
    ]
)


def _rotation_matrix(rng: np.random.RandomState) -> np.ndarray:
    axis = rng.randn(3)
    axis /= np.linalg.norm(axis)
    angle = rng.uniform(0.0, 2.0 * np.pi)
    K = np.array(
        [
            [0, -axis[2], axis[1]],
            [axis[2], 0, -axis[0]],
            [-axis[1], axis[0], 0],
        ]
    )
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * (K @ K)


def _render_frame(
    resolution: Tuple[int, int],
    kp_projs: np.ndarray,
    depths: np.ndarray,
    rng: np.random.RandomState,
) -> np.ndarray:
    """Vectorized stick-figure render: background + limbs + keypoint disks."""
    w, h = resolution
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)

    # Smooth random background (low-frequency gradients + noise).
    gx, gy = rng.uniform(-1, 1, 2)
    base = rng.uniform(40, 180, size=3)
    img = np.empty((h, w, 3), dtype=np.float32)
    grad = (gx * xx / w + gy * yy / h) * rng.uniform(20, 60)
    for c in range(3):
        img[..., c] = base[c] + grad
    img += rng.randn(h, w, 3) * rng.uniform(2.0, 8.0)

    # Limb segments: distance-to-segment field, vectorized over pixels.
    limb_color = np.array([200.0, 200.0, 210.0]) + rng.randn(3) * 10
    for a, b in zip(kp_projs[:-1], kp_projs[1:]):
        ab = b - a
        denom = float(ab @ ab) + 1e-9
        t = ((xx - a[0]) * ab[0] + (yy - a[1]) * ab[1]) / denom
        t = np.clip(t, 0.0, 1.0)
        dx = xx - (a[0] + t * ab[0])
        dy = yy - (a[1] + t * ab[1])
        dist2 = dx * dx + dy * dy
        radius = 4.0
        alpha = np.clip(radius + 1.0 - np.sqrt(dist2), 0.0, 1.0)[..., None]
        img = img * (1 - alpha) + limb_color * alpha

    # Keypoint disks, radius shrinking with depth, distinct colors.
    palette = np.array(
        [
            [230, 60, 60],
            [60, 200, 60],
            [70, 90, 230],
            [230, 200, 50],
            [200, 60, 220],
            [50, 210, 210],
            [240, 140, 40],
            [150, 150, 240],
        ],
        dtype=np.float32,
    )
    for i, (p, z) in enumerate(zip(kp_projs, depths)):
        radius = np.clip(14.0 / max(z, 0.3), 3.0, 18.0)
        dist = np.sqrt((xx - p[0]) ** 2 + (yy - p[1]) ** 2)
        alpha = np.clip(radius + 1.0 - dist, 0.0, 1.0)[..., None]
        img = img * (1 - alpha) + palette[i % len(palette)] * alpha

    return np.clip(img, 0, 255).astype(np.uint8)


def render_random_scene(
    rng: np.random.RandomState,
    image_resolution: Tuple[int, int] = (640, 480),
    n_keypoints: int = 7,
    out_of_frame: bool = False,
):
    """Render one random synthetic scene in memory.

    Returns ``(image_u8 [H,W,3], kp_projs [n,2], positions_wrt_cam [n,3])`` —
    the same statistics ``generate_synthetic_ndds`` writes to disk, for
    callers that stream frames (e.g. encoder self-pretraining,
    scripts/pretrain_encoder.py) instead of materializing a dataset.
    """
    w, h = image_resolution
    fx = fy = 0.96 * w
    K = np.array([[fx, 0, w / 2.0], [0, fy, h / 2.0], [0, 0, 1.0]])
    chain = _CANONICAL_CHAIN[:n_keypoints]
    R = _rotation_matrix(rng)
    if out_of_frame:
        t = np.array(
            [rng.uniform(0.5, 0.9), rng.uniform(-0.1, 0.1), rng.uniform(1.0, 1.6)]
        )
    else:
        t = np.array(
            [rng.uniform(-0.25, 0.25), rng.uniform(-0.2, 0.2), rng.uniform(1.2, 2.6)]
        )
    centered = chain - chain.mean(axis=0)
    Xc = centered @ R.T + t
    proj = Xc @ K.T
    kp_projs = proj[:, :2] / proj[:, 2:3]
    img = _render_frame(image_resolution, kp_projs, Xc[:, 2], rng)
    return img, kp_projs, Xc


def generate_synthetic_ndds(
    output_dir: str,
    n_frames: int = 32,
    image_resolution: Tuple[int, int] = (640, 480),
    keypoint_names: Optional[Sequence[str]] = None,
    object_class: str = "panda",
    seed: int = 0,
    out_of_frame_fraction: float = 0.1,
    image_extension: str = "png",
) -> str:
    """Write a synthetic NDDS dataset and return its path."""
    from PIL import Image

    os.makedirs(output_dir, exist_ok=True)
    keypoint_names = list(keypoint_names or DEFAULT_KEYPOINT_NAMES)
    n_kp = len(keypoint_names)
    chain = _CANONICAL_CHAIN[:n_kp] if n_kp <= len(_CANONICAL_CHAIN) else np.concatenate(
        [_CANONICAL_CHAIN,
         _CANONICAL_CHAIN[-1] + np.cumsum(np.full((n_kp - len(_CANONICAL_CHAIN), 3), 0.05), axis=0)]
    )

    w, h = image_resolution
    fx = fy = 0.96 * w
    cx, cy = w / 2.0, h / 2.0
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])

    rng = np.random.RandomState(seed)

    camera_settings = {
        "camera_settings": [
            {
                "name": "synthetic",
                "intrinsic_settings": {
                    "fx": fx, "fy": fy, "cx": cx, "cy": cy, "s": 0,
                },
                "captured_image_size": {"width": w, "height": h},
            }
        ]
    }
    with open(os.path.join(output_dir, "_camera_settings.json"), "w") as f:
        json.dump(camera_settings, f, indent=2)
    with open(os.path.join(output_dir, "_object_settings.json"), "w") as f:
        json.dump({"exported_objects": [{"class": object_class}]}, f, indent=2)

    for idx in range(n_frames):
        # Pose the chain: random rotation + translation keeping it in view.
        R = _rotation_matrix(rng)
        push_out = idx < int(n_frames * out_of_frame_fraction)
        if push_out:
            t = np.array(
                [rng.uniform(0.5, 0.9), rng.uniform(-0.1, 0.1), rng.uniform(1.0, 1.6)]
            )
        else:
            t = np.array(
                [rng.uniform(-0.25, 0.25), rng.uniform(-0.2, 0.2), rng.uniform(1.2, 2.6)]
            )
        centered = chain - chain.mean(axis=0)
        Xc = centered @ R.T + t  # camera-frame keypoint positions
        proj = Xc @ K.T
        kp_projs = proj[:, :2] / proj[:, 2:3]
        depths = Xc[:, 2]

        img = _render_frame(image_resolution, kp_projs, depths, rng)
        name = f"{idx:06d}"
        Image.fromarray(img).save(
            os.path.join(output_dir, f"{name}.rgb.{image_extension}")
        )

        frame_data = {
            "objects": [
                {
                    "class": object_class,
                    "keypoints": [
                        {
                            "name": kp_name,
                            "location": Xc[i].tolist(),
                            "projected_location": kp_projs[i].tolist(),
                        }
                        for i, kp_name in enumerate(keypoint_names)
                    ],
                }
            ]
        }
        with open(os.path.join(output_dir, f"{name}.json"), "w") as f:
            json.dump(frame_data, f)

    return output_dir
