"""NDDS dataset discovery and parsing.

Same on-disk contract as the reference (reference dream/utilities.py:38-331):
a directory of digit-prefixed ``<frame>.json`` files with sibling
``<frame>.rgb.<ext>`` images, plus ``_camera_settings.json`` /
``_object_settings.json`` config files.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Tuple

import numpy as np

from dream_tpu.utils.config import load_yaml


def _load_data_file(path: str) -> dict:
    """NDDS data files are JSON (a YAML subset); use the fast json parser
    with a YAML fallback for exotic files."""
    try:
        with open(path, "r") as f:
            return json.load(f)
    except json.JSONDecodeError:
        return load_yaml(path)


def is_ndds_dataset(input_dir: str, data_extension: str = "json") -> bool:
    """Parity: reference dream/utilities.py:38-64."""
    input_dir = os.path.expanduser(input_dir)
    assert os.path.exists(input_dir), (
        f'Expected path "{input_dir}" to exist, but it does not.'
    )
    data_full_ext = "." + data_extension
    dirlist = os.listdir(input_dir)
    data_names = [
        os.path.splitext(f)[0]
        for f in dirlist
        if f.endswith(data_full_ext) and f[0].isdigit()
    ]
    return bool(data_names)


def find_ndds_data_in_dir(
    input_dir: str,
    data_extension: str = "json",
    image_extension: Optional[str] = None,
    requested_image_types="all",
) -> Tuple[Optional[List[dict]], Optional[dict]]:
    """Frame/config discovery (reference dream/utilities.py:67-232).

    Returns ``(found_data, found_configs)`` where each frame entry is
    ``{"name", "data_path", "image_paths": {"rgb": ..., ...}}`` and configs is
    ``{"camera": path|None, "object": path|None, "unsorted": [...]}``.
    """
    input_dir = os.path.expanduser(input_dir)
    assert os.path.exists(input_dir), (
        f'Expected path "{input_dir}" to exist, but it does not.'
    )
    dirlist = os.listdir(input_dir)
    data_full_ext = "." + data_extension

    if image_extension is None:
        image_exts_to_try = ["png", "jpg"]
        counts = [
            len([f for f in dirlist if f.endswith(ext)]) for ext in image_exts_to_try
        ]
        image_extension = image_exts_to_try[int(np.argmax(counts))]
    image_full_ext = "." + image_extension

    data_filenames = sorted(f for f in dirlist if f.endswith(data_full_ext))
    data_names = [os.path.splitext(f)[0] for f in data_filenames if f[0].isdigit()]
    if not data_names:
        return None, None
    data_paths = [
        os.path.join(input_dir, f) for f in data_filenames if f[0].isdigit()
    ]

    if requested_image_types == "all":
        first = data_names[0]
        matching = [
            f for f in dirlist if f.startswith(first) and f.endswith(image_full_ext)
        ]
        find_rgb = first + ".rgb" + image_full_ext in matching
        find_depth = first + ".depth" + image_full_ext in matching
        find_cs = first + ".cs" + image_full_ext in matching
    elif requested_image_types:
        known = ["rgb", "depth", "cs"]
        for t in requested_image_types:
            assert t in known, f'Image type "{t}" not recognized.'
        find_rgb = "rgb" in requested_image_types
        find_depth = "depth" in requested_image_types
        find_cs = "cs" in requested_image_types
    else:
        find_rgb = find_depth = find_cs = False

    image_lists = {}
    for flag, key, tag in [
        (find_rgb, "rgb", ".rgb"),
        (find_depth, "depth", ".depth"),
        (find_cs, "class_segmentation", ".cs"),
    ]:
        if not flag:
            continue
        paths = [
            os.path.join(input_dir, name + tag + image_full_ext)
            for name in data_names
        ]
        for p in paths:
            assert os.path.exists(p), (
                f'Expected image "{p}" to exist, but it does not.'
            )
        image_lists[key] = paths

    found_data = []
    for i, (name, data_path) in enumerate(zip(data_names, data_paths)):
        entry = {"name": name, "data_path": data_path}
        if image_lists:
            entry["image_paths"] = {k: v[i] for k, v in image_lists.items()}
        found_data.append(entry)

    found_configs = {"camera": None, "object": None, "unsorted": []}
    for f in data_filenames:
        if f[0].isdigit():
            continue
        if f == "_camera_settings" + data_full_ext:
            found_configs["camera"] = os.path.join(input_dir, f)
        elif f == "_object_settings" + data_full_ext:
            found_configs["object"] = os.path.join(input_dir, f)
        else:
            found_configs["unsorted"].append(os.path.join(input_dir, f))

    return found_data, found_configs


def load_camera_intrinsics(camera_data_path: str) -> np.ndarray:
    """3x3 K from _camera_settings (reference dream/utilities.py:235-256)."""
    assert os.path.exists(camera_data_path), (
        f'Expected path "{camera_data_path}" to exist, but it does not.'
    )
    data = _load_data_file(camera_data_path)
    intr = data["camera_settings"][0]["intrinsic_settings"]
    return np.array(
        [
            [intr["fx"], 0.0, intr["cx"]],
            [0.0, intr["fy"], intr["cy"]],
            [0.0, 0.0, 1.0],
        ]
    )


def load_image_resolution(camera_data_path: str) -> Tuple[int, int]:
    """(width, height) from _camera_settings (reference dream/utilities.py:259-280)."""
    assert os.path.exists(camera_data_path), (
        f'Expected path "{camera_data_path}" to exist, but it does not.'
    )
    data = _load_data_file(camera_data_path)
    size = data["camera_settings"][0]["captured_image_size"]
    return (size["width"], size["height"])


def load_keypoints(data_path: str, object_name: str, keypoint_names) -> dict:
    """Per-frame keypoint 3D positions + 2D projections, in requested order.

    Parity: reference dream/utilities.py:283-331.
    """
    assert os.path.exists(data_path), (
        f'Expected data_path "{data_path}" to exist, but it does not.'
    )
    data = _load_data_file(data_path)
    assert "objects" in data, (
        'Expected "objects" key to exist in data file, but it does not.'
    )
    object_names = [o["class"] for o in data["objects"]]
    assert object_name in object_names, (
        f'Requested object_name "{object_name}" does not exist in the data file objects.'
    )
    object_data = data["objects"][object_names.index(object_name)]
    object_keypoints = object_data["keypoints"]
    names = [kp["name"] for kp in object_keypoints]

    keypoint_data = {"positions_wrt_cam": [], "projections": []}
    for kp_name in keypoint_names:
        assert kp_name in names, (
            f"Expected keypoint '{kp_name}' to exist in the data file "
            f"'{data_path}', but it does not.  Rather, the keypoints are '{names}'"
        )
        kp = object_keypoints[names.index(kp_name)]
        keypoint_data["positions_wrt_cam"].append(kp["location"])
        keypoint_data["projections"].append(kp["projected_location"])
    return keypoint_data
