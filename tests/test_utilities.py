"""NDDS IO tests, ported from reference test/test_utilities.py plus
discovery/round-trip coverage using the synthetic dataset generator."""

import json
import os

import numpy as np
import pytest

from dream_tpu.utils import ndds as ndds_utils
from dream_tpu.utils.config import load_yaml, save_yaml


@pytest.fixture(scope="module")
def camera_settings_path(tmp_path_factory):
    # Same fixture content as reference test/_camera_settings.json.
    data = {
        "camera_settings": [
            {
                "id": "",
                "name": "",
                "intrinsic_settings": {
                    "fx": 160, "fy": 160, "cx": 160, "cy": 120, "s": 0, "hfov": 90,
                    "resolution": {"width": 320, "height": 240},
                },
                "captured_image_size": {"width": 320, "height": 240},
            }
        ]
    }
    path = tmp_path_factory.mktemp("cam") / "_camera_settings.json"
    path.write_text(json.dumps(data))
    return str(path)


def test_load_camera_intrinsics(camera_settings_path):
    camera_K = ndds_utils.load_camera_intrinsics(camera_settings_path)
    camera_K_gt = np.array(
        [[160.0, 0.0, 160.0], [0.0, 160.0, 120.0], [0.0, 0.0, 1.0]]
    )
    assert np.all(camera_K == camera_K_gt)


def test_load_image_resolution(camera_settings_path):
    assert ndds_utils.load_image_resolution(camera_settings_path) == (320, 240)


@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    from dream_tpu.data.synthetic import generate_synthetic_ndds

    out = str(tmp_path_factory.mktemp("synth"))
    generate_synthetic_ndds(out, n_frames=6, image_resolution=(160, 120), seed=1)
    return out


def test_is_ndds_dataset(synth_dir, tmp_path):
    assert ndds_utils.is_ndds_dataset(synth_dir)
    assert not ndds_utils.is_ndds_dataset(str(tmp_path))


def test_find_ndds_data_in_dir(synth_dir):
    found_data, found_configs = ndds_utils.find_ndds_data_in_dir(synth_dir)
    assert len(found_data) == 6
    assert found_data[0]["name"] == "000000"
    assert os.path.exists(found_data[0]["image_paths"]["rgb"])
    assert found_configs["camera"] is not None
    assert found_configs["object"] is not None


def test_load_keypoints_order(synth_dir):
    found_data, _ = ndds_utils.find_ndds_data_in_dir(synth_dir)
    names = ["panda_link3", "panda_link0"]  # deliberately reordered subset
    kp = ndds_utils.load_keypoints(found_data[0]["data_path"], "panda", names)
    assert len(kp["projections"]) == 2
    full = ndds_utils.load_keypoints(
        found_data[0]["data_path"], "panda",
        ["panda_link0", "panda_link2", "panda_link3"],
    )
    # Requested order is respected.
    np.testing.assert_allclose(kp["projections"][1], full["projections"][0])
    np.testing.assert_allclose(kp["projections"][0], full["projections"][2])


def test_yaml_omap_compat(tmp_path):
    # Reference-style !!omap config must load into plain dicts.
    omap_text = (
        "!!omap\n"
        "- architecture: !!omap\n"
        "  - type: vgg\n"
        "  - image_normalization: !!omap\n"
        "    - mean: [0.5, 0.5, 0.5]\n"
        "    - stdev: [0.5, 0.5, 0.5]\n"
        "- training: !!omap\n"
        "  - config: !!omap\n"
        "    - net_input_resolution: [400, 400]\n"
    )
    p = tmp_path / "cfg.yaml"
    p.write_text(omap_text)
    cfg = load_yaml(str(p))
    assert cfg["architecture"]["type"] == "vgg"
    assert cfg["architecture"]["image_normalization"]["mean"] == [0.5, 0.5, 0.5]
    assert cfg["training"]["config"]["net_input_resolution"] == [400, 400]

    # Round-trip through our plain-map writer.
    out = tmp_path / "out.yaml"
    save_yaml(cfg, str(out))
    cfg2 = load_yaml(str(out))
    assert cfg2 == cfg

    # Overwrite protection (reference dream/network.py:594-597).
    with pytest.raises(AssertionError):
        save_yaml(cfg, str(out))


def test_find_ndds_data_image_types(tmp_path):
    """Extension auto-detect (jpg) + depth/cs sibling discovery
    (reference dream/utilities.py:86-206)."""
    import numpy as np
    from PIL import Image

    d = tmp_path / "jpgset"
    d.mkdir()
    img = Image.fromarray(np.zeros((8, 8, 3), np.uint8))
    for i in range(3):
        name = f"{i:06d}"
        for tag in ["rgb", "depth", "cs"]:
            img.save(d / f"{name}.{tag}.jpg")
        (d / f"{name}.json").write_text('{"objects": []}')

    found, configs = ndds_utils.find_ndds_data_in_dir(str(d))
    assert len(found) == 3
    assert found[0]["image_paths"]["rgb"].endswith("000000.rgb.jpg")
    assert found[0]["image_paths"]["depth"].endswith("000000.depth.jpg")
    assert found[0]["image_paths"]["class_segmentation"].endswith("000000.cs.jpg")

    # Restricting requested image types.
    found_rgb, _ = ndds_utils.find_ndds_data_in_dir(
        str(d), requested_image_types=["rgb"]
    )
    assert set(found_rgb[0]["image_paths"]) == {"rgb"}

    # Unknown type rejected.
    with pytest.raises(AssertionError):
        ndds_utils.find_ndds_data_in_dir(str(d), requested_image_types=["bogus"])
