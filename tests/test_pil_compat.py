"""Host-side PIL preprocessing helper tests (reference API completeness)."""

import numpy as np
import pytest
from PIL import Image

from dream_tpu.ops import pil_compat as pc
from dream_tpu.utils import resolutions as res


@pytest.fixture
def img():
    rng = np.random.RandomState(0)
    return Image.fromarray(rng.randint(0, 255, (480, 640, 3), dtype=np.uint8))


def test_preprocess_resolutions_match_algebra(img):
    for mode in res.KNOWN_IMAGE_PREPROC_TYPES:
        out = pc.preprocess_image(img, (400, 400), mode)
        assert out.size == res.resolution_after_preprocessing(
            img.size, (400, 400), mode
        ), mode


def test_shrink_and_crop_image(img):
    out = pc.shrink_and_crop_image(img, (400, 400))
    assert out.size == (400, 400)
    # Center crop: the middle column of the input should map to the middle of
    # the output (compare downsampled center strips).
    a = np.asarray(img)[:, 280:360].mean()
    b = np.asarray(out)[:, 160:240].mean()
    assert abs(a - b) < 3.0


def test_inverse_preprocess_round_trip(img):
    for mode in ["resize", "shrink"]:
        pre = pc.preprocess_image(img, (400, 400), mode)
        inv = pc.inverse_preprocess_image(pre, img.size, mode)
        assert inv.size == img.size

    # shrink-and-crop is lossy: output has black side bars where data was
    # cropped (reference dream/image_proc.py:79-88).
    pre = pc.preprocess_image(img, (400, 400), "shrink-and-crop")
    inv = pc.inverse_preprocess_image(pre, img.size, "shrink-and-crop")
    assert inv.size == img.size
    arr = np.asarray(inv)
    assert np.all(arr[:, :70] == 0)  # left bar (crop box starts at x=80)
    assert arr[:, 100:540].mean() > 50  # interior has content


def test_centered_crop_and_scale(img):
    cropped, coords = pc.centered_crop_image(img, 480, 480)
    assert cropped.size == (480, 480)
    assert coords == (80, 0)
    scaled = pc.scale_image(img, new_height=240)
    assert scaled.size == (320, 240)
    with pytest.raises(AssertionError):
        pc.scale_image(img)


def test_netin_netout_image_resizes(img):
    small = pc.convert_image_to_netout_from_netin(img, (100, 100))
    assert small.size == (100, 100)
    back = pc.convert_image_to_netin_from_netout(small, (400, 400))
    assert back.size == (400, 400)


def test_soft_argmax_module():
    import jax
    import jax.numpy as jnp

    from dream_tpu.models import SoftArgmax
    from dream_tpu.ops.belief_maps import create_belief_maps

    maps = create_belief_maps(jnp.array([[20.0, 10.0], [5.0, 25.0]]), (32, 32))
    module = SoftArgmax(n_keypoints=2, learned_beta=True, initial_beta=25.0)
    variables = module.init(jax.random.PRNGKey(0), maps)
    assert variables["params"]["beta"].shape == (2,)
    coords = module.apply(variables, maps)
    np.testing.assert_allclose(
        np.asarray(coords), [[20.0, 10.0], [5.0, 25.0]], atol=0.5
    )


def test_image_from_tensor_roundtrip():
    """image_from_tensor(s) invert the normalization exactly (reference
    dream/image_proc.py:596-631 analog, NHWC)."""
    import numpy as np

    from dream_tpu import visualize as viz

    rng = np.random.RandomState(0)
    raw = rng.randint(0, 255, size=(2, 8, 8, 3), dtype=np.uint8)
    norm = {"mean": [0.5] * 3, "stdev": [0.5] * 3}
    net_in = (raw.astype(np.float32) / 255.0 - 0.5) / 0.5
    imgs = viz.images_from_tensor(net_in, norm)
    assert len(imgs) == 2
    np.testing.assert_array_equal(np.asarray(imgs[0]), raw[0])
    # Unnormalized path assumes [0, 1].
    img = viz.image_from_tensor(raw[1].astype(np.float32) / 255.0)
    np.testing.assert_array_equal(np.asarray(img), raw[1])
