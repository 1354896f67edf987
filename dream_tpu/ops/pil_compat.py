"""Host-side PIL preprocessing helpers (API completeness layer).

dream_tpu's hot path preprocesses batches on device
(dream_tpu.ops.image_proc); these PIL equivalents cover the reference's
host-side single-image utilities (reference dream/image_proc.py:26-90,
291-459) for visualization tooling and users migrating call sites directly.
"""

from __future__ import annotations

from PIL import Image as PILImage

from dream_tpu.utils.resolutions import (
    KNOWN_IMAGE_PREPROC_TYPES,
    shrink_and_crop_resolution,
)


def scale_image(image, factor=-1, new_width=-1, new_height=-1):
    """Aspect-preserving PIL resize (reference dream/image_proc.py:416-459)."""
    assert isinstance(image, PILImage.Image)
    image_width, image_height = image.size
    if factor > 0:
        new_width = int(image_width * factor)
        new_height = int(image_height * factor)
    elif new_width > 0:
        new_height = int(image_height * (new_width / image_width))
    elif new_height > 0:
        new_width = int(image_width * (new_height / image_height))
    else:
        raise AssertionError(
            "scale_image: Must specify either 'factor', or 'new_width', or 'new_height'."
        )
    return image.resize((new_width, new_height), resample=PILImage.BILINEAR)


def crop_image(image, u, v, cropped_width, cropped_height):
    """Parity: reference dream/image_proc.py:354-369."""
    assert isinstance(image, PILImage.Image)
    return image.crop((u, v, u + cropped_width, v + cropped_height))


def centered_crop_image(image, cropped_width, cropped_height):
    """Parity: reference dream/image_proc.py:372-413."""
    assert isinstance(image, PILImage.Image)
    image_width, image_height = image.size
    assert 0 < cropped_width <= image_width
    assert 0 < cropped_height <= image_height
    crop_u = (image_width - cropped_width) // 2
    crop_v = (image_height - cropped_height) // 2
    return (
        crop_image(image, crop_u, crop_v, cropped_width, cropped_height),
        (crop_u, crop_v),
    )


def shrink_and_crop_image(input_image, image_ref_resolution):
    """Parity: reference dream/image_proc.py:291-315."""
    assert isinstance(input_image, PILImage.Image)
    cropped_res, cropped_coords = shrink_and_crop_resolution(
        input_image.size, image_ref_resolution
    )
    cropped, coords = centered_crop_image(input_image, cropped_res[0], cropped_res[1])
    assert coords == cropped_coords
    return cropped.resize(tuple(image_ref_resolution), resample=PILImage.BILINEAR)


def preprocess_image(input_image, image_ref_resolution, image_preprocessing):
    """Single-image host preprocessing (reference dream/image_proc.py:26-51)."""
    assert isinstance(input_image, PILImage.Image)
    assert image_preprocessing in KNOWN_IMAGE_PREPROC_TYPES, (
        f'Image preprocessing type "{image_preprocessing}" is not recognized.'
    )
    if image_preprocessing == "none":
        return input_image
    if image_preprocessing == "resize":
        return input_image.resize(
            tuple(image_ref_resolution), resample=PILImage.BILINEAR
        )
    if image_preprocessing == "shrink":
        return scale_image(input_image, new_height=image_ref_resolution[1])
    return shrink_and_crop_image(input_image, image_ref_resolution)


def inverse_preprocess_image(
    preprocessed_image, image_input_resolution, image_preprocessing
):
    """Parity: reference dream/image_proc.py:54-90 (shrink-and-crop is lossy:
    the un-cropped area is filled black)."""
    assert isinstance(preprocessed_image, PILImage.Image)
    assert image_preprocessing in KNOWN_IMAGE_PREPROC_TYPES
    image_input_resolution = tuple(image_input_resolution)
    if image_preprocessing == "none":
        return preprocessed_image
    if image_preprocessing in ("resize", "shrink"):
        return preprocessed_image.resize(
            image_input_resolution, resample=PILImage.BILINEAR
        )
    cropped_res, cropped_coords = shrink_and_crop_resolution(
        image_input_resolution, preprocessed_image.size
    )
    canvas = PILImage.new("RGB", image_input_resolution)
    canvas.paste(
        preprocessed_image.resize(cropped_res, resample=PILImage.BILINEAR),
        box=cropped_coords,
    )
    return canvas


def convert_image_to_netin_from_netout(image_netout, net_input_resolution):
    """Parity: reference dream/image_proc.py:263-274."""
    assert isinstance(image_netout, PILImage.Image)
    return image_netout.resize(tuple(net_input_resolution), resample=PILImage.BILINEAR)


def convert_image_to_netout_from_netin(image_netin, net_output_resolution):
    """Parity: reference dream/image_proc.py:277-288."""
    assert isinstance(image_netin, PILImage.Image)
    return image_netin.resize(tuple(net_output_resolution), resample=PILImage.BILINEAR)
