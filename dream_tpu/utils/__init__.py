"""Host-side utilities: config, NDDS IO, seeding, resolution algebra."""

from dream_tpu.utils.resolutions import (
    KNOWN_IMAGE_PREPROC_TYPES,
    resolution_after_preprocessing,
    shrink_resolution,
    shrink_and_crop_resolution,
    net_output_resolution_from_input_resolution,
)
from dream_tpu.utils.ndds import (
    is_ndds_dataset,
    find_ndds_data_in_dir,
    load_camera_intrinsics,
    load_image_resolution,
    load_keypoints,
)
from dream_tpu.utils.config import load_yaml, save_yaml, set_random_seed, makedirs
