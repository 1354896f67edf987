"""Data pipeline: NDDS datasets, on-device augmentation, synthetic fixtures."""

from dream_tpu.data.dataset import (
    ManipulatorNDDSDataset,
    ManipulatorNDDSDatasetDebugLevels,
    DataLoader,
    DeviceCachedLoader,
    make_batch_processor,
    split_indices,
    collect_calibration_batches,
)
from dream_tpu.data.augment import AugmentConfig, DEFAULT_AUGMENT, augment_batch
from dream_tpu.data.synthetic import generate_synthetic_ndds, DEFAULT_KEYPOINT_NAMES
