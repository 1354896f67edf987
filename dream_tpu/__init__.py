"""dream_tpu: TPU-native camera-to-robot pose estimation framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of NVlabs/DREAM
(reference: /root/reference): per-keypoint belief-map regression from a single
RGB image of a robot manipulator, keypoint peak extraction, and PnP pose
recovery -- all running end-to-end on device as jitted array programs.

Layering (bottom to top), mirroring the reference's layer map
(reference README.md:3-5, dream/__init__.py:1-9) but TPU-first:

- ``dream_tpu.utils``     -- config, NDDS dataset IO, resolution algebra
- ``dream_tpu.ops``       -- pure-jnp/Pallas kernels: belief maps, peak
                             extraction, coordinate transforms, PnP, soft-argmax
- ``dream_tpu.models``    -- flax model zoo (hourglass VGG, ResNet, DOPE)
- ``dream_tpu.parallel``  -- mesh/sharding helpers (replaces DataParallel)
- ``dream_tpu.data``      -- NDDS dataset pipeline + on-device augmentation
- ``dream_tpu.network``   -- config-driven network facade (DreamNetwork)
- ``dream_tpu.analysis``  -- PCK/ADD metrics, dataset evaluation, reports
"""

__version__ = "0.1.0"

from dream_tpu.utils import resolutions as resolutions
from dream_tpu.utils.resolutions import (
    KNOWN_IMAGE_PREPROC_TYPES,
    resolution_after_preprocessing,
    shrink_resolution,
    shrink_and_crop_resolution,
)
from dream_tpu import ops as ops
from dream_tpu import utils as utilities

KNOWN_ARCHITECTURES = ["vgg", "resnet"]
KNOWN_OPTIMIZERS = ["adam", "sgd"]


def __getattr__(name):
    # Lazy imports keep `import dream_tpu` light (no flax/model import cost for
    # pure ops users) while still exposing the full facade, mirroring the
    # reference's star-exports (reference dream/__init__.py:3-9).
    import importlib

    lazy_modules = {
        "network": "dream_tpu.network",
        "models": "dream_tpu.models",
        "datasets": "dream_tpu.data",
        "analysis": "dream_tpu.analysis",
        "image_proc": "dream_tpu.ops.image_proc",
        "geometric_vision": "dream_tpu.ops.geometric_vision",
        "spatial_softmax": "dream_tpu.ops.spatial_softmax",
        "oks_plots": "dream_tpu.oks_plots",
        "add_plots": "dream_tpu.add_plots",
        "serve": "dream_tpu.serve",
        "visualize": "dream_tpu.visualize",
        "parallel": "dream_tpu.parallel",
        "export": "dream_tpu.export",
    }
    if name in lazy_modules:
        return importlib.import_module(lazy_modules[name])
    if name in ("DreamNetwork", "create_network_from_config_file",
                "create_network_from_config_data"):
        return getattr(importlib.import_module("dream_tpu.network"), name)
    raise AttributeError(f"module 'dream_tpu' has no attribute '{name}'")
