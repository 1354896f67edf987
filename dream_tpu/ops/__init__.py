"""Pure-array kernels: the TPU-native compute layer of dream_tpu.

Everything in this package is jit/vmap-friendly jnp (with Pallas kernels for
the fused hot paths) and runs entirely on device.  This layer replaces the
reference's mix of PIL/cv2/scipy/numpy per-sample host code
(reference dream/image_proc.py, dream/geometric_vision.py).
"""

from dream_tpu.ops import coords as coords
from dream_tpu.ops import belief_maps as belief_maps
from dream_tpu.ops import image_proc as image_proc
from dream_tpu.ops import geometric_vision as geometric_vision
from dream_tpu.ops import spatial_softmax as spatial_softmax
from dream_tpu.ops import pil_compat as pil_compat

from dream_tpu.ops.coords import (
    KeypointAffine,
    affine_netin_from_netout,
    affine_netout_from_netin,
    affine_netin_from_raw,
    affine_raw_from_netin,
    convert_keypoints_to_netin_from_netout,
    convert_keypoints_to_netout_from_netin,
    convert_keypoints_to_netin_from_raw,
    convert_keypoints_to_raw_from_netin,
)
from dream_tpu.ops.belief_maps import (
    create_belief_maps,
    gaussian_blur_scipy_compat,
    peaks_from_belief_maps,
    keypoints_from_belief_maps,
    NO_DETECTION_SENTINEL,
)
from dream_tpu.ops.geometric_vision import (
    solve_pnp,
    solve_pnp_ransac,
    add_from_pose,
    point_projection_from_3d,
    quaternion_from_rotation_matrix,
)
from dream_tpu.ops.spatial_softmax import soft_argmax
