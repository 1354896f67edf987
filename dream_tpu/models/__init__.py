"""flax model zoo: every architecture in the reference's dream/models.py."""

from dream_tpu.models.hourglass import DreamHourglass, DreamHourglassMultiStage
from dream_tpu.models.resnet_simple import ResnetSimple, Bottleneck
from dream_tpu.models.dope import DopeNetworkBelief
from dream_tpu.models.heads import SoftArgmax
from dream_tpu.models.layers import (
    TorchConvTranspose,
    max_pool_torch,
    upsample_nearest,
)
