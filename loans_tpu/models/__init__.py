"""Model zoo: localizer backbones, assessor, SSD baseline."""

from loans_tpu.models.assessor import ResnetAssessor
from loans_tpu.models.localizer import IMAGENET_MEAN_RGB, Localizer
from loans_tpu.models.resnet import (
    BLOCK_CONFIGS,
    BasicStage,
    BottleNeckStage,
    ResNet,
)
from loans_tpu.models.ssd import SSD, SSD300, SSD512

__all__ = [
    "ResnetAssessor",
    "IMAGENET_MEAN_RGB",
    "Localizer",
    "BLOCK_CONFIGS",
    "BasicStage",
    "BottleNeckStage",
    "ResNet",
    "SSD",
    "SSD300",
    "SSD512",
]
