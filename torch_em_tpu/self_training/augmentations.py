"""Default augmentations for self-training (reference torch_em/self_training/augmentations.py)."""

from ..transforms.raw import get_default_mean_teacher_augmentations
from ..transforms.invertible_augmentations import (
    FixMatchAugmenters, MeanTeacherAugmenters, UniMatchv2Augmenters,
)

__all__ = [
    "get_default_mean_teacher_augmentations", "MeanTeacherAugmenters",
    "FixMatchAugmenters", "UniMatchv2Augmenters",
]
