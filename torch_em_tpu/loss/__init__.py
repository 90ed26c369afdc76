"""Losses: Dice family, masking wrappers, and advanced embedding/affinity losses."""

from .dice import DiceLoss, DiceLossWithLogits, BCEDiceLoss, BCEDiceLossWithLogits, dice_score, flatten_samples
from .wrapper import LossWrapper, ApplyMask, ApplyAndRemoveMask, MaskIgnoreLabel
