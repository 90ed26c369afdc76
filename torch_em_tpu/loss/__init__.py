"""Losses: Dice family, masking wrappers, embedding/affinity/distance losses."""

from .affinity_side_loss import AffinitySideLoss
from .cldice import CombinedclDiceLoss, SoftclDiceLoss, SoftSkeletonize, cldice_score
from .combined_loss import CombinedLoss
from .contrastive import ContrastiveLoss
from .dice import (
    BCEDiceLoss, BCEDiceLossWithLogits, DiceLoss, DiceLossWithLogits, dice_score, flatten_samples,
)
from .distance_based import DiceBasedDistanceLoss, DistanceLoss
from .spoco_loss import (
    CombinedAuxLoss, ContrastiveLossBase, ExtendedContrastiveLoss, GaussianKernel,
    SPOCOConsistencyLoss, SPOCOLoss,
)
from .wrapper import ApplyAndRemoveMask, ApplyMask, LossWrapper, MaskIgnoreLabel

EMBEDDING_LOSSES = (ContrastiveLoss, ExtendedContrastiveLoss, SPOCOLoss)
"""Losses that predict pixel embeddings (used by the tensorboard logger for PCA visualization)."""
