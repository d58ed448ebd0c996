from .losses import (LOSS_NAMES, dice_coe, segmentation_loss,
                     softmax_cross_entropy, weighted_softmax_cross_entropy)
from .metrics import batch_metrics, confusion_counts

__all__ = [
    "LOSS_NAMES", "dice_coe", "segmentation_loss", "softmax_cross_entropy",
    "weighted_softmax_cross_entropy", "batch_metrics", "confusion_counts",
]
