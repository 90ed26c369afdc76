"""Classification training (reference torch_em/classification/)."""

from .classification import (
    ClassificationMetric, default_classification_loader, default_classification_trainer,
)
from .classification_dataset import ClassificationDataset
from .classification_logger import ClassificationLogger
from .classification_trainer import ClassificationTrainer
