"""tpu-em: TPU-native (JAX/XLA/Pallas) framework for deep-learning-based
semantic and instance segmentation of microscopy and bioimage data, with the
full capabilities of torch-em (see SURVEY.md for the blueprint).
"""

__version__ = "0.1.0"

from . import data, loss, metric, models, transforms, utils
from .segmentation import (
    default_segmentation_dataset,
    default_segmentation_loader,
    default_segmentation_trainer,
    get_data_loader,
)
from . import trainer
from .trainer import DefaultTrainer
