"""Training loop, checkpointing, optimizers, and loggers."""

from .default_trainer import DefaultTrainer
from .flashoptim_trainer import FlashOptimTrainer
from .spoco_trainer import SPOCOTrainer
from .logger_base import TorchEmLogger
from .optimizers import OptimizerSpec, ReduceLROnPlateau
from .tensorboard_logger import TensorboardLogger
from .wandb_logger import WandbLogger
