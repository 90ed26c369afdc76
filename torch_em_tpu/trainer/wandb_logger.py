"""Weights & Biases logging (reference torch_em/trainer/wandb_logger.py:21).

Import-guarded: wandb is an optional dependency.
"""

from typing import Optional

import numpy as np

from .logger_base import TorchEmLogger

try:
    import wandb
except ImportError:  # pragma: no cover
    wandb = None


class WandbLogger(TorchEmLogger):
    """Logs scalars/images to a wandb run; can auto-generate the trainer name."""

    def __init__(self, trainer, save_root: Optional[str], *, project_name: Optional[str] = None,
                 log_model_freq: Optional[int] = None, mode: Optional[str] = None, config=None, **kwargs):
        super().__init__(trainer, save_root)
        if wandb is None:
            raise RuntimeError("wandb is required for the WandbLogger but is not installed.")
        self.log_image_interval = trainer.log_image_interval
        self.run = wandb.init(project=project_name, name=trainer.name, mode=mode, config=config)
        if trainer.name is None:
            trainer.name = self.run.name
            trainer.id_ = self.run.id

    def get_wandb(self):
        return wandb

    def log_train(self, step, loss, lr, x, y, prediction, log_gradients=False):
        self.run.log({"train/loss": float(loss), "train/learning_rate": float(lr)}, step=step)
        if step % self.log_image_interval == 0 and x is not None:
            self.run.log({"train/input": wandb.Image(np.asarray(x)[0, 0])}, step=step)

    def log_validation(self, step, metric, loss, x, y, prediction):
        self.run.log({"validation/loss": float(loss), "validation/metric": float(metric)}, step=step)
