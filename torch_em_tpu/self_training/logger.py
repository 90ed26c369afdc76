"""Tensorboard logging for self-training (reference torch_em/self_training/logger.py)."""

import os
from typing import Optional

import numpy as np

from ..trainer.logger_base import TorchEmLogger
from ..trainer.tensorboard_logger import SummaryWriter, _select_2d, make_grid


class SelfTrainingTensorboardLogger(TorchEmLogger):
    """Scalars + image panels for pseudo-label training, incl. confidence
    threshold curves (reference self_training/logger.py:10)."""

    def __init__(self, trainer, save_root: Optional[str], **kwargs):
        super().__init__(trainer, save_root)
        if SummaryWriter is None:
            raise RuntimeError("tensorboardX is required for the SelfTrainingTensorboardLogger.")
        self.log_dir = f"./logs/{trainer.name}" if save_root is None else \
            os.path.join(save_root, "logs", trainer.name)
        os.makedirs(self.log_dir, exist_ok=True)
        self.tb = SummaryWriter(self.log_dir)
        self.log_image_interval = trainer.log_image_interval

    def _log_images(self, step, name, x, y, prediction, pseudo_labels=None, label_filter=None):
        images = [_select_2d(x)]
        if y is not None:
            images.append(_select_2d(y)[:1])
        if prediction is not None:
            images.append(_select_2d(prediction)[:1])
        if pseudo_labels is not None:
            images.append(_select_2d(pseudo_labels)[:1])
        if label_filter is not None:
            images.append(_select_2d(label_filter)[:1])
        self.tb.add_image(tag=f"{name}/overview", img_tensor=make_grid(images), global_step=step)

    def log_combined_loss(self, step, loss):
        self.tb.add_scalar(tag="train/combined_loss", scalar_value=float(loss), global_step=step)

    def log_lr(self, step, lr):
        self.tb.add_scalar(tag="train/learning_rate", scalar_value=float(lr), global_step=step)

    def log_ct(self, step, ct):
        self.tb.add_scalar(tag="train/confidence_threshold", scalar_value=float(ct), global_step=step)

    def log_train_supervised(self, step, loss, x, y, prediction):
        self.tb.add_scalar(tag="train/supervised/loss", scalar_value=float(loss), global_step=step)
        if step % self.log_image_interval == 0:
            self._log_images(step, "train/supervised", x, y, prediction)

    def log_train_unsupervised(self, step, loss, x1, x2, prediction, pseudo_labels=None, label_filter=None):
        self.tb.add_scalar(tag="train/unsupervised/loss", scalar_value=float(loss), global_step=step)
        if step % self.log_image_interval == 0:
            self._log_images(step, "train/unsupervised", x1, None, prediction, pseudo_labels, label_filter)

    def log_validation_supervised(self, step, metric, loss, x, y, prediction):
        self.tb.add_scalar(tag="validation/supervised/loss", scalar_value=float(loss), global_step=step)
        self.tb.add_scalar(tag="validation/supervised/metric", scalar_value=float(metric), global_step=step)
        self._log_images(step, "validation/supervised", x, y, prediction)

    def log_validation_unsupervised(self, step, metric, loss, x1, x2, prediction,
                                    pseudo_labels=None, label_filter=None):
        self.tb.add_scalar(tag="validation/unsupervised/loss", scalar_value=float(loss), global_step=step)
        self.tb.add_scalar(tag="validation/unsupervised/metric", scalar_value=float(metric), global_step=step)
        self._log_images(step, "validation/unsupervised", x1, None, prediction, pseudo_labels, label_filter)

    # base-class interface (used if a plain trainer drives this logger)
    def log_train(self, step, loss, lr, x, y, prediction, log_gradients=False):
        self.log_train_supervised(step, loss, x, y, prediction)
        self.log_lr(step, lr)

    def log_validation(self, step, metric, loss, x, y, prediction):
        self.log_validation_supervised(step, metric, loss, x, y, prediction)
