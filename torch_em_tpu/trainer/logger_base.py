"""Logger plugin interface (reference torch_em/trainer/logger_base.py:7)."""

import os


class TorchEmLogger:
    """Base logger: ``log_train`` / ``log_validation`` hooks called by the trainer."""

    def __init__(self, trainer, save_root: str, **kwargs):
        self.trainer = trainer
        self.save_root = save_root

    def log_train(self, step, loss, lr, x, y, prediction, log_gradients=False):
        raise NotImplementedError

    def log_validation(self, step, metric, loss, x, y, prediction):
        raise NotImplementedError
