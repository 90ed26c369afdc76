"""Classification logger with confusion matrices
(reference torch_em/classification/classification_logger.py:98)."""

import os
from typing import Optional

import numpy as np

from ..trainer.logger_base import TorchEmLogger
from ..trainer.tensorboard_logger import SummaryWriter, _select_2d, make_grid

__all__ = ["ClassificationLogger", "make_confusion_matrix"]


def make_confusion_matrix(y_true, y_pred, normalize: str = "true"):
    """Confusion matrix image (rows = true classes)."""
    from sklearn.metrics import confusion_matrix

    cm = confusion_matrix(y_true, y_pred, normalize=normalize)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots()
    im = ax.imshow(cm, cmap="viridis", vmin=0, vmax=1)
    ax.set_xlabel("prediction")
    ax.set_ylabel("truth")
    fig.colorbar(im)
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
    plt.close(fig)
    return buf.transpose(2, 0, 1)


class ClassificationLogger(TorchEmLogger):
    """Scalar + sample-image + confusion-matrix logging for classification."""

    def __init__(self, trainer, save_root: Optional[str], **kwargs):
        super().__init__(trainer, save_root)
        if SummaryWriter is None:
            raise RuntimeError("tensorboardX is required for the ClassificationLogger.")
        self.log_dir = f"./logs/{trainer.name}" if save_root is None else \
            os.path.join(save_root, "logs", trainer.name)
        os.makedirs(self.log_dir, exist_ok=True)
        self.tb = SummaryWriter(self.log_dir)
        self.log_image_interval = trainer.log_image_interval

    def log_train(self, step, loss, lr, x, y, prediction, log_gradients=False):
        self.tb.add_scalar(tag="train/loss", scalar_value=float(loss), global_step=step)
        self.tb.add_scalar(tag="train/learning_rate", scalar_value=float(lr), global_step=step)
        if step % self.log_image_interval == 0 and x is not None:
            self.tb.add_image(tag="train/input", img_tensor=make_grid([_select_2d(x)]),
                              global_step=step)

    def log_validation(self, step, metric, loss, x, y, prediction, y_true=None, y_pred=None):
        self.tb.add_scalar(tag="validation/loss", scalar_value=float(loss), global_step=step)
        self.tb.add_scalar(tag="validation/metric", scalar_value=float(metric), global_step=step)
        if x is not None:
            self.tb.add_image(tag="validation/input", img_tensor=make_grid([_select_2d(x)]),
                              global_step=step)
        if y_true is not None and y_pred is not None:
            cm_image = make_confusion_matrix(y_true, y_pred)
            self.tb.add_image(tag="validation/confusion_matrix", img_tensor=cm_image,
                              global_step=step)
