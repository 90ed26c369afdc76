"""Classification factories (reference torch_em/classification/classification.py)."""

from functools import partial
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..segmentation import default_segmentation_trainer, get_data_loader
from ..transforms.augmentation import get_augmentations
from ..transforms.raw import standardize
from .classification_dataset import ClassificationDataset
from .classification_logger import ClassificationLogger
from .classification_trainer import ClassificationTrainer

__all__ = ["ClassificationMetric", "CrossEntropyLoss", "default_classification_loader",
           "default_classification_trainer"]


class CrossEntropyLoss:
    """Cross entropy on logits (N, C) vs int targets (N,)."""

    def __init__(self):
        self.init_kwargs = {}

    def __call__(self, pred, target):
        import jax

        log_probs = jax.nn.log_softmax(pred, axis=-1)
        target = target.astype(jnp.int32)
        nll = -jnp.take_along_axis(log_probs, target[:, None], axis=-1)
        return jnp.mean(nll)


class ClassificationMetric:
    """sklearn-metric error (lower = better) on argmax predictions
    (reference classification.py:15)."""

    host_metric = True

    def __init__(self, metric_name: str = "accuracy_score", **metric_kwargs):
        import sklearn.metrics as metrics

        if not hasattr(metrics, metric_name):
            raise ValueError(f"Invalid metric_name {metric_name}.")
        self.metric_name = metric_name
        self.metric = getattr(metrics, metric_name)
        self.metric_kwargs = metric_kwargs
        self.init_kwargs = {"metric_name": metric_name, **metric_kwargs}

    def __call__(self, y_true, y_pred) -> float:
        return 1.0 - self.metric(np.asarray(y_true), np.asarray(y_pred), **self.metric_kwargs)


def default_classification_loader(
    data: Sequence,
    target: Sequence,
    batch_size: int,
    normalization=None,
    augmentation=None,
    image_shape: Optional[Tuple[int, ...]] = None,
    **loader_kwargs,
):
    """Data loader for classification training (reference classification.py:43)."""
    ndim = data[0].ndim - 1
    if ndim not in (2, 3):
        raise ValueError(f"Expect input data of dimensionality 2 or 3, got {ndim}")
    if normalization is None:
        axis = (1, 2) if ndim == 2 else (1, 2, 3)
        normalization = partial(standardize, axis=axis)
    if augmentation is None:
        augmentation = get_augmentations(ndim=ndim)
    dataset = ClassificationDataset(data, target, normalization, augmentation, image_shape)
    return get_data_loader(dataset, batch_size, **loader_kwargs)


def default_classification_trainer(
    name: str,
    model,
    train_loader,
    val_loader,
    loss=None,
    metric=None,
    logger=ClassificationLogger,
    trainer_class=ClassificationTrainer,
    **kwargs,
):
    """Trainer for a classification task (reference classification.py:84).

    Lower metric = better, so the default records the accuracy ERROR.
    """
    loss = CrossEntropyLoss() if loss is None else loss
    metric = ClassificationMetric() if metric is None else metric
    return default_segmentation_trainer(
        name, model, train_loader, val_loader, loss=loss, metric=metric,
        logger=logger, trainer_class=trainer_class, **kwargs,
    )
