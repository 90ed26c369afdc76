"""Self-training losses (reference torch_em/self_training/loss.py).

The reference losses call ``loss(model(input), pseudo_labels)`` with the
model passed in; here the trainer hands a traced ``apply_fn`` closure (the
student forward inside the jitted step) so the same flexibility is kept —
e.g. the PUNet ELBO losses call the apply differently.
"""

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..loss import DiceLoss

__all__ = [
    "DefaultSelfTrainingLoss", "DefaultSelfTrainingLossAndMetric",
    "ProbabilisticUNetLoss", "ProbabilisticUNetLossAndMetric",
]


class DefaultSelfTrainingLoss:
    """``loss(apply_fn(input), pseudo_labels)`` with optional filter mask
    (reference self_training/loss.py:9)."""

    def __init__(self, loss: Optional[Callable] = None, activation: Optional[Callable] = None):
        self.activation = activation
        self.loss = DiceLoss() if loss is None else loss
        self.init_kwargs = {"loss": self.loss, "activation": activation}

    def __call__(self, apply_fn, input_, labels, label_filter=None, rng=None):
        prediction = apply_fn(input_)
        if self.activation is not None:
            prediction = self.activation(prediction)
        if label_filter is None:
            loss = self.loss(prediction, labels)
        else:
            loss = self.loss(prediction * label_filter, labels * label_filter)
        return loss


class DefaultSelfTrainingLossAndMetric:
    """Loss and metric in one call (reference self_training/loss.py:52)."""

    def __init__(self, loss: Optional[Callable] = None, metric: Optional[Callable] = None,
                 activation: Optional[Callable] = None):
        self.activation = activation
        self.loss = DiceLoss() if loss is None else loss
        self.metric = DiceLoss() if metric is None else metric
        self.init_kwargs = {"loss": self.loss, "metric": self.metric, "activation": activation}

    def __call__(self, apply_fn, input_, labels, label_filter=None, rng=None):
        prediction = apply_fn(input_)
        if self.activation is not None:
            prediction = self.activation(prediction)
        if label_filter is None:
            loss = self.loss(prediction, labels)
        else:
            loss = self.loss(prediction * label_filter, labels * label_filter)
        metric = self.metric(prediction, labels)
        return loss, metric


class ProbabilisticUNetLoss:
    """ELBO-style loss for PUNet self-training (reference self_training/loss.py:104).

    ``apply_fn`` must be the PUNet elbo closure: apply_fn(input_, labels) -> elbo.
    """

    def __init__(self, loss: Optional[Callable] = None):
        self.loss = loss
        self.init_kwargs = {"loss": loss}

    def __call__(self, apply_fn, input_, labels, label_filter=None, rng=None):
        elbo = apply_fn(input_, labels)
        return -elbo if self.loss is None else self.loss(elbo)


class ProbabilisticUNetLossAndMetric:
    """ELBO loss + dice metric on prior samples (reference self_training/loss.py:129)."""

    def __init__(self, loss=None, metric: Optional[Callable] = None, activation: Optional[Callable] = None,
                 prior_samples: int = 16):
        self.loss = loss
        self.metric = DiceLoss() if metric is None else metric
        self.activation = activation
        self.prior_samples = prior_samples
        self.init_kwargs = {
            "loss": loss, "metric": self.metric, "activation": activation, "prior_samples": prior_samples,
        }

    def __call__(self, apply_fn, input_, labels, label_filter=None, rng=None, sample_fn=None):
        elbo = apply_fn(input_, labels)
        loss = -elbo if self.loss is None else self.loss(elbo)
        if sample_fn is None:
            return loss, loss
        if rng is None:
            rng = jax.random.PRNGKey(0)
        keys = jax.random.split(rng, self.prior_samples)
        samples = jnp.stack([sample_fn(input_, k) for k in keys])
        if self.activation is not None:
            samples = self.activation(samples)
        prediction = jnp.mean(samples, axis=0)
        metric = self.metric(prediction, labels)
        return loss, metric
