"""Trainer for the Probabilistic U-Net.

Rebuild of torch_em/self_training/probabilistic_unet_trainer.py:13: ELBO
training with posterior-gradient clipping (:76-78, realized via the optimizer
spec's global-norm clip) and prior sampling for validation/logging (:49-51).
"""

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..trainer.default_trainer import DefaultTrainer
from ..trainer.optimizers import get_learning_rate
from .mean_teacher import Dummy

__all__ = ["ProbabilisticUNetTrainer", "DummyLoss"]

DummyLoss = Dummy


class ProbabilisticUNetTrainer(DefaultTrainer):
    """ELBO training loop for PUNet (arXiv:1806.05034).

    ``loss(elbo_fn, x, y)`` and ``loss_and_metric(elbo_fn, x, y,
    sample_fn=...)`` follow the self-training loss interface.
    """

    def __init__(self, clipping_value: Optional[float] = None, prior_samples: int = 16,
                 loss=None, loss_and_metric=None, **kwargs):
        kwargs.pop("metric", None)
        super().__init__(loss=loss, metric=Dummy(), **kwargs)
        assert loss is not None and loss_and_metric is not None
        self.loss_and_metric = loss_and_metric
        self.clipping_value = clipping_value
        self.prior_samples = prior_samples
        self._kwargs = {
            "clipping_value": clipping_value, "prior_samples": prior_samples,
            "loss_and_metric": loss_and_metric,
        }

    def _initialize(self, iterations, load_from_checkpoint, epochs=None):
        # posterior-encoder gradient clipping is realized via global-norm clip
        if self.clipping_value is not None and self.optimizer is not None \
                and self.optimizer.grad_clip is None:
            from ..trainer.optimizers import OptimizerSpec

            self.optimizer = OptimizerSpec(
                self.optimizer.name, lr=self.optimizer.lr, grad_clip=self.clipping_value,
                **self.optimizer.kwargs,
            )
        return super()._initialize(iterations, load_from_checkpoint, epochs)

    def _build_steps(self):
        tx = self._tx
        model = self.model

        def train_step(variables, opt_state, x, y, rng):
            params = variables["params"]
            state = {k: v for k, v in variables.items() if k != "params"}

            def loss_fn(p):
                v = {"params": p, **state}
                elbo_fn = lambda inp, labels: model.elbo_fn(v, inp, labels, rng)
                return self.loss(elbo_fn, x, y, rng=rng)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            grads = self._reduce_grads(grads)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
            return {"params": params, **state}, opt_state, loss

        def val_step(variables, x, y, rng):
            elbo_fn = lambda inp, labels: model.elbo_fn(variables, inp, labels, rng, train=False)
            sample_fn = lambda inp, k: model.sample_fn(variables, inp, k)
            loss, metric = self.loss_and_metric(elbo_fn, x, y, rng=rng, sample_fn=sample_fn)
            return loss, metric

        self._train_step = jax.jit(train_step, donate_argnums=(0, 1))
        self._val_step = jax.jit(val_step)

    def _train_epoch(self, progress, **unused_profiling_kwargs):
        n_iter = 0
        t_start = time.time()
        lr = get_learning_rate(self.opt_state)
        for x, y in self.train_loader:
            x, y = self._to_device(x), self._to_device(y)
            self.variables, self.opt_state, loss = self._train_step(
                self.variables, self.opt_state, x, y, self._next_rng()
            )
            if self.logger is not None:
                self.logger.log_train(self._iteration, np.asarray(loss), lr, x, y, None)
            self._iteration += 1
            n_iter += 1
            if progress is not None:
                progress.update(1)
            if self._iteration >= self.max_iteration:
                break
        return (time.time() - t_start) / max(n_iter, 1)

    def _validate(self):
        losses, metrics = [], []
        last = None
        for x, y in self.val_loader:
            x, y = self._to_device(x), self._to_device(y)
            loss, metric = self._val_step(self.variables, x, y, self._next_rng())
            losses.append(loss)
            metrics.append(metric)
            last = (x, y)
        metric_val = float(np.mean([np.asarray(m) for m in metrics]))
        loss_val = float(np.mean([np.asarray(l) for l in losses]))
        if self.logger is not None and last is not None:
            # log a prior sample for inspection
            sample = self.model.sample_fn(self.variables, last[0], self._next_rng())
            self.logger.log_validation(self._iteration, metric_val, loss_val, last[0], last[1],
                                       jax.nn.sigmoid(sample))
        return metric_val
