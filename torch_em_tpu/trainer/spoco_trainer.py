"""SPOCO trainer: two-network training with exponential moving averages.

Rebuild of torch_em/trainer/spoco_trainer.py:10: a frozen EMA copy of the
model (``model2``, :36-38) provides the second view; the loss is called as
``loss((pred, pred2), y)`` (:105); the EMA update (:45) runs INSIDE the jitted
train step (a tree_map, fused by XLA — no host sync per iteration); the
checkpoint carries ``model2_state`` (:49-54); optional semi-supervised epoch
(:69-88).
"""

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization as flax_serialization

from .default_trainer import DefaultTrainer
from .optimizers import get_learning_rate
from .tensorboard_logger import TensorboardLogger


class SPOCOTrainer(DefaultTrainer):
    """Trainer for a SPOCO model (arXiv:2103.14572)."""

    def __init__(
        self,
        model=None,
        momentum: float = 0.999,
        semisupervised_loss=None,
        semisupervised_loader=None,
        logger=TensorboardLogger,
        **kwargs,
    ):
        super().__init__(model=model, logger=logger, **kwargs)
        self.momentum = momentum
        assert (semisupervised_loss is None) == (semisupervised_loader is None)
        self.semisupervised_loader = semisupervised_loader
        self.semisupervised_loss = semisupervised_loss
        self.variables2 = None
        self._kwargs = {
            "momentum": momentum, "semisupervised_loss": semisupervised_loss,
            "semisupervised_loader": semisupervised_loader,
        }

    def _initialize(self, iterations, load_from_checkpoint, epochs=None):
        best_metric = super()._initialize(iterations, load_from_checkpoint, epochs)
        if self.variables2 is None:
            # materialized copy so step donation never aliases the two trees
            self.variables2 = jax.tree_util.tree_map(
                jnp.copy, jax.device_put(self.variables, self.device)
            )
        return best_metric

    def _build_steps(self):
        module = self._module_for_compute()
        tx = self._tx
        momentum = self.momentum

        def apply(variables, x, train):
            out = module.apply(variables, x, train=train)
            return out

        def train_step(variables, variables2, opt_state, x, y, rng):
            params = variables["params"]
            state = {k: v for k, v in variables.items() if k != "params"}

            pred2 = jax.lax.stop_gradient(apply(variables2, x, False))

            def loss_fn(p):
                v = {"params": p, **state}
                mutable = list(state.keys()) if state else False
                out = module.apply(v, x, train=True, rngs={"dropout": rng}, mutable=mutable)
                pred, new_state = out if mutable else (out, state)
                if getattr(self.loss, "needs_rng", False):
                    loss = self.loss((pred, pred2), y, rng=rng)
                else:
                    loss = self.loss((pred, pred2), y)
                return loss, (pred, new_state)

            (loss, (pred, new_state)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            grads = self._reduce_grads(grads)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
            new_variables = {"params": params, **new_state}
            # EMA update of the second network, fused into the step
            variables2 = jax.tree_util.tree_map(
                lambda t, s: t * momentum + s * (1.0 - momentum), variables2, new_variables
            )
            return new_variables, variables2, opt_state, loss, pred

        def semisup_step(variables, variables2, opt_state, x, rng):
            params = variables["params"]
            state = {k: v for k, v in variables.items() if k != "params"}
            pred2 = jax.lax.stop_gradient(apply(variables2, x, False))

            def loss_fn(p):
                pred = apply({"params": p, **state}, x, True)
                if getattr(self.semisupervised_loss, "needs_rng", False):
                    return self.semisupervised_loss(pred, pred2, rng=rng)
                return self.semisupervised_loss(pred, pred2)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            grads = self._reduce_grads(grads)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
            new_variables = {"params": params, **state}
            variables2 = jax.tree_util.tree_map(
                lambda t, s: t * momentum + s * (1.0 - momentum), variables2, new_variables
            )
            return new_variables, variables2, opt_state, loss

        def val_step(variables, variables2, x, y):
            pred = apply(variables, x, False)
            pred2 = apply(variables2, x, False)
            if getattr(self.loss, "needs_rng", False):
                loss = self.loss((pred, pred2), y, rng=jax.random.PRNGKey(0))
            else:
                loss = self.loss((pred, pred2), y)
            if self.metric is not None and not getattr(self.metric, "host_metric", False):
                metric = self.metric(pred, y)
            else:
                metric = loss
            return loss, metric, pred

        self._train_step = jax.jit(train_step, donate_argnums=(0, 1, 2))
        self._semisup_step = jax.jit(semisup_step, donate_argnums=(0, 1, 2))
        self._val_step = jax.jit(val_step)

    def _train_epoch(self, progress, **unused_profiling_kwargs):
        n_iter = 0
        t_per_iter = time.time()
        lr = get_learning_rate(self.opt_state)
        for x, y in self.train_loader:
            x = self._to_device(x)
            y = self._to_device(y)
            self.variables, self.variables2, self.opt_state, loss, pred = self._train_step(
                self.variables, self.variables2, self.opt_state, x, y, self._next_rng()
            )
            if self.logger is not None:
                self.logger.log_train(self._iteration, np.asarray(loss), lr, x, y, pred)
            self._iteration += 1
            n_iter += 1
            if progress is not None:
                progress.update(1)
            if self._iteration >= self.max_iteration:
                break

        if self.semisupervised_loader is not None:
            for x in self.semisupervised_loader:
                x = self._to_device(x)
                self.variables, self.variables2, self.opt_state, _ = self._semisup_step(
                    self.variables, self.variables2, self.opt_state, x, self._next_rng()
                )

        t_per_iter = (time.time() - t_per_iter) / max(n_iter, 1)
        return t_per_iter

    def _validate(self):
        metric_list, loss_list = [], []
        last = None
        for x, y in self.val_loader:
            x = self._to_device(x)
            y = self._to_device(y)
            loss, metric, pred = self._val_step(self.variables, self.variables2, x, y)
            if self.metric is not None and getattr(self.metric, "host_metric", False):
                metric = self.metric(np.asarray(pred), np.asarray(y))
            metric_list.append(metric)
            loss_list.append(loss)
            last = (x, y, pred)
        metric_val = float(np.mean([np.asarray(m) for m in metric_list]))
        loss_val = float(np.mean([np.asarray(l) for l in loss_list]))
        if self.logger is not None and last is not None:
            self.logger.log_validation(self._iteration, metric_val, loss_val, *last)
        return metric_val

    def save_checkpoint(self, name, current_metric, best_metric, **extra_save_dict):
        super().save_checkpoint(
            name, current_metric, best_metric,
            model2_state=flax_serialization.to_state_dict(jax.device_get(self.variables2)),
            **extra_save_dict,
        )

    def load_checkpoint(self, checkpoint="best"):
        save_dict = super().load_checkpoint(checkpoint)
        if "model2_state" in save_dict:
            variables2 = flax_serialization.from_state_dict(
                jax.device_get(self.model.variables), save_dict["model2_state"]
            )
            self.variables2 = jax.device_put(variables2, self.device)
        return save_dict
