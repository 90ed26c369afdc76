"""Classification trainer (reference torch_em/classification/classification_trainer.py:8).

Overrides validation to compute sklearn-style metrics on argmax predictions
collected over the whole validation set.
"""

import warnings

import numpy as np

from ..trainer.default_trainer import DefaultTrainer

__all__ = ["ClassificationTrainer"]


class ClassificationTrainer(DefaultTrainer):
    """DefaultTrainer with sklearn-metric validation on argmax predictions."""

    def _build_steps(self):
        import jax

        module = self._module_for_compute()
        tx = self._tx

        def train_step(variables, opt_state, x, y, rng):
            params = variables["params"]
            state = {k: v for k, v in variables.items() if k != "params"}

            def loss_fn(p):
                mutable = list(state.keys()) if state else False
                out = module.apply({"params": p, **state}, x, train=True,
                                   rngs={"dropout": rng}, mutable=mutable)
                pred, new_state = out if mutable else (out, state)
                return self.loss(pred, y), (pred, new_state)

            (loss, (pred, new_state)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            grads = self._reduce_grads(grads)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
            return {"params": params, **new_state}, opt_state, loss, pred

        def val_step(variables, x, y):
            pred = module.apply(variables, x, train=False)
            loss = self.loss(pred, y)
            return loss, pred

        self._train_step = jax.jit(train_step, donate_argnums=(0, 1))
        self._val_step = jax.jit(val_step)

    def _validate(self):
        loss_val = 0.0
        y_true, y_pred = [], []
        last = None
        for x, y in self.val_loader:
            x_d, y_d = self._to_device(x), self._to_device(y)
            loss, pred = self._val_step(self.variables, x_d, y_d)
            loss_val += float(np.asarray(loss))
            pred_np = np.asarray(pred)
            y_true.append(np.asarray(y))
            y_pred.append(pred_np.argmax(axis=1))
            last = (x_d, y_d, pred_np)
        if np.isnan(last[2]).any():
            warnings.warn("Predictions are NaN")
        loss_val /= len(self.val_loader)
        y_true, y_pred = np.concatenate(y_true), np.concatenate(y_pred)
        metric_val = self.metric(y_true, y_pred)
        if self.logger is not None:
            self.logger.log_validation(self._iteration, metric_val, loss_val, *last,
                                       y_true=y_true, y_pred=y_pred)
        return metric_val
