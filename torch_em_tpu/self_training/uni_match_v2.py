"""UniMatch v2 self-training (reference torch_em/self_training/uni_match_v2.py:9).

UniMatch v2 (arXiv:2410.10777): an EMA teacher predicts pseudo-labels on a
weakly augmented view; the student is trained on TWO strong views, with the
loss averaged over both against the shared pseudo-label. All three views and
their inverse warps are produced inside the jitted step by a
``UniMatchv2Augmenters`` bundle.
"""

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..trainer.optimizers import get_learning_rate
from .mean_teacher import MeanTeacherTrainerWithInvertibleAugmentations

__all__ = ["UniMatchv2Trainer", "DefaultUnimatchLoss", "DefaultUnimatchLossAndMetric"]


class DefaultUnimatchLoss:
    """Loss averaged over stacked student views (reference self_training/loss.py:272)."""

    def __init__(self, loss=None, activation=None):
        from ..loss import DiceLoss

        self.loss = DiceLoss() if loss is None else loss
        self.activation = activation
        self.init_kwargs = {"loss": self.loss, "activation": activation}

    def __call__(self, predictions, pseudo_labels, label_filter=None, pred_dim: int = 2, rng=None):
        total = 0.0
        n = predictions.shape[0]
        for v in range(n):
            pred = predictions[v]
            if self.activation is not None:
                pred = self.activation(pred)
            if label_filter is None:
                total = total + self.loss(pred, pseudo_labels)
            else:
                total = total + self.loss(pred * label_filter, pseudo_labels * label_filter)
        return total / n


class DefaultUnimatchLossAndMetric:
    """Loss and metric over stacked views (reference self_training/loss.py:335)."""

    def __init__(self, loss=None, metric=None, activation=None):
        from ..loss import DiceLoss

        self.loss = DiceLoss() if loss is None else loss
        self.metric = DiceLoss() if metric is None else metric
        self.activation = activation
        self.init_kwargs = {"loss": self.loss, "metric": self.metric, "activation": activation}

    def __call__(self, predictions, pseudo_labels, label_filter=None, pred_dim: int = 2, rng=None):
        loss = DefaultUnimatchLoss(self.loss, self.activation)(
            predictions, pseudo_labels, label_filter, pred_dim
        )
        pred = predictions[0]
        if self.activation is not None:
            pred = self.activation(pred)
        return loss, self.metric(pred, pseudo_labels)


class UniMatchv2Trainer(MeanTeacherTrainerWithInvertibleAugmentations):
    """Trainer for UniMatch v2 semi-supervised learning / domain adaptation.

    The unsupervised loader yields a single raw view per sample; the weak and
    two strong views are generated inside the jitted step by the augmenter.
    """

    def __init__(self, augmenter=None, complementary_dropout: bool = False, **kwargs):
        super().__init__(augmenter=augmenter, **kwargs)
        assert augmenter is not None, "UniMatchv2Trainer requires a UniMatchv2Augmenters instance."
        self.complementary_dropout = complementary_dropout
        self._kwargs["complementary_dropout"] = complementary_dropout

    def _build_steps(self):
        # build the base (sup/val) steps, then override the unsupervised one
        super(MeanTeacherTrainerWithInvertibleAugmentations, self)._build_steps()
        module = self._module_for_compute()
        tx = self._tx
        augmenter = self.augmenter
        ct0 = self.pseudo_labeler.confidence_threshold

        def unimatch_step(variables, teacher_variables, opt_state, x_u, ct, rng, cur_momentum):
            params = variables["params"]
            state = {k: v for k, v in variables.items() if k != "params"}
            rng_w, rng_s1, rng_s2, rng_loss = jax.random.split(rng, 4)

            # weak view + teacher pseudo labels, inverse-warped to the reference frame
            x_u_w, w_params = augmenter.weak.forward(rng_w, x_u)
            teacher_apply = lambda inp: module.apply(teacher_variables, inp, train=False)
            pseudo_labels, label_filter = self.pseudo_labeler(
                teacher_apply, x_u_w, confidence_threshold=None if ct0 is None else ct
            )
            pseudo_labels = jax.lax.stop_gradient(augmenter.weak.inverse(pseudo_labels, w_params))
            if label_filter is not None:
                label_filter = jax.lax.stop_gradient(augmenter.weak.inverse(label_filter, w_params))

            x_u_s1, s1_params = augmenter.strong1.forward(rng_s1, x_u)
            x_u_s2, s2_params = augmenter.strong2.forward(rng_s2, x_u)

            def loss_fn(p):
                v = {"params": p, **state}
                both = jnp.concatenate([x_u_s1, x_u_s2], axis=0)
                preds = module.apply(v, both, train=True)
                n = x_u.shape[0]
                pred_s1 = augmenter.strong1.inverse(preds[:n], s1_params)
                pred_s2 = augmenter.strong2.inverse(preds[n:], s2_params)
                return self.unsupervised_loss(
                    jnp.stack([pred_s1, pred_s2]), pseudo_labels, label_filter,
                    pred_dim=2, rng=rng_loss,
                )

            loss, grads = jax.value_and_grad(loss_fn)(params)
            grads = self._reduce_grads(grads)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
            variables = {"params": params, **state}
            teacher_variables = jax.tree_util.tree_map(
                lambda t, s: t * cur_momentum + s * (1.0 - cur_momentum), teacher_variables, variables
            )
            return variables, teacher_variables, opt_state, loss

        def unimatch_val_step(variables, teacher_variables, x_u, ct, rng):
            rng_w, rng_s1, rng_s2, rng_loss = jax.random.split(rng, 4)
            x_u_w, w_params = augmenter.weak.forward(rng_w, x_u)
            teacher_apply = lambda inp: module.apply(teacher_variables, inp, train=False)
            pseudo_labels, label_filter = self.pseudo_labeler(
                teacher_apply, x_u_w, confidence_threshold=None if ct0 is None else ct
            )
            pseudo_labels = augmenter.weak.inverse(pseudo_labels, w_params)
            if label_filter is not None:
                label_filter = augmenter.weak.inverse(label_filter, w_params)
            x_u_s1, s1_params = augmenter.strong1.forward(rng_s1, x_u)
            x_u_s2, s2_params = augmenter.strong2.forward(rng_s2, x_u)
            both = jnp.concatenate([x_u_s1, x_u_s2], axis=0)
            preds = module.apply(variables, both, train=False)
            n = x_u.shape[0]
            pred_s1 = augmenter.strong1.inverse(preds[:n], s1_params)
            pred_s2 = augmenter.strong2.inverse(preds[n:], s2_params)
            loss, metric = self.unsupervised_loss_and_metric(
                jnp.stack([pred_s1, pred_s2]), pseudo_labels, label_filter, pred_dim=2, rng=rng_loss,
            )
            return loss, metric, pred_s1, pseudo_labels, label_filter

        self._unimatch_step = jax.jit(unimatch_step, donate_argnums=(0, 1, 2))
        self._unimatch_val_step = jax.jit(unimatch_val_step)

    def _train_epoch_unsupervised(self, progress):
        n_iter = 0
        t_start = time.time()
        lr = get_learning_rate(self.opt_state)
        for x_u in self.unsupervised_train_loader:
            if isinstance(x_u, (tuple, list)):
                x_u = x_u[0]
            x_u = self._to_device(x_u)
            self.variables, self.teacher_variables, self.opt_state, loss = self._unimatch_step(
                self.variables, self.teacher_variables, self.opt_state, x_u,
                self._ct(), self._next_rng(), jnp.float32(self._current_momentum()),
            )
            if self.logger is not None:
                self.logger.log_train_unsupervised(self._iteration, np.asarray(loss), x_u, x_u, None)
                self.logger.log_lr(self._iteration, lr)
            self._iteration += 1
            n_iter += 1
            if progress is not None:
                progress.update(1)
            if self._iteration >= self.max_iteration:
                break
        return (time.time() - t_start) / max(n_iter, 1)

    def _validate(self):
        supervised_metric = None
        unsupervised_metric = None

        if self.supervised_val_loader is not None:
            losses, metrics = [], []
            for x, y in self.supervised_val_loader:
                x, y = self._to_device(x), self._to_device(y)
                loss, metric, _ = self._sup_val_step(self.variables, x, y)
                losses.append(loss)
                metrics.append(metric)
            supervised_metric = float(np.mean([np.asarray(m) for m in metrics]))

        if self.unsupervised_val_loader is not None:
            losses, metrics = [], []
            last = None
            for x_u in self.unsupervised_val_loader:
                if isinstance(x_u, (tuple, list)):
                    x_u = x_u[0]
                x_u = self._to_device(x_u)
                loss, metric, pred, pseudo, filt = self._unimatch_val_step(
                    self.variables, self.teacher_variables, x_u, self._ct(), self._next_rng()
                )
                losses.append(loss)
                metrics.append(metric)
                last = (x_u, x_u, pred, pseudo, filt)
            unsupervised_metric = float(np.mean([np.asarray(m) for m in metrics]))
            if self.logger is not None and last is not None:
                self.logger.log_validation_unsupervised(
                    self._iteration, unsupervised_metric,
                    float(np.mean([np.asarray(l) for l in losses])), *last,
                )
            self.pseudo_labeler.step(unsupervised_metric, self._epoch)

        if unsupervised_metric is None:
            return supervised_metric
        if supervised_metric is None:
            return unsupervised_metric
        return (supervised_metric + unsupervised_metric) / 2
