"""MeanTeacher self-training / domain adaptation.

Rebuild of torch_em/self_training/mean_teacher.py:17 (Tarvainen & Valpola,
arXiv:1703.01780): an EMA teacher predicts pseudo-labels on unlabeled data;
supports unsupervised-only and joint (semi-supervised) epochs; EMA warmup when
the teacher is re-initialized (:165-175); optional batch-rejection sampler
(:236-239); teacher state in checkpoints (:181-200).

TPU-first: teacher pseudo-labeling and the student update are two jitted
steps (pseudo labels stay on device unless the sampler needs them); the EMA
update is fused into the student step with the warmup momentum passed as a
traced scalar.
"""

import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization as flax_serialization

from ..trainer.default_trainer import DefaultTrainer
from ..trainer.optimizers import get_learning_rate
from .logger import SelfTrainingTensorboardLogger

__all__ = ["Dummy", "MeanTeacherTrainer", "MeanTeacherTrainerWithInvertibleAugmentations"]


class Dummy:
    """Placeholder loss/metric (reference mean_teacher.py Dummy); the actual
    losses live in the self-training loss arguments."""

    init_kwargs = {}

    def __init__(self, **kwargs):
        pass

    def __call__(self, *args, **kwargs):
        raise RuntimeError("Dummy loss should never be called.")


class MeanTeacherTrainer(DefaultTrainer):
    """Trainer for MeanTeacher semi-supervised learning / domain adaptation."""

    def __init__(
        self,
        model=None,
        unsupervised_train_loader=None,
        unsupervised_loss=None,
        pseudo_labeler=None,
        supervised_train_loader=None,
        unsupervised_val_loader=None,
        supervised_val_loader=None,
        supervised_loss: Optional[Callable] = None,
        unsupervised_loss_and_metric: Optional[Callable] = None,
        supervised_loss_and_metric: Optional[Callable] = None,
        logger=SelfTrainingTensorboardLogger,
        momentum: float = 0.999,
        reinit_teacher: Optional[bool] = None,
        sampler: Optional[Callable] = None,
        **kwargs,
    ):
        self.sampler = sampler
        if supervised_train_loader is None:
            train_loader = unsupervised_train_loader
            self._semisupervised = False
        else:
            assert supervised_loss is not None
            train_loader = supervised_train_loader \
                if len(supervised_train_loader) < len(unsupervised_train_loader) \
                else unsupervised_train_loader
            self._semisupervised = True

        self.unsupervised_train_loader = unsupervised_train_loader
        self.supervised_train_loader = supervised_train_loader

        assert sum((supervised_val_loader is not None, unsupervised_val_loader is not None)) > 0
        self.supervised_val_loader = supervised_val_loader
        self.unsupervised_val_loader = unsupervised_val_loader
        val_loader = supervised_val_loader if unsupervised_val_loader is None else unsupervised_val_loader

        assert sum((
            supervised_loss_and_metric is not None, unsupervised_loss_and_metric is not None,
        )) > 0
        self.supervised_loss_and_metric = supervised_loss_and_metric
        self.unsupervised_loss_and_metric = unsupervised_loss_and_metric

        kwargs.pop("train_loader", None)
        kwargs.pop("val_loader", None)
        kwargs.pop("metric", None)
        kwargs.pop("loss", None)
        super().__init__(
            model=model, train_loader=train_loader, val_loader=val_loader,
            loss=Dummy(), metric=Dummy(), logger=logger, **kwargs
        )

        self.unsupervised_loss = unsupervised_loss
        self.supervised_loss = supervised_loss
        self.pseudo_labeler = pseudo_labeler
        self.momentum = momentum
        self.reinit_teacher = (supervised_train_loader is not None) if reinit_teacher is None \
            else reinit_teacher

        self.teacher_variables = None
        self._kwargs = {
            "unsupervised_train_loader": unsupervised_train_loader,
            "unsupervised_loss": unsupervised_loss, "pseudo_labeler": pseudo_labeler,
            "supervised_train_loader": supervised_train_loader,
            "unsupervised_val_loader": unsupervised_val_loader,
            "supervised_val_loader": supervised_val_loader, "supervised_loss": supervised_loss,
            "unsupervised_loss_and_metric": unsupervised_loss_and_metric,
            "supervised_loss_and_metric": supervised_loss_and_metric,
            "momentum": momentum, "reinit_teacher": reinit_teacher, "sampler": sampler,
        }

    # -------------------------------------------------------------- teacher
    def _init_teacher(self):
        if self.reinit_teacher:
            fresh = self.model.initialize(rng=jax.random.PRNGKey(self.seed + 1))
            self.teacher_variables = jax.device_put(fresh, self.device)
        else:
            # materialized copy: step donation must never alias student/teacher
            self.teacher_variables = jax.tree_util.tree_map(
                jnp.copy, jax.device_put(self.variables, self.device)
            )

    def _initialize(self, iterations, load_from_checkpoint, epochs=None):
        best_metric = super()._initialize(iterations, load_from_checkpoint, epochs)
        if self.teacher_variables is None:
            self._init_teacher()
        return best_metric

    def _current_momentum(self):
        if self.reinit_teacher:
            # fast teacher updates early on to close the init gap
            return min(1 - 1 / (self._iteration + 1), self.momentum)
        return self.momentum

    # --------------------------------------------------------------- steps
    def _build_steps(self):
        module = self._module_for_compute()
        tx = self._tx
        ct0 = self.pseudo_labeler.confidence_threshold

        def apply(variables, x, train=False, rng=None):
            rngs = {"dropout": rng} if (train and rng is not None) else None
            return module.apply(variables, x, train=train, rngs=rngs)

        def pseudo_label_step(teacher_variables, xu1, ct, rng):
            teacher_apply = lambda inp: apply(teacher_variables, inp, train=False)
            kwargs = {}
            if getattr(self.pseudo_labeler, "needs_rng", False):
                kwargs["rng"] = rng
            return self.pseudo_labeler(
                teacher_apply, xu1, confidence_threshold=None if ct0 is None else ct, **kwargs
            )

        def unsup_step(variables, teacher_variables, opt_state, xu2, pseudo_labels, label_filter,
                       rng, cur_momentum):
            params = variables["params"]
            state = {k: v for k, v in variables.items() if k != "params"}

            def loss_fn(p):
                student_apply = lambda inp: apply({"params": p, **state}, inp, train=True, rng=rng)
                return self.unsupervised_loss(
                    student_apply, xu2, jax.lax.stop_gradient(pseudo_labels),
                    None if label_filter is None else jax.lax.stop_gradient(label_filter), rng=rng,
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

        def semisup_step(variables, teacher_variables, opt_state, xs, ys, xu2,
                         pseudo_labels, label_filter, rng, cur_momentum):
            params = variables["params"]
            state = {k: v for k, v in variables.items() if k != "params"}

            def loss_fn(p):
                student_apply = lambda inp: apply({"params": p, **state}, inp, train=True, rng=rng)
                sup = self.supervised_loss(student_apply, xs, ys, rng=rng)
                unsup = self.unsupervised_loss(
                    student_apply, xu2, jax.lax.stop_gradient(pseudo_labels),
                    None if label_filter is None else jax.lax.stop_gradient(label_filter), rng=rng,
                )
                return (sup + unsup) / 2, (sup, unsup)

            (loss, (sup, unsup)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            grads = self._reduce_grads(grads)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
            variables = {"params": params, **state}
            teacher_variables = jax.tree_util.tree_map(
                lambda t, s: t * cur_momentum + s * (1.0 - cur_momentum), teacher_variables, variables
            )
            return variables, teacher_variables, opt_state, loss, sup, unsup

        def unsup_val_step(variables, teacher_variables, xu1, xu2, ct, rng):
            pseudo_labels, label_filter = pseudo_label_step(teacher_variables, xu1, ct, rng)
            student_apply = lambda inp: apply(variables, inp, train=False)
            loss, metric = self.unsupervised_loss_and_metric(
                student_apply, xu2, pseudo_labels, label_filter, rng=rng
            )
            return loss, metric, student_apply(xu2), pseudo_labels, label_filter

        def sup_val_step(variables, x, y):
            student_apply = lambda inp: apply(variables, inp, train=False)
            loss, metric = self.supervised_loss_and_metric(student_apply, x, y)
            return loss, metric, student_apply(x)

        self._pseudo_label_step = jax.jit(pseudo_label_step)
        self._unsup_step = jax.jit(unsup_step, donate_argnums=(0, 1, 2))
        self._semisup_step = jax.jit(semisup_step, donate_argnums=(0, 1, 2))
        self._unsup_val_step = jax.jit(unsup_val_step)
        self._sup_val_step = jax.jit(sup_val_step)
        self._val_step = None  # validation overridden below

    def _ct(self):
        ct = self.pseudo_labeler.confidence_threshold
        return jnp.float32(0.0 if ct is None else ct)

    # ------------------------------------------------------------ training
    def _train_epoch(self, progress, **unused_profiling_kwargs):
        if self._semisupervised:
            return self._train_epoch_semisupervised(progress)
        return self._train_epoch_unsupervised(progress)

    def _train_epoch_unsupervised(self, progress):
        n_iter = 0
        t_start = time.time()
        lr = get_learning_rate(self.opt_state)
        for xu1, xu2 in self.unsupervised_train_loader:
            xu1 = self._to_device(xu1)
            xu2 = self._to_device(xu2)
            rng = self._next_rng()
            pseudo_labels, label_filter = self._pseudo_label_step(
                self.teacher_variables, xu1, self._ct(), rng
            )
            if self.sampler is not None:
                if not self.sampler(np.asarray(pseudo_labels),
                                    None if label_filter is None else np.asarray(label_filter)):
                    continue
            self.variables, self.teacher_variables, self.opt_state, loss = self._unsup_step(
                self.variables, self.teacher_variables, self.opt_state, xu2,
                pseudo_labels, label_filter, rng, jnp.float32(self._current_momentum()),
            )
            if self.logger is not None:
                self.logger.log_train_unsupervised(
                    self._iteration, np.asarray(loss), xu1, xu2, None, pseudo_labels, label_filter
                )
                self.logger.log_lr(self._iteration, lr)
                if self.pseudo_labeler.confidence_threshold is not None:
                    self.logger.log_ct(self._iteration, self.pseudo_labeler.confidence_threshold)
            self._iteration += 1
            n_iter += 1
            if progress is not None:
                progress.update(1)
            if self._iteration >= self.max_iteration:
                break
        return (time.time() - t_start) / max(n_iter, 1)

    def _train_epoch_semisupervised(self, progress):
        n_iter = 0
        t_start = time.time()
        lr = get_learning_rate(self.opt_state)
        for (xs, ys), (xu1, xu2) in zip(self.supervised_train_loader, self.unsupervised_train_loader):
            xs, ys = self._to_device(xs), self._to_device(ys)
            xu1, xu2 = self._to_device(xu1), self._to_device(xu2)
            rng = self._next_rng()
            pseudo_labels, label_filter = self._pseudo_label_step(
                self.teacher_variables, xu1, self._ct(), rng
            )
            (self.variables, self.teacher_variables, self.opt_state,
             loss, sup_loss, unsup_loss) = self._semisup_step(
                self.variables, self.teacher_variables, self.opt_state, xs, ys, xu2,
                pseudo_labels, label_filter, rng, jnp.float32(self._current_momentum()),
            )
            if self.logger is not None:
                self.logger.log_train_supervised(self._iteration, np.asarray(sup_loss), xs, ys, None)
                self.logger.log_train_unsupervised(
                    self._iteration, np.asarray(unsup_loss), xu1, xu2, None, pseudo_labels, label_filter
                )
                self.logger.log_combined_loss(self._iteration, np.asarray(loss))
                self.logger.log_lr(self._iteration, lr)
            self._iteration += 1
            n_iter += 1
            if progress is not None:
                progress.update(1)
            if self._iteration >= self.max_iteration:
                break
        return (time.time() - t_start) / max(n_iter, 1)

    # ---------------------------------------------------------- validation
    def _validate(self):
        supervised_metric = None
        unsupervised_metric = None

        if self.supervised_val_loader is not None:
            losses, metrics = [], []
            last = None
            for x, y in self.supervised_val_loader:
                x, y = self._to_device(x), self._to_device(y)
                loss, metric, pred = self._sup_val_step(self.variables, x, y)
                losses.append(loss)
                metrics.append(metric)
                last = (x, y, pred)
            supervised_metric = float(np.mean([np.asarray(m) for m in metrics]))
            if self.logger is not None and last is not None:
                self.logger.log_validation_supervised(
                    self._iteration, supervised_metric,
                    float(np.mean([np.asarray(l) for l in losses])), *last,
                )

        if self.unsupervised_val_loader is not None:
            losses, metrics = [], []
            last = None
            for x1, x2 in self.unsupervised_val_loader:
                x1, x2 = self._to_device(x1), self._to_device(x2)
                loss, metric, pred, pseudo, filt = self._unsup_val_step(
                    self.variables, self.teacher_variables, x1, x2, self._ct(), self._next_rng()
                )
                losses.append(loss)
                metrics.append(metric)
                last = (x1, x2, pred, pseudo, filt)
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

    # --------------------------------------------------------- checkpoints
    def save_checkpoint(self, name, current_metric, best_metric, **extra_save_dict):
        super().save_checkpoint(
            name, current_metric, best_metric,
            teacher_state=flax_serialization.to_state_dict(jax.device_get(self.teacher_variables)),
            **extra_save_dict,
        )

    def load_checkpoint(self, checkpoint="best"):
        save_dict = super().load_checkpoint(checkpoint)
        if "teacher_state" in save_dict:
            teacher = flax_serialization.from_state_dict(
                jax.device_get(self.model.variables), save_dict["teacher_state"]
            )
            self.teacher_variables = jax.device_put(teacher, self.device)
        return save_dict


class MeanTeacherTrainerWithInvertibleAugmentations(MeanTeacherTrainer):
    """MeanTeacher with invertible geometric augmentations: student inputs are
    warped, predictions inverse-warped before the loss (reference
    mean_teacher.py:402)."""

    def __init__(self, augmenter=None, **kwargs):
        super().__init__(**kwargs)
        self.augmenter = augmenter
        self._kwargs["augmenter"] = augmenter

    def _build_steps(self):
        super()._build_steps()
        if self.augmenter is None:
            return
        module = self._module_for_compute()
        tx = self._tx
        augmenter = self.augmenter

        def unsup_step(variables, teacher_variables, opt_state, xu2, pseudo_labels, label_filter,
                       rng, cur_momentum):
            params = variables["params"]
            state = {k: v for k, v in variables.items() if k != "params"}
            rng_aug, rng_loss = jax.random.split(rng)

            def loss_fn(p):
                def student_apply(inp):
                    warped, aug_params = augmenter.forward(rng_aug, inp)
                    pred = module.apply({"params": p, **state}, warped, train=True)
                    return augmenter.inverse(pred, aug_params)

                return self.unsupervised_loss(
                    student_apply, xu2, jax.lax.stop_gradient(pseudo_labels),
                    None if label_filter is None else jax.lax.stop_gradient(label_filter),
                    rng=rng_loss,
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

        self._unsup_step = jax.jit(unsup_step, donate_argnums=(0, 1, 2))
