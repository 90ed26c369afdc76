"""Pseudo-labelers for self-training (reference torch_em/self_training/pseudo_labeling.py).

A pseudo-labeler is called as ``pseudo_labeler(teacher_apply, input_)`` inside
the jitted training step, where ``teacher_apply`` is the traced forward of the
teacher network. It returns (pseudo_labels, label_filter). The confidence
threshold can be scheduled from the host (``ScheduledPseudoLabeler``); the
trainer passes the current value as a traced scalar so threshold changes never
retrace the step.
"""

from typing import Callable, Optional

import jax
import jax.numpy as jnp

__all__ = ["DefaultPseudoLabeler", "ProbabilisticPseudoLabeler", "ScheduledPseudoLabeler"]


class DefaultPseudoLabeler:
    """Pseudo-labels = activated teacher predictions, optionally masked by a
    confidence threshold (reference pseudo_labeling.py:7)."""

    def __init__(self, activation: Optional[Callable] = None, confidence_threshold: Optional[float] = None,
                 threshold_from_both_sides: bool = True, mask_channel: Optional[int] = None):
        self.activation = activation
        self.confidence_threshold = confidence_threshold
        self.threshold_from_both_sides = threshold_from_both_sides
        self.mask_channel = mask_channel
        self.init_kwargs = {
            "activation": None, "confidence_threshold": confidence_threshold,
            "threshold_from_both_sides": threshold_from_both_sides, "mask_channel": mask_channel,
        }

    def _mask_both_sides(self, pseudo_labels, ct):
        return ((pseudo_labels >= ct) | (pseudo_labels <= 1.0 - ct)).astype(jnp.float32)

    def _mask_one_side(self, pseudo_labels, ct):
        return (pseudo_labels >= ct).astype(jnp.float32)

    def __call__(self, teacher_apply: Callable, input_, confidence_threshold=None):
        pseudo_labels = teacher_apply(input_)
        if self.activation is not None:
            pseudo_labels = self.activation(pseudo_labels)
        ct = self.confidence_threshold if confidence_threshold is None else confidence_threshold
        if ct is None:
            return pseudo_labels, None
        mask_input = pseudo_labels if self.mask_channel is None \
            else pseudo_labels[:, self.mask_channel:(self.mask_channel + 1)]
        label_mask = self._mask_both_sides(mask_input, ct) if self.threshold_from_both_sides \
            else self._mask_one_side(mask_input, ct)
        if self.mask_channel is not None:
            label_mask = jnp.broadcast_to(label_mask, pseudo_labels.shape)
        return pseudo_labels, label_mask

    def step(self, metric, epoch):
        pass


class ProbabilisticPseudoLabeler:
    """Pseudo-labels from prior samples of a Probabilistic U-Net
    (reference pseudo_labeling.py:78): the consensus over ``prior_samples``
    samples gives the labels, agreement gives the filter."""

    needs_rng = True

    def __init__(self, activation: Optional[Callable] = None, confidence_threshold: Optional[float] = None,
                 threshold_from_both_sides: bool = True, prior_samples: int = 16,
                 consensus_masking: bool = False):
        self.activation = activation
        self.confidence_threshold = confidence_threshold
        self.threshold_from_both_sides = threshold_from_both_sides
        self.prior_samples = prior_samples
        self.consensus_masking = consensus_masking
        self.init_kwargs = {
            "activation": None, "confidence_threshold": confidence_threshold,
            "threshold_from_both_sides": threshold_from_both_sides,
            "prior_samples": prior_samples, "consensus_masking": consensus_masking,
        }

    def __call__(self, teacher_sample: Callable, input_, confidence_threshold=None, rng=None):
        """``teacher_sample(input_, rng)`` must draw one prior sample."""
        if rng is None:
            rng = jax.random.PRNGKey(0)
        keys = jax.random.split(rng, self.prior_samples)
        samples = jnp.stack([teacher_sample(input_, k) for k in keys])
        if self.activation is not None:
            samples = self.activation(samples)
        pseudo_labels = jnp.mean(samples, axis=0)

        ct = self.confidence_threshold if confidence_threshold is None else confidence_threshold
        if ct is None:
            return pseudo_labels, None
        if self.threshold_from_both_sides:
            masks = ((samples >= ct) | (samples <= 1.0 - ct)).astype(jnp.float32)
        else:
            masks = (samples >= ct).astype(jnp.float32)
        if self.consensus_masking:
            label_mask = jnp.prod(masks, axis=0)  # complete agreement
        else:
            label_mask = jnp.mean(masks, axis=0)  # weighted consensus
        return pseudo_labels, label_mask

    def step(self, metric, epoch):
        pass


class ScheduledPseudoLabeler(DefaultPseudoLabeler):
    """DefaultPseudoLabeler with a metric/epoch-driven threshold schedule
    (reference pseudo_labeling.py:160). ``step`` runs on the host after each
    validation; the trainer feeds the current threshold into the jitted step
    as a traced scalar."""

    def __init__(self, activation=None, confidence_threshold: Optional[float] = None,
                 threshold_from_both_sides: bool = True, mask_channel: Optional[int] = None,
                 mode: str = "min", factor: float = 0.05, patience: int = 10,
                 threshold: float = 1e-4, threshold_mode: str = "rel",
                 min_ct: float = 0.5, verbose: bool = False):
        super().__init__(activation, confidence_threshold, threshold_from_both_sides, mask_channel)
        assert mode in ("min", "max")
        assert threshold_mode in ("rel", "abs")
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.threshold_mode = threshold_mode
        self.min_ct = min_ct
        self.verbose = verbose
        self.best = None
        self.num_bad_epochs = 0
        self.init_kwargs.update({
            "mode": mode, "factor": factor, "patience": patience, "threshold": threshold,
            "threshold_mode": threshold_mode, "min_ct": min_ct, "verbose": verbose,
        })

    def _is_better(self, current):
        if self.best is None:
            return True
        if self.threshold_mode == "rel":
            if self.mode == "min":
                return current < self.best * (1.0 - self.threshold)
            return current > self.best * (1.0 + self.threshold)
        if self.mode == "min":
            return current < self.best - self.threshold
        return current > self.best + self.threshold

    def step(self, metric, epoch):
        metric = float(metric)
        if self._is_better(metric):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.num_bad_epochs > self.patience:
            self.num_bad_epochs = 0
            if self.confidence_threshold is not None:
                new_ct = max(self.confidence_threshold - self.factor, self.min_ct)
                if self.verbose and new_ct < self.confidence_threshold:
                    print(f"ScheduledPseudoLabeler: reducing confidence threshold to {new_ct}")
                self.confidence_threshold = new_ct
