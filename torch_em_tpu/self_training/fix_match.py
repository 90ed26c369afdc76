"""FixMatch self-training (reference torch_em/self_training/fix_match.py:13).

FixMatch (arXiv:2001.07685) uses the SAME network for pseudo-labeling (weak
augmentation view, xu1) and student training (strong view, xu2) — no EMA
teacher. Optional distribution alignment scales pseudo-labels so their
marginal matches a given source label distribution (reference :165-181).
"""

from typing import Callable, List, Optional

import jax
import jax.numpy as jnp

from .mean_teacher import MeanTeacherTrainer

__all__ = ["FixMatchTrainer", "FixMatchTrainerWithInvertibleAugmentations"]


class FixMatchTrainer(MeanTeacherTrainer):
    """FixMatch: weight-shared teacher + optional distribution alignment."""

    def __init__(self, source_distribution: Optional[List[float]] = None, momentum: float = 0.999,
                 **kwargs):
        super().__init__(momentum=momentum, **kwargs)
        self.source_distribution = None if source_distribution is None \
            else jnp.asarray(source_distribution, dtype=jnp.float32)
        self._kwargs["source_distribution"] = source_distribution

    def _init_teacher(self):
        # weight-shared "teacher": starts as a materialized copy of the student
        # (a fresh buffer so step donation never aliases the two trees)
        self.teacher_variables = jax.tree_util.tree_map(jnp.copy, self.variables)

    def _current_momentum(self):
        # momentum 0 makes the EMA update `teacher := student` after every
        # step, i.e. exact weight sharing without buffer aliasing
        return 0.0

    def _distribution_alignment(self, pseudo_labels, label_threshold=0.5):
        """Scale pseudo labels so the marginal matches the source distribution
        (reference fix_match.py:167-181)."""
        if self.source_distribution is None:
            return pseudo_labels
        binary = (pseudo_labels >= label_threshold).astype(jnp.float32)
        pos = jnp.mean(binary)
        target_distribution = jnp.stack([1.0 - pos, pos])
        ratio = self.source_distribution / jnp.maximum(target_distribution, 1e-6)
        aligned = jnp.where(
            pseudo_labels < label_threshold, pseudo_labels * ratio[0], pseudo_labels * ratio[1]
        )
        return jnp.clip(aligned, 0, 1)

    def _build_steps(self):
        super()._build_steps()
        base_pl_step = self._pseudo_label_step

        def pseudo_label_step(teacher_variables, xu1, ct, rng):
            pseudo_labels, label_filter = base_pl_step(teacher_variables, xu1, ct, rng)
            pseudo_labels = self._distribution_alignment(pseudo_labels)
            return pseudo_labels, label_filter

        self._pseudo_label_step = jax.jit(pseudo_label_step)



class FixMatchTrainerWithInvertibleAugmentations(FixMatchTrainer):
    """FixMatch with invertible geometric augmentations (reference fix_match.py:371)."""

    def __init__(self, augmenter=None, **kwargs):
        super().__init__(**kwargs)
        self.augmenter = augmenter
        self._kwargs["augmenter"] = augmenter
