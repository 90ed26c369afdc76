"""Discriminative (contrastive) segmentation loss.

Rebuild of torch_em/loss/contrastive.py:25 (De Brabandere et al.,
arXiv:1708.02551): variance (pull) + distance (push) + regularizer terms.
The torch_scatter path becomes ``jax.ops.segment_sum`` with a static
``max_instances`` cap (see contrastive_impl module docstring); the target must
be consecutively labeled starting at 0 — the same requirement as the
reference's expand implementation (contrastive.py:107).
"""

from typing import Optional

import jax.numpy as jnp

from . import contrastive_impl as impl

__all__ = ["ContrastiveLoss", "check_consecutive"]


def check_consecutive(labels) -> bool:
    """Check that labels are consecutive and start at zero (reference :9)."""
    import numpy as np

    labels = np.asarray(labels)
    diff = labels[1:] - labels[:-1]
    return bool((labels[0] == 0) and (diff == 1).all())


class ContrastiveLoss:
    """Discriminative loss with hinged pull/push terms (reference contrastive.py:25).

    Args:
        delta_var: Hinge distance of the variance (pull) term.
        delta_dist: Hinge distance of the distance (push) term.
        norm: Only 'fro' (L2) is supported.
        alpha: Weight of the variance term.
        beta: Weight of the distance term.
        gamma: Weight of the regularizer.
        ignore_label: Not implemented (parity with the reference).
        impl: Accepted for API parity; the JAX segment implementation is
            always used.
        max_instances: Static cap on the number of instances per sample
            (TPU jit requires static shapes; must exceed the max id + 1).
    """

    def __init__(self, delta_var: float, delta_dist: float, norm: str = "fro", alpha: float = 1.0,
                 beta: float = 1.0, gamma: float = 0.001, ignore_label: Optional[int] = None,
                 impl_: Optional[str] = None, impl: Optional[str] = None, max_instances: int = 64):
        assert ignore_label is None, "Not implemented"
        assert norm == "fro"
        self.delta_var = delta_var
        self.delta_dist = delta_dist
        self.norm = norm
        self.alpha = alpha
        self.beta = beta
        self.gamma = gamma
        self.ignore_label = ignore_label
        self.max_instances = max_instances
        self.init_kwargs = {"delta_var": delta_var, "delta_dist": delta_dist, "norm": norm,
                            "alpha": alpha, "beta": beta, "gamma": gamma, "ignore_label": ignore_label,
                            "impl": impl, "max_instances": max_instances}

    def _single(self, embeddings, target):
        means, counts = impl.compute_cluster_means(embeddings, target, self.max_instances)
        variance_term = impl.compute_variance_term(means, embeddings, target, counts, self.delta_var)
        distance_term = impl.compute_distance_term(means, counts, self.delta_dist)
        regularization_term = impl.compute_regularizer_term(means, counts)
        return self.alpha * variance_term + self.beta * distance_term + self.gamma * regularization_term

    def __call__(self, input_: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        """input_: (N, E, *spatial) embeddings; target: (N, 1, *spatial) instances."""
        n_batches = input_.shape[0]
        assert target.ndim == input_.ndim
        assert target.shape[1] == 1
        loss = 0.0
        for b in range(n_batches):
            loss = loss + self._single(input_[b], target[b, 0].astype(jnp.int32))
        return loss / n_batches
