"""SPOCO losses: sparse-supervision embedding instance segmentation.

Rebuild of torch_em/loss/spoco_loss.py (arXiv:2103.14572):
``ContrastiveLossBase`` (:117) with unlabeled-push (:162-190) and instance
terms, ``ExtendedContrastiveLoss`` (:301, dice-based instance term via a
Gaussian kernel :85), ``SPOCOLoss`` (:433, two-network consistency with
random anchors), ``SPOCOConsistencyLoss`` (:569), ``CombinedAuxLoss`` (:98).

TPU-first redesign: all instance reductions use a static ``max_instances``
cap (see contrastive_impl); anchor pixels for the consistency term are drawn
with ``jax.random.categorical`` over the mask inside the jitted step, with
the volume-threshold gate realized as a multiplicative weight. The losses are
fully jittable; ``needs_rng = True`` makes the trainer thread a PRNG through.
Two deviations from the reference are deliberate: the reference's
``loss += loss`` accumulation bug (spoco_loss.py:298) is fixed to a proper
sum, and per-anchor consistency dice uses an explicit channel axis.
"""

import math
from typing import Optional

import jax
import jax.numpy as jnp

from . import contrastive_impl as impl
from .affinity_side_loss import AffinitySideLoss
from .dice import DiceLoss, dice_score

EPS = 1e-7  # guards sqrt gradients at zero distance

__all__ = [
    "compute_cluster_means", "GaussianKernel", "CombinedAuxLoss", "ContrastiveLossBase",
    "ExtendedContrastiveLoss", "SPOCOLoss", "SPOCOConsistencyLoss", "select_stable_anchor",
]


def compute_cluster_means(embeddings, target, n_instances):
    """Mean embeddings per instance (reference spoco_loss.py:16)."""
    means, _ = impl.compute_cluster_means(embeddings, target, n_instances)
    return means


def select_stable_anchor(embeddings, mean_embedding, object_mask, delta_var, norm="fro"):
    """Reference spoco_loss.py:36 — kept for API parity; the jitted training
    path uses the mean embedding as anchor (the reference's active code path,
    see spoco_loss.py:414-416)."""
    return mean_embedding


class GaussianKernel:
    """Distance -> instance probability map (reference spoco_loss.py:85)."""

    def __init__(self, delta_var, pmaps_threshold):
        self.delta_var = delta_var
        self.two_sigma = delta_var * delta_var / (-math.log(pmaps_threshold))
        self.init_kwargs = {"delta_var": delta_var, "pmaps_threshold": pmaps_threshold}

    def __call__(self, dist_map):
        return jnp.exp(-dist_map * dist_map / self.two_sigma)


class CombinedAuxLoss:
    """Weighted combination of auxiliary SPOCO losses (reference spoco_loss.py:98)."""

    def __init__(self, losses, weights):
        self.losses = losses
        self.weights = weights
        self.init_kwargs = {"losses": losses, "weights": weights}

    def __call__(self, embeddings, target, instance_pmaps, instance_masks, rng=None):
        result = 0.0
        for loss, weight in zip(self.losses, self.weights):
            if isinstance(loss, AffinitySideLoss):
                result = result + weight * loss(embeddings[None], target[None, None], rng=rng)
            elif instance_masks is not None:
                result = result + weight * loss(instance_pmaps, instance_masks)
        return result


class ContrastiveLossBase:
    """Contrastive loss base with unlabeled push + instance term hooks
    (reference spoco_loss.py:117)."""

    needs_rng = True

    def __init__(self, delta_var, delta_dist, norm="fro", alpha=1.0, beta=1.0, gamma=0.001,
                 unlabeled_push_weight=0.0, instance_term_weight=1.0, impl=None,
                 max_instances: int = 64):
        assert norm == "fro"
        self.delta_var = delta_var
        self.delta_dist = delta_dist
        self.norm = norm
        self.alpha = alpha
        self.beta = beta
        self.gamma = gamma
        self.unlabeled_push_weight = unlabeled_push_weight
        self.unlabeled_push = unlabeled_push_weight > 0
        self.instance_term_weight = instance_term_weight
        self.max_instances = max_instances

    def compute_instance_term(self, embeddings, cluster_means, counts, target, rng=None):
        raise NotImplementedError

    def _single(self, embeddings, target, rng):
        target = target.astype(jnp.int32)
        contains_bg = jnp.any(target == 0)
        ignore_zero = self.unlabeled_push  # applied where bg present (traced)

        means, counts = impl.compute_cluster_means(embeddings, target, self.max_instances)

        if self.unlabeled_push:
            variance_term = jnp.where(
                contains_bg,
                impl.compute_variance_term(means, embeddings, target, counts, self.delta_var, True),
                impl.compute_variance_term(means, embeddings, target, counts, self.delta_var, False),
            )
            unlabeled_push_term = jnp.where(
                contains_bg,
                impl.compute_unlabeled_push(means, embeddings, target, counts, self.delta_dist),
                0.0,
            )
            distance_term = jnp.where(
                contains_bg,
                impl.compute_distance_term(means, counts, self.delta_dist, True),
                impl.compute_distance_term(means, counts, self.delta_dist, False),
            )
        else:
            variance_term = impl.compute_variance_term(
                means, embeddings, target, counts, self.delta_var, False
            )
            unlabeled_push_term = 0.0
            distance_term = impl.compute_distance_term(means, counts, self.delta_dist, False)

        instance_term = self.compute_instance_term(embeddings, means, counts, target, rng=rng)
        regularization_term = impl.compute_regularizer_term(means, counts)

        return (self.alpha * variance_term + self.beta * distance_term
                + self.gamma * regularization_term
                + self.instance_term_weight * instance_term
                + self.unlabeled_push_weight * unlabeled_push_term)

    def __call__(self, input_, target, rng=None, **unused):
        if isinstance(input_, tuple):
            assert len(input_) == 2
            input_ = input_[0]
        if rng is None:
            rng = jax.random.PRNGKey(0)
        n_batches = input_.shape[0]
        rngs = jax.random.split(rng, n_batches)
        loss = 0.0
        for b in range(n_batches):
            loss = loss + self._single(input_[b], target[b, 0], rngs[b])
        return loss / n_batches


class ExtendedContrastiveLoss(ContrastiveLossBase):
    """Contrastive loss + instance-based dice/affinity term + background push
    (reference spoco_loss.py:301)."""

    def __init__(self, delta_var: float, delta_dist: float, norm: str = "fro", alpha: float = 1.0,
                 beta: float = 1.0, gamma: float = 0.001, unlabeled_push_weight: float = 1.0,
                 instance_term_weight: float = 1.0, aux_loss: str = "dice",
                 pmaps_threshold: float = 0.9, max_instances: int = 64, **kwargs):
        super().__init__(delta_var, delta_dist, norm=norm, alpha=alpha, beta=beta, gamma=gamma,
                         unlabeled_push_weight=unlabeled_push_weight,
                         instance_term_weight=instance_term_weight, max_instances=max_instances)
        assert aux_loss in ("dice", "affinity", "dice_aff")
        self.aux_loss_kind = aux_loss
        if aux_loss in ("affinity", "dice_aff"):
            self.aff_loss = AffinitySideLoss(
                delta=delta_dist,
                offset_ranges=kwargs.get("offset_ranges", [(-18, 18), (-18, 18)]),
                n_samples=kwargs.get("n_samples", 9),
            )
        else:
            self.aff_loss = None
        self.use_dice = aux_loss in ("dice", "dice_aff")
        self.dice_weight = kwargs.get("dice_weight", 1.0)
        self.aff_weight = kwargs.get("aff_weight", 1.0)
        self.dist_to_mask = GaussianKernel(delta_var=self.delta_var, pmaps_threshold=pmaps_threshold)
        self.init_kwargs = {
            "delta_var": delta_var, "delta_dist": delta_dist, "norm": norm, "alpha": alpha,
            "beta": beta, "gamma": gamma, "unlabeled_push_weight": unlabeled_push_weight,
            "instance_term_weight": instance_term_weight, "aux_loss": aux_loss,
            "pmaps_threshold": pmaps_threshold, "max_instances": max_instances,
        }
        self.init_kwargs.update(kwargs)

    def _dice_instance_term(self, embeddings, cluster_means, counts, target):
        """Mean dice over foreground instances between the Gaussian pmap around
        each cluster mean and the instance mask (reference :375-421), computed
        for all (static) instance slots and masked."""
        emb_spatial = jnp.moveaxis(embeddings, 0, -1)  # (*spatial, E)
        # distances to every cluster mean -> (M, *spatial)
        dist = jnp.sqrt(jnp.sum(jnp.square(
            emb_spatial[None] - cluster_means[(slice(None),) + (None,) * target.ndim]), axis=-1) + EPS)
        pmaps = self.dist_to_mask(dist)
        masks = (target[None] == jnp.arange(self.max_instances).reshape(
            (self.max_instances,) + (1,) * target.ndim)).astype(jnp.float32)
        # per-instance dice error
        num = jnp.sum(pmaps * masks, axis=tuple(range(1, pmaps.ndim)))
        den = jnp.sum(pmaps * pmaps, axis=tuple(range(1, pmaps.ndim))) + \
            jnp.sum(masks * masks, axis=tuple(range(1, pmaps.ndim)))
        dice = 2 * num / jnp.clip(den, min=1e-7)
        exists = counts > 0
        exists = exists.at[0].set(False)  # skip background instance
        losses = (1.0 - dice) * exists
        n_fg = jnp.maximum(jnp.sum(exists), 1)
        return jnp.sum(losses) / n_fg

    def compute_instance_term(self, embeddings, cluster_means, counts, target, rng=None):
        aff_loss = None
        if self.aff_loss is not None:
            aff_loss = self.aff_loss(embeddings[None], target[None, None].astype(jnp.float32), rng=rng)
        dice_loss = self._dice_instance_term(embeddings, cluster_means, counts, target) \
            if self.use_dice else None
        if dice_loss is None:
            return aff_loss
        if aff_loss is None:
            return dice_loss
        return self.dice_weight * dice_loss + self.aff_weight * aff_loss


class SPOCOLoss(ExtendedContrastiveLoss):
    """Full SPOCO loss: extended contrastive + embedding consistency between
    the two networks (reference spoco_loss.py:433)."""

    def __init__(self, delta_var: float, delta_dist: float, norm: str = "fro", alpha: float = 1.0,
                 beta: float = 1.0, gamma: float = 0.001, unlabeled_push_weight: float = 0.0,
                 instance_term_weight: float = 1.0, consistency_term_weight: float = 1.0,
                 aux_loss: str = "dice", pmaps_threshold: float = 0.9, max_anchors: int = 20,
                 volume_threshold: float = 0.05, max_instances: int = 64, **kwargs):
        super().__init__(delta_var, delta_dist, norm=norm, alpha=alpha, beta=beta, gamma=gamma,
                         unlabeled_push_weight=unlabeled_push_weight,
                         instance_term_weight=instance_term_weight, aux_loss=aux_loss,
                         pmaps_threshold=pmaps_threshold, max_instances=max_instances, **kwargs)
        self.consistency_term_weight = consistency_term_weight
        self.max_anchors = max_anchors
        self.volume_threshold = volume_threshold
        self.consistency_loss = DiceLoss()
        self.init_kwargs = {
            "delta_var": delta_var, "delta_dist": delta_dist, "norm": norm, "alpha": alpha,
            "beta": beta, "gamma": gamma, "unlabeled_push_weight": unlabeled_push_weight,
            "instance_term_weight": instance_term_weight,
            "consistency_term_weight": consistency_term_weight, "aux_loss": aux_loss,
            "pmaps_threshold": pmaps_threshold, "max_anchors": max_anchors,
            "volume_threshold": volume_threshold, "max_instances": max_instances,
        }
        self.init_kwargs.update(kwargs)

    def _anchor_pmaps(self, emb, anchor_coords_flat):
        """pmaps for a set of anchors given by flat pixel indices: (A, *spatial)."""
        e, spatial = emb.shape[0], emb.shape[1:]
        flat = emb.reshape(e, -1)
        anchors = flat[:, anchor_coords_flat]  # (E, A)
        emb_spatial = jnp.moveaxis(emb, 0, -1)  # (*spatial, E)
        dist = jnp.sqrt(jnp.sum(jnp.square(
            emb_spatial[None] - anchors.T.reshape((-1,) + (1,) * len(spatial) + (e,))), axis=-1) + EPS)
        return self.dist_to_mask(dist)

    def emb_consistency(self, emb_q, emb_k, mask, rng):
        """Consistency between anchored pmaps of the two embeddings
        (reference :503-527). Anchors are drawn from the mask via categorical
        sampling; contributes only when the mask volume exceeds the threshold."""
        flat_mask = mask.reshape(-1).astype(jnp.float32)
        logits = jnp.where(flat_mask > 0, 0.0, -1e9)
        idx = jax.random.categorical(rng, logits, shape=(self.max_anchors,))
        q_pmaps = self._anchor_pmaps(emb_q, idx)
        k_pmaps = self._anchor_pmaps(jax.lax.stop_gradient(emb_k), idx)
        # dice with anchors as channels (explicit batch axis)
        loss = self.consistency_loss(q_pmaps[None], k_pmaps[None])
        enough_volume = jnp.sum(flat_mask) >= self.volume_threshold * flat_mask.size
        return jnp.where(enough_volume, loss, 0.0)

    def __call__(self, input_, target, rng=None, **unused):
        assert len(input_) == 2
        emb_q, emb_k = input_
        if rng is None:
            rng = jax.random.PRNGKey(0)
        rng_contrastive, rng_cons = jax.random.split(rng)
        contrastive_loss = super().__call__(emb_q, target, rng=rng_contrastive)

        rngs = jax.random.split(rng_cons, emb_q.shape[0])
        for b in range(emb_q.shape[0]):
            unlabeled_mask = (target[b, 0] == 0).astype(jnp.int32)
            cons = self.emb_consistency(emb_q[b], emb_k[b], unlabeled_mask, rngs[b])
            contrastive_loss = contrastive_loss + self.consistency_term_weight * cons
        return contrastive_loss


class SPOCOConsistencyLoss:
    """Purely unsupervised anchor-consistency loss (reference spoco_loss.py:569)."""

    needs_rng = True

    def __init__(self, delta_var: float, pmaps_threshold: float, max_anchors: int = 30,
                 norm: str = "fro"):
        self.max_anchors = max_anchors
        self.consistency_loss = DiceLoss()
        self.norm = norm
        self.dist_to_mask = GaussianKernel(delta_var=delta_var, pmaps_threshold=pmaps_threshold)
        self.init_kwargs = {"delta_var": delta_var, "pmaps_threshold": pmaps_threshold,
                            "max_anchors": max_anchors, "norm": norm}

    def _anchor_pmaps(self, emb, idx):
        e, spatial = emb.shape[0], emb.shape[1:]
        flat = emb.reshape(e, -1)
        anchors = flat[:, idx]
        emb_spatial = jnp.moveaxis(emb, 0, -1)
        dist = jnp.sqrt(jnp.sum(jnp.square(
            emb_spatial[None] - anchors.T.reshape((-1,) + (1,) * len(spatial) + (e,))), axis=-1) + EPS)
        return self.dist_to_mask(dist)

    def emb_consistency(self, emb_q, emb_k, rng):
        n_pixels = int(np_prod(emb_q.shape[1:]))
        idx = jax.random.randint(rng, (self.max_anchors,), 0, n_pixels)
        q_pmaps = self._anchor_pmaps(emb_q, idx)
        k_pmaps = self._anchor_pmaps(emb_k, idx)
        return self.consistency_loss(q_pmaps[None], k_pmaps[None])

    def __call__(self, emb_q, emb_k, rng=None):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        rngs = jax.random.split(rng, emb_q.shape[0])
        loss = 0.0
        for b in range(emb_q.shape[0]):
            loss = loss + self.emb_consistency(emb_q[b], emb_k[b], rngs[b])
        return loss


def np_prod(shape):
    out = 1
    for s in shape:
        out *= int(s)
    return out
