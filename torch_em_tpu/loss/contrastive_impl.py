"""Jittable kernels for the discriminative (contrastive) loss.

Rebuild of torch_em/loss/contrastive_impl.py. The reference has an 'expand'
(one-hot) and a 'scatter' (torch_scatter) implementation; on TPU the natural
primitive is ``jax.ops.segment_sum`` with a STATIC instance cap
(``max_instances``): instance counts are data-dependent, which jit cannot
shape-specialize on, so all segment tensors are padded to the cap and empty
slots masked out. This is exact (not approximate) as long as the target has
fewer than ``max_instances`` ids.
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

EPS = 1e-7


def compute_cluster_means(embeddings: jnp.ndarray, target: jnp.ndarray, max_instances: int
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mean embedding per instance id.

    embeddings: (E, *spatial); target: (*spatial) int in [0, max_instances).
    Returns (means (M, E), counts (M,)).
    """
    e = embeddings.shape[0]
    feat = embeddings.reshape(e, -1).T  # (P, E)
    lbl = target.reshape(-1).astype(jnp.int32)
    sums = jax.ops.segment_sum(feat, lbl, num_segments=max_instances)
    counts = jax.ops.segment_sum(jnp.ones_like(lbl, dtype=feat.dtype), lbl, num_segments=max_instances)
    means = sums / jnp.maximum(counts[:, None], 1.0)
    return means, counts


def compute_variance_term(cluster_means, embeddings, target, counts, delta_var,
                          ignore_zero_label: bool = False):
    """Intra-cluster pull force (reference _compute_variance_term_scatter)."""
    means_spatial = cluster_means[target]            # (*spatial, E)
    emb_spatial = jnp.moveaxis(embeddings, 0, -1)     # (*spatial, E)
    counts_spatial = counts[target]                   # (*spatial)
    # eps-guarded norm: jnp.linalg.norm has a NaN gradient at exactly-zero
    # vectors (single-pixel instances hit it), which NaNs the whole step
    variance = jnp.sqrt(jnp.sum(jnp.square(emb_spatial - means_spatial), axis=-1) + EPS)
    if ignore_zero_label:
        variance = variance * (target != 0)
    variance = jnp.clip(variance - delta_var, min=0) ** 2
    n_instances = jnp.sum(counts > 0)
    if ignore_zero_label:
        n_instances = jnp.maximum(n_instances - (counts[0] > 0), 1)
    per_pixel = variance / jnp.maximum(counts_spatial, 1.0)
    return jnp.sum(per_pixel) / jnp.maximum(n_instances, 1)


def compute_distance_term(cluster_means, counts, delta_dist, ignore_zero_label: bool = False):
    """Inter-cluster push force (reference _compute_distance_term_scatter)."""
    exists = counts > 0
    if ignore_zero_label:
        exists = exists.at[0].set(False)
    n = jnp.sum(exists)
    diff = cluster_means[:, None, :] - cluster_means[None, :, :]
    dist = jnp.sqrt(jnp.sum(diff ** 2, axis=-1) + EPS)
    m = cluster_means.shape[0]
    pair_mask = exists[:, None] & exists[None, :] & ~jnp.eye(m, dtype=bool)
    hinged = jnp.clip(2 * delta_dist - dist, min=0) ** 2
    hinged = jnp.where(pair_mask, hinged, 0.0)
    denom = jnp.maximum(n * (n - 1), 1)
    return jnp.where(n > 1, jnp.sum(hinged) / denom, 0.0)


def compute_regularizer_term(cluster_means, counts):
    """Pull-to-origin regularizer (reference _scatter_impl_batch :137)."""
    exists = counts > 0
    norms = jnp.sqrt(jnp.sum(jnp.square(cluster_means), axis=1) + EPS) * exists
    return jnp.sum(norms) / jnp.maximum(jnp.sum(exists), 1)


def compute_unlabeled_push(cluster_means, embeddings, target, counts, delta_dist):
    """Background push force (reference spoco_loss.py:162-190): pushes
    background-pixel embeddings away from all foreground cluster means."""
    emb_spatial = jnp.moveaxis(embeddings, 0, -1)  # (*spatial, E)
    background_mask = (target == 0)
    n_background = jnp.sum(background_mask)
    exists = counts > 0
    exists = exists.at[0].set(False)
    n_instances = jnp.sum(exists)

    # distance of every pixel to every existing fg cluster mean
    dist = jnp.sqrt(jnp.sum(jnp.square(
        emb_spatial[..., None, :] - cluster_means[(None,) * (target.ndim)]), axis=-1) + EPS
    )  # (*spatial, M)
    hinged = jnp.clip((delta_dist - dist) * background_mask[..., None], min=0) ** 2
    hinged = hinged * exists[(None,) * target.ndim]
    push = jnp.sum(hinged) / jnp.maximum(n_background, 1)
    return jnp.where(n_instances > 0, push / jnp.maximum(n_instances, 1), 0.0)
