"""Affinity side loss: embeddings vs. segmentation-derived affinities.

Rebuild of torch_em/loss/affinity_side_loss.py: ``shift_tensor`` (:9),
``segmentation_to_affinities`` (:70), ``embeddings_to_affinities`` (:92),
``AffinitySideLoss`` (:114) with random offset sampling per step (:158) and
dice on inverted affinities (:161-172).

TPU-first: offsets are sampled as TRACED integers (jax.random.randint inside
the jitted step) and shifts realized with edge-padding + lax.dynamic_slice,
so random offsets never trigger recompilation. The loss therefore takes an
explicit ``rng`` (``needs_rng = True``); the trainer threads it through.
"""

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from .dice import dice_score

__all__ = ["AffinitySideLoss", "shift_tensor", "segmentation_to_affinities", "embeddings_to_affinities"]


def _dynamic_shift(tensor: jnp.ndarray, offset, max_abs: Tuple[int, ...]) -> jnp.ndarray:
    """Shift trailing spatial dims by (possibly traced) ``offset`` with edge padding.

    Equivalent to the reference's replication-pad + slice (:9-60): output[x]
    = input[clamp(x + offset)]. ``max_abs`` bounds |offset| per axis (static).
    """
    ndim = len(max_abs)
    lead = tensor.ndim - ndim
    pad_width = [(0, 0)] * lead + [(m, m) for m in max_abs]
    padded = jnp.pad(tensor, pad_width, mode="edge")
    # shifting by `off` means reading from position (x + off) in the original,
    # i.e. start = max_abs + off in the padded array
    starts = [0] * lead + [m + jnp.asarray(o) for m, o in zip(max_abs, offset)]
    starts = [jnp.asarray(s, dtype=jnp.int32) for s in starts]
    return jax.lax.dynamic_slice(padded, starts, tensor.shape)


def shift_tensor(tensor: jnp.ndarray, offset: List[int]) -> jnp.ndarray:
    """Shift a tensor by a static spatial offset (reference :9).

    Note the reference convention: a NEGATIVE offset shifts content left
    (output[x] = input[x - offset] with edge replication).
    """
    max_abs = tuple(abs(int(o)) if not hasattr(o, "dtype") else 18 for o in offset)
    neg = [-o for o in offset]
    return _dynamic_shift(tensor, neg, max_abs)


def segmentation_to_affinities(segmentation: jnp.ndarray, offsets, max_abs=None) -> jnp.ndarray:
    """Affinities from a segmentation via shift-and-compare (reference :70).

    segmentation: (N, 1, *spatial); returns (N, n_offsets, *spatial) with
    1 = same segment.
    """
    assert segmentation.shape[1] == 1, f"{segmentation.shape}"
    seg = segmentation.astype(jnp.float32)
    if max_abs is None:
        max_abs = tuple(max(abs(int(o)) for o in off) for off in zip(*offsets))
    shifted = jnp.concatenate(
        [_dynamic_shift(seg, off, max_abs) for off in offsets], axis=1
    )
    affs = (seg - shifted) == 0
    return affs.astype(jnp.float32)


def embeddings_to_affinities(embeddings: jnp.ndarray, offsets, delta: float, max_abs=None) -> jnp.ndarray:
    """Affinities from embeddings (reference :92): hinge of the embedding
    distance, ``clamp((2d - |e_x - e_{x+off}|) / 2d, 0)^2``."""
    if max_abs is None:
        max_abs = tuple(max(abs(int(o)) for o in off) for off in zip(*offsets))
    shifted = jnp.stack([_dynamic_shift(embeddings, off, max_abs) for off in offsets], axis=1)
    affs = (2 * delta - jnp.linalg.norm(embeddings[:, None] - shifted, axis=2)) / (2 * delta)
    return jnp.clip(affs, min=0) ** 2


class AffinitySideLoss:
    """Dice between affinities from embeddings and from the target segmentation
    (reference affinity_side_loss.py:114); offsets resampled per call."""

    needs_rng = True

    def __init__(self, offset_ranges: List[Tuple[int, int]], n_samples: int, delta: float):
        assert all(len(orange) == 2 for orange in offset_ranges)
        self.ndim = len(offset_ranges)
        self.offset_ranges = offset_ranges
        self.n_samples = n_samples
        self.delta = delta
        self.init_kwargs = {"offset_ranges": offset_ranges, "n_samples": n_samples, "delta": delta}

    def _sample_offsets(self, rng):
        lo = jnp.asarray([orange[0] for orange in self.offset_ranges])
        hi = jnp.asarray([orange[1] for orange in self.offset_ranges])
        return jax.random.randint(rng, (self.n_samples, self.ndim), lo, hi)

    def __call__(self, input_, target, rng=None, **unused):
        assert input_.ndim == target.ndim, f"{input_.ndim}, {target.ndim}"
        assert input_.shape[2:] == target.shape[2:]
        if rng is None:
            rng = jax.random.PRNGKey(0)
        offsets_arr = self._sample_offsets(rng)
        # shifts use the inverted offsets (reference :85,:105)
        inv = [[-offsets_arr[i, d] for d in range(self.ndim)] for i in range(self.n_samples)]
        max_abs = tuple(max(abs(r[0]), abs(r[1])) for r in self.offset_ranges)

        affs = 1.0 - embeddings_to_affinities_traced(input_, inv, self.delta, max_abs)
        target_affs = 1.0 - segmentation_to_affinities_traced(target, inv, max_abs)
        assert affs.shape == target_affs.shape, f"{affs.shape}, {target_affs.shape}"
        return dice_score(affs, target_affs, invert=True)


def embeddings_to_affinities_traced(embeddings, inv_offsets, delta, max_abs):
    shifted = jnp.stack([_dynamic_shift(embeddings, off, max_abs) for off in inv_offsets], axis=1)
    affs = (2 * delta - jnp.linalg.norm(embeddings[:, None] - shifted, axis=2)) / (2 * delta)
    return jnp.clip(affs, min=0) ** 2


def segmentation_to_affinities_traced(segmentation, inv_offsets, max_abs):
    seg = segmentation.astype(jnp.float32)
    shifted = jnp.concatenate([_dynamic_shift(seg, off, max_abs) for off in inv_offsets], axis=1)
    return ((seg - shifted) == 0).astype(jnp.float32)
