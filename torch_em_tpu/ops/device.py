"""Device-side (batched, jittable) label-target ops.

The reference computes label targets per sample on the host (affogato /
skimage inside DataLoader workers, SURVEY §3.2). On TPU the tensor-shaped
transforms (affinities, boundaries) are pure shift-and-compare — moving them
INTO the jitted train step removes the GIL-bound host work entirely: the
loader ships raw uint labels and the device derives the targets, batched.

Use through ``DeviceAffinityTransform`` / ``DeviceBoundaryTransform`` passed
as ``device_label_transform`` to the trainer; semantics match the host
``AffinityTransform`` / ``BoundaryTransform`` exactly (tested element-wise).
"""

from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

__all__ = [
    "compute_affinities_batched", "DeviceAffinityTransform", "DeviceBoundaryTransform",
]


def _shift_slices(off, shape):
    """Source/destination slice pairs for one offset (host semantics,
    ops/host.py compute_affinities)."""
    sl_src, sl_dst = [], []
    for o, s in zip(off, shape):
        if abs(o) >= s:
            return None, None
        if o > 0:
            sl_src.append(slice(None, -o))
            sl_dst.append(slice(o, None))
        elif o < 0:
            sl_src.append(slice(-o, None))
            sl_dst.append(slice(None, o))
        else:
            sl_src.append(slice(None))
            sl_dst.append(slice(None))
    return tuple(sl_src), tuple(sl_dst)


def compute_affinities_batched(labels, offsets: Sequence[Sequence[int]],
                               have_ignore_label: bool = False, ignore_label: int = 0):
    """Batched affinities from (B, *spatial) labels -> (B, C, *spatial)
    (affs, mask), matching ``ops.host.compute_affinities`` per sample."""
    labels = jnp.asarray(labels)
    spatial = labels.shape[1:]
    affs, masks = [], []
    for off in offsets:
        sl_src, sl_dst = _shift_slices(off, spatial)
        a_full = jnp.zeros(labels.shape, jnp.float32)
        m_full = jnp.zeros(labels.shape, jnp.float32)
        if sl_src is not None:
            src = labels[(slice(None),) + sl_src]
            dst = labels[(slice(None),) + sl_dst]
            same = (src == dst).astype(jnp.float32)
            m = jnp.ones(src.shape, jnp.float32)
            if have_ignore_label:
                ign = (src == ignore_label) | (dst == ignore_label)
                m = jnp.where(ign, 0.0, m)
                same = jnp.where(ign, 0.0, same)
            a_full = a_full.at[(slice(None),) + sl_src].set(same)
            m_full = m_full.at[(slice(None),) + sl_src].set(m)
        affs.append(a_full)
        masks.append(m_full)
    return jnp.stack(affs, axis=1), jnp.stack(masks, axis=1)


class DeviceAffinityTransform:
    """Jittable batched AffinityTransform (disaffinity convention, optional
    binary channel + validity-mask channels) applied to the label batch
    INSIDE the train step — host loaders ship raw instance labels.

    y in: (B, 1, *spatial) or (B, *spatial) integer labels;
    y out: (B, C, *spatial) float32 with C = [binary +] offsets [+ masks].
    """

    def __init__(self, offsets: List[List[int]], ignore_label: Optional[int] = None,
                 add_binary_target: bool = False, add_mask: bool = False):
        self.offsets = offsets
        self.ignore_label = ignore_label
        self.add_binary_target = add_binary_target
        self.add_mask = add_mask
        self.init_kwargs = {"offsets": offsets, "ignore_label": ignore_label,
                            "add_binary_target": add_binary_target, "add_mask": add_mask}

    def __call__(self, y):
        y = jnp.asarray(y)
        if y.ndim == len(self.offsets[0]) + 2:  # (B, 1, *spatial)
            y = y[:, 0]
        labels = y.astype(jnp.int64) if jnp.issubdtype(y.dtype, jnp.floating) else y
        affs, mask = compute_affinities_batched(
            labels, self.offsets,
            have_ignore_label=self.ignore_label is not None,
            ignore_label=0 if self.ignore_label is None else self.ignore_label,
        )
        affs = 1.0 - affs  # disaffinity convention
        if self.add_binary_target:
            binary = (labels != 0).astype(jnp.float32)[:, None]
            affs = jnp.concatenate([binary, affs], axis=1)
        if self.add_mask:
            if self.add_binary_target:
                if self.ignore_label is None:
                    mask_bin = jnp.ones_like(affs[:, :1])
                else:
                    mask_bin = (labels != self.ignore_label).astype(jnp.float32)[:, None]
                mask = jnp.concatenate([mask_bin, mask], axis=1)
            affs = jnp.concatenate([affs, mask], axis=1)
        return affs


class DeviceBoundaryTransform:
    """Jittable batched thick-boundary transform (skimage find_boundaries
    'thick' semantics: both pixels at a label transition are boundary),
    with an optional binary foreground channel."""

    def __init__(self, add_binary_target: bool = False, ndim: Optional[int] = None):
        self.add_binary_target = add_binary_target
        self.ndim = ndim
        self.init_kwargs = {"add_binary_target": add_binary_target, "ndim": ndim}

    def __call__(self, y):
        y = jnp.asarray(y)
        ndim = self.ndim if self.ndim is not None else y.ndim - 2
        if y.ndim == ndim + 2:
            y = y[:, 0]
        labels = y.astype(jnp.int64) if jnp.issubdtype(y.dtype, jnp.floating) else y
        boundary = jnp.zeros(labels.shape, bool)
        spatial = labels.shape[1:]
        for ax in range(len(spatial)):
            off = [0] * len(spatial)
            off[ax] = 1
            sl_src, sl_dst = _shift_slices(off, spatial)
            diff = labels[(slice(None),) + sl_src] != labels[(slice(None),) + sl_dst]
            boundary = boundary.at[(slice(None),) + sl_src].max(diff)
            boundary = boundary.at[(slice(None),) + sl_dst].max(diff)
        out = boundary.astype(jnp.float32)[:, None]
        if self.add_binary_target:
            binary = (labels != 0).astype(jnp.float32)[:, None]
            out = jnp.concatenate([binary, out], axis=1)
        return out
