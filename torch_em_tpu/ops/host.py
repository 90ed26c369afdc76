"""Host-side (numpy/scipy + native C++) image-analysis primitives.

These replace the compiled external libraries the reference leans on
(SURVEY.md §2.9): skimage ``find_boundaries``/``label``/``relabel_sequential``/
``peak_local_max``/``resize``, vigra EDT + region features, and
affogato affinities. Graph-algorithmic decodings (watershed, mutex watershed)
live in :mod:`torch_em_tpu.ops.native` (C++); everything here is numpy/scipy.

These run on the host side of the data pipeline — per-sample, irregular,
data-dependent — exactly the work that must NOT go under jit (SURVEY.md §7).
"""

from typing import List, Optional, Sequence, Tuple

import numpy as np
from scipy import ndimage

__all__ = [
    "connected_components", "find_boundaries", "relabel_consecutive",
    "size_filter", "distance_transform", "vector_distance_transform",
    "peak_local_max", "resize", "region_bounding_boxes", "region_centroids",
    "region_sizes", "compute_affinities", "binary_erosion", "binary_dilation",
    "label_consecutive",
]


def _structure(ndim: int, connectivity: int) -> np.ndarray:
    return ndimage.generate_binary_structure(ndim, connectivity)


def connected_components(seg: np.ndarray, connectivity: int = 1, with_background: bool = True) -> np.ndarray:
    """Connected-component labeling (replaces skimage.measure.label,
    reference call site transform/label.py:28)."""
    seg = np.asarray(seg)
    if with_background:
        labeled, _ = ndimage.label(seg != 0, structure=_structure(seg.ndim, connectivity))
        return labeled.astype("uint32")
    # label each distinct input id separately so touching objects stay separate
    out = np.zeros(seg.shape, dtype="uint32")
    offset = 0
    for val in np.unique(seg):
        mask = seg == val
        labeled, n = ndimage.label(mask, structure=_structure(seg.ndim, connectivity))
        out[mask] = labeled[mask] + offset
        offset += n
    return out


def find_boundaries(seg: np.ndarray, mode: str = "thick", connectivity: int = 1) -> np.ndarray:
    """Boundary detection between labeled regions via shift-and-compare
    (functional spec: skimage.segmentation.find_boundaries, used at
    reference transform/label.py:123).

    mode='thick': both sides of a transition are boundary.
    mode='inner': only pixels of the object side (nonzero label) adjacent to a
    different label are boundary.
    mode='outer': only background pixels adjacent to an object.
    """
    seg = np.asarray(seg)
    ndim = seg.ndim
    boundaries = np.zeros(seg.shape, dtype=bool)

    offsets: List[Tuple[int, ...]] = []
    for axis in range(ndim):
        off = [0] * ndim
        off[axis] = 1
        offsets.append(tuple(off))
    if connectivity >= ndim and ndim == 2:
        offsets += [(1, 1), (1, -1)]
    elif connectivity >= 2 and ndim == 3:
        offsets += [(0, 1, 1), (0, 1, -1), (1, 0, 1), (1, 0, -1), (1, 1, 0), (1, -1, 0)]

    for off in offsets:
        sl_a = tuple(slice(None, -o) if o > 0 else (slice(-o, None) if o < 0 else slice(None)) for o in off)
        sl_b = tuple(slice(o, None) if o > 0 else (slice(None, o) if o < 0 else slice(None)) for o in off)
        diff = seg[sl_a] != seg[sl_b]
        if mode == "thick":
            boundaries[sl_a] |= diff
            boundaries[sl_b] |= diff
        elif mode == "inner":
            boundaries[sl_a] |= diff & (seg[sl_a] != 0)
            boundaries[sl_b] |= diff & (seg[sl_b] != 0)
        elif mode == "outer":
            boundaries[sl_a] |= diff & (seg[sl_a] == 0)
            boundaries[sl_b] |= diff & (seg[sl_b] == 0)
        else:
            raise ValueError(f"Unsupported boundary mode {mode}.")
    return boundaries


def relabel_consecutive(seg: np.ndarray, start_label: int = 1, keep_zeros: bool = True):
    """Relabel segment ids to a consecutive range (replaces
    vigra.analysis.relabelConsecutive, reference transform/label.py:580).

    Returns (relabeled, max_label, mapping).
    """
    seg = np.asarray(seg)
    ids = np.unique(seg)
    mapping = {}
    out = np.zeros_like(seg)
    next_id = start_label
    for i in ids:
        if keep_zeros and i == 0:
            mapping[0] = 0
            continue
        mapping[int(i)] = next_id
        next_id += 1
    lookup_in = np.array(sorted(mapping.keys()))
    lookup_out = np.array([mapping[int(k)] for k in lookup_in])
    idx = np.searchsorted(lookup_in, seg)
    out = lookup_out[idx].astype(seg.dtype if np.issubdtype(seg.dtype, np.integer) else "uint32")
    return out, max(mapping.values()) if mapping else 0, mapping


def label_consecutive(labels: np.ndarray, with_background: bool = True) -> np.ndarray:
    """Ensure consecutive labeling (reference transform/label.py:47)."""
    out, _, _ = relabel_consecutive(labels, start_label=1, keep_zeros=with_background)
    return out


def size_filter(seg: np.ndarray, min_size: int, relabel: bool = True) -> np.ndarray:
    """Remove segments below min_size (reference util/segmentation.py:23)."""
    seg = np.asarray(seg)
    if min_size <= 0:
        return seg
    ids, sizes = np.unique(seg, return_counts=True)
    discard = ids[sizes < min_size]
    out = seg.copy()
    out[np.isin(seg, discard)] = 0
    if relabel:
        out, _, _ = relabel_consecutive(out)
    return out


def distance_transform(mask: np.ndarray, sampling: Optional[Sequence[float]] = None) -> np.ndarray:
    """Exact Euclidean distance to the nearest NON-ZERO pixel of ``mask``.

    This matches the vigra convention (``vigra.filters.distanceTransform``,
    reference call site transform/label.py:516): object pixels get distance 0,
    background pixels get the distance to the nearest object pixel. scipy's
    ``distance_transform_edt`` uses the opposite convention, hence the inversion.
    """
    return ndimage.distance_transform_edt(np.asarray(mask) == 0, sampling=sampling).astype("float32")


def vector_distance_transform(mask: np.ndarray, sampling: Optional[Sequence[float]] = None) -> np.ndarray:
    """Vector (displacement) EDT: per-pixel offset pointing to the nearest
    NON-ZERO pixel of ``mask``, channel-first (ndim, *spatial). Replaces
    vigra.filters.vectorDistanceTransform (reference transform/label.py:438)."""
    mask = np.asarray(mask) == 0
    indices = ndimage.distance_transform_edt(
        mask, sampling=sampling, return_distances=False, return_indices=True
    )
    coords = np.indices(mask.shape)
    vectors = (indices - coords).astype("float32")
    if sampling is not None:
        for d, s in enumerate(sampling):
            vectors[d] *= s
    return vectors


def peak_local_max(
    image: np.ndarray, min_distance: int = 1, threshold_abs: Optional[float] = None, exclude_border: bool = True,
) -> np.ndarray:
    """Local maxima coordinates (functional spec: skimage peak_local_max,
    reference util/segmentation.py:172)."""
    image = np.asarray(image)
    size = 2 * min_distance + 1
    max_filt = ndimage.maximum_filter(image, size=size, mode="constant", cval=-np.inf)
    mask = image == max_filt
    if threshold_abs is not None:
        mask &= image > threshold_abs
    if exclude_border:
        border = min_distance if isinstance(exclude_border, bool) else int(exclude_border)
        for ax in range(image.ndim):
            sl_lo = [slice(None)] * image.ndim
            sl_hi = [slice(None)] * image.ndim
            sl_lo[ax] = slice(0, border)
            sl_hi[ax] = slice(image.shape[ax] - border, None)
            mask[tuple(sl_lo)] = False
            mask[tuple(sl_hi)] = False
    return np.argwhere(mask)


def resize(image: np.ndarray, shape: Sequence[int], order: int = 1, preserve_dtype: bool = True) -> np.ndarray:
    """Resize to target shape (functional spec: skimage.transform.resize,
    reference transform/generic.py:8)."""
    image = np.asarray(image)
    shape = tuple(shape)
    if image.shape == shape:
        return image
    zoom = [t / s for t, s in zip(shape, image.shape)]
    dtype = image.dtype
    out = ndimage.zoom(image.astype("float32" if order > 0 else dtype), zoom, order=order, mode="nearest")
    # zoom can be off-by-one; crop/pad to the exact target
    out = out[tuple(slice(0, t) for t in shape)]
    if any(o < t for o, t in zip(out.shape, shape)):
        out = np.pad(out, [(0, t - o) for o, t in zip(out.shape, shape)], mode="edge")
    if preserve_dtype and order == 0:
        out = out.astype(dtype)
    return out


def region_bounding_boxes(seg: np.ndarray) -> dict:
    """Per-label bounding boxes as slices (replaces skimage regionprops bbox,
    reference transform/label.py:595)."""
    seg = np.asarray(seg)
    objects = ndimage.find_objects(seg.astype("int64"))
    return {label_id + 1: sl for label_id, sl in enumerate(objects) if sl is not None}


def region_centroids(seg: np.ndarray, ids: Optional[np.ndarray] = None) -> np.ndarray:
    """Per-label centroids (replaces vigra extractRegionFeatures 'Centroid')."""
    seg = np.asarray(seg)
    if ids is None:
        ids = np.unique(seg)
        ids = ids[ids != 0]
    if len(ids) == 0:
        return np.zeros((0, seg.ndim))
    return np.array(ndimage.center_of_mass(np.ones_like(seg, dtype="uint8"), labels=seg, index=ids))


def region_sizes(seg: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    ids, sizes = np.unique(np.asarray(seg), return_counts=True)
    return ids, sizes


def binary_erosion(mask: np.ndarray, iterations: int = 1) -> np.ndarray:
    return ndimage.binary_erosion(np.asarray(mask), iterations=iterations)


def binary_dilation(mask: np.ndarray, iterations: int = 1) -> np.ndarray:
    return ndimage.binary_dilation(np.asarray(mask), iterations=iterations)


def compute_affinities(
    labels: np.ndarray,
    offsets: Sequence[Sequence[int]],
    have_ignore_label: bool = False,
    ignore_label: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Affinities from a segmentation via shift-and-compare.

    Replaces affogato.affinities.compute_affinities (reference call site
    transform/label.py:303). Convention (matching affogato): ``affs[c, x] = 1``
    if ``labels[x] == labels[x + offsets[c]]`` (attractive), 0 at transitions;
    ``mask[c, x] = 1`` where the offset stays in bounds (and, with an ignore
    label, where neither endpoint is the ignore label). Out-of-bounds and
    masked-out entries have affinity 0.
    """
    labels = np.asarray(labels)
    ndim = labels.ndim
    n_off = len(offsets)
    affs = np.zeros((n_off,) + labels.shape, dtype="float32")
    mask = np.zeros((n_off,) + labels.shape, dtype="float32")

    for c, off in enumerate(offsets):
        if len(off) != ndim:
            raise ValueError(f"Offset {off} does not match label dimensionality {ndim}.")
        sl_src, sl_dst = [], []
        valid = True
        for o, s in zip(off, labels.shape):
            if abs(o) >= s:
                valid = False
                break
            if o > 0:
                sl_src.append(slice(None, -o)); sl_dst.append(slice(o, None))
            elif o < 0:
                sl_src.append(slice(-o, None)); sl_dst.append(slice(None, o))
            else:
                sl_src.append(slice(None)); sl_dst.append(slice(None))
        if not valid:
            continue
        sl_src, sl_dst = tuple(sl_src), tuple(sl_dst)
        a = labels[sl_src]
        b = labels[sl_dst]
        same = (a == b).astype("float32")
        m = np.ones(a.shape, dtype="float32")
        if have_ignore_label:
            ign = (a == ignore_label) | (b == ignore_label)
            m[ign] = 0
            same[ign] = 0
        affs[(c,) + sl_src] = same
        mask[(c,) + sl_src] = m
    return affs, mask
