"""RF-oriented label transforms (reference torch_em/shallow2deep/transform.py).

Targets for random-forest training: -1 marks ignore, class ids from 0.
"""

from typing import Optional

import numpy as np
from scipy import ndimage

from ..ops import host as ops
from ..utils.tensor import ensure_array, ensure_spatial_array

__all__ = ["ForegroundTransform", "BoundaryTransform"]


class ForegroundTransform:
    """Foreground/background RF target with an ignore radius around boundaries
    (reference shallow2deep/transform.py:9)."""

    def __init__(self, label_id: Optional[int] = None, ndim: Optional[int] = None,
                 ignore_radius: int = 1):
        self.label_id = label_id
        self.ndim = ndim
        self.ignore_radius = ignore_radius
        self.init_kwargs = {"label_id": label_id, "ndim": ndim, "ignore_radius": ignore_radius}

    def __call__(self, labels: np.ndarray) -> np.ndarray:
        labels = ensure_array(labels) if self.ndim is None else ensure_spatial_array(labels, self.ndim)
        target = (labels != 0) if self.label_id is None else (labels == self.label_id)
        target = target.astype("int8")
        if self.ignore_radius > 0:
            dist = ndimage.distance_transform_edt(target == 0)
            ignore_mask = np.logical_and(dist <= self.ignore_radius, dist > 0)
            target[ignore_mask] = -1
        return target[None]


class BoundaryTransform:
    """Boundary/foreground/background RF target (reference shallow2deep/transform.py:41)."""

    def __init__(self, mode: str = "thick", add_binary_target: bool = True,
                 ndim: Optional[int] = None, ignore_radius: int = 2):
        self.mode = mode
        self.add_binary_target = add_binary_target
        self.ndim = ndim
        self.ignore_radius = ignore_radius
        self.init_kwargs = {"mode": mode, "add_binary_target": add_binary_target, "ndim": ndim,
                            "ignore_radius": ignore_radius}

    def __call__(self, labels: np.ndarray) -> np.ndarray:
        labels = ensure_array(labels) if self.ndim is None else ensure_spatial_array(labels, self.ndim)
        boundaries = ops.find_boundaries(labels, mode=self.mode)
        if self.add_binary_target:
            # three classes: 0 = background, 1 = foreground, 2 = boundary
            target = (labels != 0).astype("int8")
            target[boundaries] = 2
        else:
            target = boundaries.astype("int8")
        if self.ignore_radius > 0:
            dist = ndimage.distance_transform_edt(~boundaries)
            ignore_mask = np.logical_and(dist <= self.ignore_radius, dist > 0)
            target[ignore_mask] = -1
        return target[None]
