"""Synthetic test-data fixtures (reference torch_em/util/test.py)."""

import os
from typing import Optional, Sequence, Tuple

import numpy as np
from scipy import ndimage

__all__ = ["make_gt", "create_segmentation_test_data", "create_image_collection_test_data"]


def make_gt(spatial_shape: Sequence[int], n_batches: Optional[int] = None,
            with_channels: bool = False, with_background: bool = False, dtype=None) -> np.ndarray:
    """Realistic instance ground truth via seeded watershed on a smoothed EDT
    (reference util/test.py:14)."""
    from ..ops import native

    def _make_single():
        seeds = np.zeros(spatial_shape, dtype="uint32")
        n_seeds = max(int(np.prod(spatial_shape) // 400), 4)
        coords = tuple(
            np.random.randint(0, s, size=n_seeds) for s in spatial_shape
        )
        seeds[coords] = np.arange(1, n_seeds + 1)
        hmap = ndimage.gaussian_filter(np.random.rand(*spatial_shape).astype("float32"), 2.0)
        gt = native.watershed(hmap, seeds)
        if with_background:
            gt[gt == gt.flat[0]] = 0
        return gt

    gts = []
    n = 1 if n_batches is None else n_batches
    for _ in range(n):
        gt = _make_single()
        if with_channels:
            gt = gt[None]
        gts.append(gt)
    out = gts[0] if n_batches is None else np.stack(gts)
    if dtype is not None:
        out = out.astype(dtype)
    return out


def create_segmentation_test_data(data_path: str, raw_key: str, label_key: str,
                                  shape: Tuple[int, ...], chunks: Tuple[int, ...]) -> None:
    """Random h5 raw + randint labels (reference util/test.py:43)."""
    import h5py

    with h5py.File(data_path, "a") as f:
        f.create_dataset(raw_key, data=np.random.rand(*shape), chunks=chunks)
        f.create_dataset(label_key, data=np.random.randint(0, 4, size=shape), chunks=chunks)


def create_image_collection_test_data(folder: str, n_images: int,
                                      min_shape: Tuple[int, ...], max_shape: Tuple[int, ...]) -> None:
    """Random-shaped image/label pairs (reference util/test.py:49); saved as
    png (tifffile is not available in this environment)."""
    from PIL import Image

    im_folder = os.path.join(folder, "images")
    label_folder = os.path.join(folder, "labels")
    os.makedirs(im_folder, exist_ok=True)
    os.makedirs(label_folder, exist_ok=True)

    for i in range(n_images):
        shape = tuple(np.random.randint(mins, maxs) for mins, maxs in zip(min_shape, max_shape))
        raw = (np.random.rand(*shape) * 255).astype("uint8")
        label = np.random.randint(0, 4, size=shape).astype("uint8")
        Image.fromarray(raw).save(os.path.join(im_folder, f"im{i}.png"))
        Image.fromarray(label).save(os.path.join(label_folder, f"im{i}.png"))
