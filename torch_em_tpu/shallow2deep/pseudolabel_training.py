"""Pseudo-label training for Shallow2Deep domain adaptation
(reference torch_em/shallow2deep/pseudolabel_training.py).

Raw-only loaders where labels are predicted on the fly by a teacher
(typically a ``Shallow2DeepModel``): :53 ``get_pseudolabel_dataset``,
:117 ``get_pseudolabel_loader``.
"""

from typing import Callable, Optional, Tuple

from ..data import ConcatDataset, DataLoader, PseudoLabelDataset
from ..segmentation import get_data_loader

__all__ = ["get_pseudolabel_dataset", "get_pseudolabel_loader"]


def get_pseudolabel_dataset(
    raw_paths, raw_key,
    checkpoint: str,
    rf_config: Tuple,
    patch_shape: Tuple[int, ...],
    raw_transform: Optional[Callable] = None,
    transform: Optional[Callable] = None,
    rois=None,
    n_samples: Optional[int] = None,
    ndim: Optional[int] = None,
    sampler: Optional[Callable] = None,
    pseudo_label_transform: Optional[Callable] = None,
    device=None,
    rf_channel: int = 1,
):
    """Dataset with pseudo-labels from a Shallow2Deep teacher (reference :53)."""
    from .shallow2deep_model import Shallow2DeepModel

    pseudo_labeler = Shallow2DeepModel(checkpoint, rf_config, device=device, rf_channel=rf_channel)

    def _make(rp, roi, n):
        return PseudoLabelDataset(
            rp, raw_key, patch_shape=patch_shape, pseudo_labeler=pseudo_labeler,
            raw_transform=raw_transform, label_transform=pseudo_label_transform,
            transform=transform, roi=roi, n_samples=n, ndim=ndim, sampler=sampler,
        )

    if isinstance(raw_paths, str):
        return _make(raw_paths, rois, n_samples)
    datasets = []
    for i, rp in enumerate(raw_paths):
        roi = None if rois is None else rois[i]
        n = None if n_samples is None else n_samples // len(raw_paths)
        datasets.append(_make(rp, roi, n))
    return ConcatDataset(*datasets)


def get_pseudolabel_loader(
    raw_paths, raw_key,
    checkpoint: str,
    rf_config: Tuple,
    batch_size: int,
    patch_shape: Tuple[int, ...],
    **kwargs,
) -> DataLoader:
    """Loader with pseudo-labels from a Shallow2Deep teacher (reference :117)."""
    loader_kwargs = {
        k: kwargs.pop(k) for k in ("shuffle", "num_workers", "drop_last", "prefetch_factor")
        if k in kwargs
    }
    ds = get_pseudolabel_dataset(raw_paths, raw_key, checkpoint, rf_config, patch_shape, **kwargs)
    return get_data_loader(ds, batch_size=batch_size, **loader_kwargs)
