"""Shallow2Deep enhancer datasets (reference torch_em/shallow2deep/shallow2deep_dataset.py).

``Shallow2DeepDataset`` (:94): per item, pick a random RF from the ensemble
(:70-76), predict per-patch probabilities on the raw patch and return
(rf_prediction, labels) — the enhancer U-Net learns RF -> GT.
"""

import pickle
from glob import glob
from typing import Callable, Optional, Sequence, Tuple, Union

import numpy as np

from ..data import ConcatDataset, DataLoader, ImageCollectionDataset, SegmentationDataset
from ..segmentation import (
    check_paths, get_data_loader, is_segmentation_dataset, samples_to_datasets,
)
from ..utils.tensor import ensure_array_with_channels, ensure_spatial_array
from .prepare_shallow2deep import _apply_filters, _get_filters

__all__ = ["Shallow2DeepDataset", "Shallow2DeepImageCollectionDataset",
           "get_shallow2deep_dataset", "get_shallow2deep_loader"]


class _Shallow2DeepBase:
    """Shared RF-prediction machinery (reference shallow2deep_dataset.py:17)."""

    _rf_paths = None
    _filter_config = None
    rf_channels = (1,)

    @property
    def rf_paths(self):
        return self._rf_paths

    @rf_paths.setter
    def rf_paths(self, value):
        self._rf_paths = value

    @property
    def filter_config(self):
        return self._filter_config

    @filter_config.setter
    def filter_config(self, value):
        self._filter_config = value

    def _predict(self, raw, rf, filters_and_sigmas):
        features = _apply_filters(np.asarray(raw, dtype="float32"), filters_and_sigmas)
        assert rf.n_features_in_ == features.shape[1], \
            f"{rf.n_features_in_}, {features.shape[1]}"
        try:
            pred_ = rf.predict_proba(features)
            assert pred_.shape[1] > max(self.rf_channels), \
                f"{pred_.shape}, {self.rf_channels}"
            pred_ = pred_[:, self.rf_channels]
        except IndexError:
            pred_ = np.zeros((len(features), len(self.rf_channels)), dtype="float32")
        spatial_shape = np.asarray(raw).shape
        out_shape = (len(self.rf_channels),) + spatial_shape
        prediction = np.zeros(out_shape, dtype="float32")
        for chan in range(pred_.shape[1]):
            prediction[chan] = pred_[:, chan].reshape(spatial_shape)
        return prediction

    def _predict_rf(self, raw):
        n_rfs = len(self._rf_paths)
        rf_path = self._rf_paths[np.random.randint(0, n_rfs)]
        with open(rf_path, "rb") as f:
            rf = pickle.load(f)
        filters_and_sigmas = _get_filters(getattr(self, "_ndim", 2), self._filter_config)
        return self._predict(raw, rf, filters_and_sigmas)


class Shallow2DeepDataset(SegmentationDataset, _Shallow2DeepBase):
    """Dataset returning (rf_prediction, labels) (reference :94)."""

    def __getitem__(self, index):
        raw, labels = self._get_sample(index)
        initial_label_dtype = labels.dtype

        if self.raw_transform is not None:
            raw = self.raw_transform(raw)
        if self.label_transform is not None:
            labels = self.label_transform(labels)
        if self.transform is not None:
            raw, labels = self.transform(raw, labels)
        if self.label_transform2 is not None:
            labels = ensure_spatial_array(labels, self.ndim, dtype=initial_label_dtype)
            labels = self.label_transform2(labels)

        raw = np.asarray(raw).squeeze()
        prediction = self._predict_rf(raw)
        prediction = ensure_array_with_channels(prediction, ndim=self._ndim, dtype=self.dtype)
        labels = ensure_array_with_channels(labels, ndim=self._ndim, dtype=self.label_dtype)
        return prediction, labels


class Shallow2DeepImageCollectionDataset(ImageCollectionDataset, _Shallow2DeepBase):
    """Image-collection variant (reference :135)."""

    def __getitem__(self, index):
        raw, labels = self._get_sample(index)
        initial_label_dtype = labels.dtype

        if self.raw_transform is not None:
            raw = self.raw_transform(raw)
        if self.label_transform is not None:
            labels = self.label_transform(labels)
        if self.transform is not None:
            raw, labels = self.transform(raw, labels)
        if self.label_transform2 is not None:
            labels = ensure_spatial_array(labels, self.ndim, dtype=initial_label_dtype)
            labels = self.label_transform2(labels)

        raw = np.asarray(raw).squeeze()
        prediction = self._predict_rf(raw)
        prediction = ensure_array_with_channels(prediction, ndim=self._ndim, dtype=self.dtype)
        labels = ensure_array_with_channels(labels, ndim=self._ndim, dtype=self.label_dtype)
        return prediction, labels


def _load_shallow2deep_segmentation_dataset(raw_paths, raw_key, label_paths, label_key,
                                            rf_paths, rf_channels, ndim, **kwargs):
    rois = kwargs.pop("rois", None)
    filter_config = kwargs.pop("filter_config", None)
    if ndim == "anisotropic":
        ndim = 3

    def _make(rp, lp, roi, n_samples):
        ds = Shallow2DeepDataset(rp, raw_key, lp, label_key, roi=roi, ndim=ndim,
                                 n_samples=n_samples, **kwargs)
        ds.rf_paths = rf_paths
        ds.filter_config = filter_config
        ds.rf_channels = rf_channels
        return ds

    if isinstance(raw_paths, str):
        return _make(raw_paths, label_paths, rois, kwargs.pop("n_samples", None))
    n_samples = kwargs.pop("n_samples", None)
    samples_per_ds = (
        [None] * len(raw_paths) if n_samples is None else samples_to_datasets(n_samples, raw_paths, raw_key)
    )
    datasets = []
    for i, (rp, lp) in enumerate(zip(raw_paths, label_paths)):
        roi = None if rois is None else rois[i]
        datasets.append(_make(rp, lp, roi, samples_per_ds[i]))
    return ConcatDataset(*datasets)


def get_shallow2deep_dataset(
    raw_paths, raw_key, label_paths, label_key,
    rf_paths: Sequence[str],
    patch_shape: Tuple[int, ...],
    raw_transform: Optional[Callable] = None,
    transform: Optional[Callable] = None,
    rois=None,
    n_samples: Optional[int] = None,
    sampler: Optional[Callable] = None,
    ndim=None,
    is_seg_dataset: Optional[bool] = None,
    with_channels: bool = False,
    filter_config=None,
    rf_channels: Tuple[int, ...] = (1,),
    **kwargs,
):
    """Build a Shallow2Deep dataset (reference shallow2deep_dataset.py:242)."""
    check_paths(raw_paths, label_paths)
    if is_seg_dataset is None:
        is_seg_dataset = is_segmentation_dataset(raw_paths, raw_key, label_paths, label_key)
    if isinstance(rf_channels, int):
        rf_channels = (rf_channels,)
    assert is_seg_dataset, "Image collection S2D datasets require container data in this rebuild."
    return _load_shallow2deep_segmentation_dataset(
        raw_paths, raw_key, label_paths, label_key, rf_paths, rf_channels, ndim,
        patch_shape=patch_shape, raw_transform=raw_transform, transform=transform, rois=rois,
        n_samples=n_samples, sampler=sampler, with_channels=with_channels,
        filter_config=filter_config, **kwargs,
    )


def get_shallow2deep_loader(
    raw_paths, raw_key, label_paths, label_key,
    rf_paths: Sequence[str],
    batch_size: int,
    patch_shape: Tuple[int, ...],
    **kwargs,
) -> DataLoader:
    """Build a Shallow2Deep loader (reference shallow2deep_dataset.py:334)."""
    loader_kwargs = {
        k: kwargs.pop(k) for k in ("shuffle", "num_workers", "drop_last", "prefetch_factor")
        if k in kwargs
    }
    ds = get_shallow2deep_dataset(raw_paths, raw_key, label_paths, label_key, rf_paths,
                                  patch_shape, **kwargs)
    return get_data_loader(ds, batch_size=batch_size, **loader_kwargs)
