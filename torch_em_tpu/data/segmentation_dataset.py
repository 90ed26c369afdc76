"""Lazy patch-sampling dataset over container formats (hdf5/zarr/n5).

Rebuild of torch_em/data/segmentation_dataset.py:15 with identical sampling
semantics: uniform random bounding boxes (:155-171), rejection sampling with a
500-attempt cap (:51,:193-199), ``pre_label_transform`` before the sampler
check (:179-184), pad-to-patch (:201-209), ndim-squeeze for 2d-from-3d patches
(:212-214), raw/label/label2/joint transform ordering (:226-249), channel
handling via ``with_channels`` (:95-107), ROI views (:98-103), ``z_ext``
(:157-163) and pickle support that drops/reopens file handles (:252-287).

Output samples are numpy arrays (C, *spatial) — host-side by design: rejection
sampling is data-dependent and must never enter jit (SURVEY.md §7).
"""

import os
import warnings
from math import ceil
from typing import Any, Callable, List, Optional, Tuple, Union

import numpy as np

from ..utils.io import RoiWrapper, load_data
from ..utils.tensor import ensure_array_with_channels, ensure_patch_shape, ensure_spatial_array, validate_roi
from .base import Dataset


def _normalize_roi(roi, shape):
    if isinstance(roi, slice):
        roi = (roi,)
    validate_roi(roi, shape)
    full = tuple(slice(*r.indices(s)) for r, s in zip(roi, shape))
    return full + tuple(slice(0, s) for s in shape[len(full):])


class SegmentationDataset(Dataset):
    """Dataset providing (raw, label) patches from container data formats.

    See module docstring; API-compatible with the reference
    ``torch_em.data.SegmentationDataset``.
    """

    max_sampling_attempts = 500

    @staticmethod
    def compute_len(shape, patch_shape):
        if patch_shape is None:
            return 1
        return ceil(np.prod([float(sh / csh) for sh, csh in zip(shape, patch_shape)]))

    def __init__(
        self,
        raw_path: Union[List[Any], str, os.PathLike],
        raw_key: Optional[str],
        label_path: Union[List[Any], str, os.PathLike],
        label_key: Optional[str],
        patch_shape: Tuple[int, ...],
        raw_transform: Optional[Callable] = None,
        label_transform: Optional[Callable] = None,
        label_transform2: Optional[Callable] = None,
        transform: Optional[Callable] = None,
        roi: Optional[Union[slice, Tuple[slice, ...]]] = None,
        dtype="float32",
        label_dtype="float32",
        n_samples: Optional[int] = None,
        sampler: Optional[Callable] = None,
        ndim: Optional[int] = None,
        with_channels: bool = False,
        with_label_channels: bool = False,
        with_padding: bool = True,
        z_ext: Optional[int] = None,
        pre_label_transform: Optional[Callable] = None,
    ):
        self.raw_path = raw_path
        self.raw_key = raw_key
        self.raw = load_data(raw_path, raw_key)

        self.label_path = label_path
        self.label_key = label_key
        self.labels = load_data(label_path, label_key)

        self._with_channels = with_channels
        self._with_label_channels = with_label_channels

        if roi is not None:
            shape = self.raw.shape[1:] if self._with_channels else self.raw.shape
            roi = _normalize_roi(roi, shape)
            self.raw = RoiWrapper(self.raw, (slice(None),) + roi) if self._with_channels \
                else RoiWrapper(self.raw, roi)
            self.labels = RoiWrapper(self.labels, (slice(None),) + roi) if self._with_label_channels \
                else RoiWrapper(self.labels, roi)

        shape_raw = self.raw.shape[1:] if self._with_channels else self.raw.shape
        shape_label = self.labels.shape[1:] if self._with_label_channels else self.labels.shape
        assert tuple(shape_raw) == tuple(shape_label), f"{shape_raw}, {shape_label}"

        self.shape = tuple(shape_raw)
        self.roi = roi

        self._ndim = len(shape_raw) if ndim is None else ndim
        assert self._ndim in (2, 3, 4), f"Invalid data dimensions: {self._ndim}."
        if patch_shape is not None:
            assert len(patch_shape) in (self._ndim, self._ndim + 1), f"{patch_shape}, {self._ndim}"
        self.patch_shape = tuple(patch_shape) if patch_shape is not None else None

        self.raw_transform = raw_transform
        self.label_transform = label_transform
        self.label_transform2 = label_transform2
        self.transform = transform
        self.sampler = sampler
        self.with_padding = with_padding
        self.pre_label_transform = pre_label_transform

        self.dtype = dtype
        self.label_dtype = label_dtype

        self._len = self.compute_len(self.shape, self.patch_shape) if n_samples is None else n_samples
        self.z_ext = z_ext
        self.sample_shape = self.patch_shape
        self.trafo_halo = None

        self.init_kwargs = {
            "raw_path": raw_path, "raw_key": raw_key, "label_path": label_path, "label_key": label_key,
            "patch_shape": patch_shape, "raw_transform": raw_transform, "label_transform": label_transform,
            "label_transform2": label_transform2, "transform": transform, "roi": roi, "dtype": dtype,
            "label_dtype": label_dtype, "n_samples": n_samples, "sampler": sampler, "ndim": ndim,
            "with_channels": with_channels, "with_label_channels": with_label_channels,
            "with_padding": with_padding, "z_ext": z_ext, "pre_label_transform": pre_label_transform,
        }

    def __len__(self):
        return self._len

    @property
    def ndim(self):
        return self._ndim

    def _sample_bounding_box(self):
        if self.sample_shape is None:
            if self.z_ext is None:
                bb_start = [0] * len(self.shape)
                patch_shape_for_bb = self.shape
            else:
                z_diff = self.shape[0] - self.z_ext
                bb_start = [np.random.randint(0, z_diff) if z_diff > 0 else 0] + [0] * len(self.shape[1:])
                patch_shape_for_bb = (self.z_ext, *self.shape[1:])
        else:
            bb_start = [
                np.random.randint(0, sh - psh) if sh - psh > 0 else 0
                for sh, psh in zip(self.shape, self.sample_shape)
            ]
            patch_shape_for_bb = self.sample_shape
        return tuple(slice(start, start + psh) for start, psh in zip(bb_start, patch_shape_for_bb))

    def _get_desired_raw_and_labels(self):
        bb = self._sample_bounding_box()
        bb_raw = (slice(None),) + bb if self._with_channels else bb
        bb_labels = (slice(None),) + bb if self._with_label_channels else bb
        raw, labels = np.asarray(self.raw[bb_raw]), np.asarray(self.labels[bb_labels])
        if self.pre_label_transform is not None:
            labels = self.pre_label_transform(labels)
        return raw, labels

    def _get_sample(self, index):
        if self.raw is None or self.labels is None:
            raise RuntimeError("SegmentationDataset has not been properly deserialized.")

        raw, labels = self._get_desired_raw_and_labels()

        if self.sampler is not None:
            sample_id = 0
            while not self.sampler(raw, labels):
                raw, labels = self._get_desired_raw_and_labels()
                sample_id += 1
                if sample_id > self.max_sampling_attempts:
                    raise RuntimeError(
                        f"Could not sample a valid batch in {self.max_sampling_attempts} attempts"
                    )

        if self.patch_shape is not None and self.with_padding:
            raw, labels = ensure_patch_shape(
                raw=raw, labels=labels, patch_shape=self.patch_shape,
                have_raw_channels=self._with_channels, have_label_channels=self._with_label_channels,
            )

        # squeeze singleton spatial axis for 2d-from-3d patches like (1, H, W)
        if self.patch_shape is not None and len(self.patch_shape) == self._ndim + 1:
            raw = np.squeeze(raw, axis=1 if self._with_channels else 0)
            labels = np.squeeze(labels, axis=1 if self._with_label_channels else 0)

        return raw, labels

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

        raw = ensure_array_with_channels(raw, ndim=self._ndim, dtype=self.dtype)
        labels = ensure_array_with_channels(labels, ndim=self._ndim, dtype=self.label_dtype)
        return raw, labels

    # support pickling across worker processes: drop and reopen file handles
    def __getstate__(self):
        state = self.__dict__.copy()
        del state["raw"]
        del state["labels"]
        return state

    def __setstate__(self, state):
        roi = state["roi"]
        for name, (path_key, key_key, with_ch) in {
            "raw": ("raw_path", "raw_key", "_with_channels"),
            "labels": ("label_path", "label_key", "_with_label_channels"),
        }.items():
            try:
                data = load_data(state[path_key], state[key_key])
                if roi is not None:
                    data = RoiWrapper(data, (slice(None),) + roi) if state[with_ch] else RoiWrapper(data, roi)
                state[name] = data
            except Exception:
                warnings.warn(
                    f"SegmentationDataset could not be deserialized because of missing "
                    f"{state[path_key]}, {state[key_key]}. The dataset is deserialized to allow "
                    f"loading trained models from a checkpoint, but cannot be used for training."
                )
                state[name] = None
        self.__dict__.update(state)
