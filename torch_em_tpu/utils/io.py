"""Host-side lazy I/O over container formats (HDF5, zarr, N5) and image files.

TPU-native rebuild of the reference's L0 I/O layer
(torch_em/util/image.py:32,72 ``load_image``/``load_data``): instead of
``elf.io.open_file`` (z5py/h5py) we use h5py directly for HDF5 and
`tensorstore` for zarr/N5, wrapped in a uniform lazy array interface so the
data pipeline can do chunked window reads without ever loading full volumes.
"""

import os
from typing import Any, Optional, Sequence, Tuple, Union

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None

try:
    import tensorstore as ts
except ImportError:  # pragma: no cover
    ts = None


HDF5_EXTENSIONS = (".h5", ".hdf", ".hdf5")
ZARR_EXTENSIONS = (".zarr", ".zr")
N5_EXTENSIONS = (".n5",)
IMAGE_EXTENSIONS = (".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff")
NUMPY_EXTENSIONS = (".npy",)

__all__ = [
    "load_data", "load_image", "supports_memmap", "open_container",
    "LazyTensorStore", "RoiWrapper", "write_data", "get_dataset_shape",
]


class LazyTensorStore:
    """Lazy ndarray facade over a tensorstore dataset (zarr / N5).

    Provides the minimal h5py-dataset-like interface the data pipeline needs:
    ``.shape``, ``.dtype``, ``.ndim``, ``__getitem__`` with slices/ints.
    """

    def __init__(self, store):
        self._store = store
        self.shape = tuple(store.shape)
        self.dtype = np.dtype(store.dtype.numpy_dtype)

    @property
    def ndim(self):
        return len(self.shape)

    def __len__(self):
        return self.shape[0]

    def __getitem__(self, index) -> np.ndarray:
        return np.asarray(self._store[index].read().result())


def _tensorstore_spec(path: str, key: Optional[str], driver: str) -> dict:
    spec = {
        "driver": driver,
        "kvstore": {"driver": "file", "path": path},
    }
    if key:
        spec["path"] = key.strip("/")
    return spec


def _open_tensorstore(path: str, key: Optional[str], driver: str, mode: str = "r"):
    if ts is None:
        raise RuntimeError("tensorstore is required for zarr/n5 access but is not installed.")
    spec = _tensorstore_spec(path, key, driver)
    open_kwargs = {"open": True}
    if "w" in mode or "a" in mode:
        open_kwargs.update({"create": True, "open": True})
    store = ts.open(spec, **open_kwargs).result()
    if driver == "n5":
        # the n5 ecosystem (z5py/java) stores `dimensions` column-major;
        # tensorstore exposes them as stored, so transpose to numpy (C) order.
        store = store.T
    return LazyTensorStore(store)


class _PILImageReader:
    """Lazy-ish reader for single-image files via PIL/imageio.

    Multi-page TIFF stacks are loaded as (n_pages, H, W[, C]) arrays.
    Shape is probed without decoding pixel data where PIL allows it.
    """

    def __init__(self, path: str):
        self.path = path
        self._data = None
        self.shape, self.dtype = self._probe()

    def _probe(self) -> Tuple[Tuple[int, ...], np.dtype]:
        from PIL import Image

        with Image.open(self.path) as im:
            n_frames = getattr(im, "n_frames", 1)
            w, h = im.size
            mode = im.mode
        n_channels = {"L": 0, "I": 0, "I;16": 0, "F": 0, "P": 0, "RGB": 3, "RGBA": 4, "LA": 2}.get(mode, 0)
        dtype = {"F": np.float32, "I": np.int32, "I;16": np.uint16}.get(mode, np.uint8)
        shape = (h, w) if n_channels == 0 else (h, w, n_channels)
        if n_frames > 1:
            shape = (n_frames,) + shape
        return shape, np.dtype(dtype)

    def _load(self) -> np.ndarray:
        if self._data is None:
            self._data = load_image(self.path)
        return self._data

    @property
    def ndim(self):
        return len(self.shape)

    def __getitem__(self, index) -> np.ndarray:
        return self._load()[index]

    def __array__(self, dtype=None):
        data = self._load()
        return data.astype(dtype) if dtype is not None else data


def supports_memmap(image_path: str) -> bool:
    """Whether this image file supports lazy shape probing without full decode.

    Reference behavior: torch_em/util/image.py:17 (``supports_memmap``) gates
    tifffile memmaps; here PIL gives us cheap shape probing for all image types.
    """
    return os.path.splitext(image_path)[1].lower() in IMAGE_EXTENSIONS


def load_image(image_path: str, memmap: bool = True) -> np.ndarray:
    """Load an image file into a numpy array (reference: util/image.py:32).

    Multi-page TIFFs become stacked (n_pages, H, W) arrays.
    """
    ext = os.path.splitext(image_path)[1].lower()
    if ext in NUMPY_EXTENSIONS:
        return np.load(image_path, mmap_mode="r" if memmap else None)
    if str(image_path).lower().endswith((".nii", ".nii.gz")):
        from .medical_io import load_nifti

        return load_nifti(image_path)
    if ext in (".mha", ".mhd"):
        from .medical_io import load_mha

        return load_mha(image_path)
    from PIL import Image

    with Image.open(image_path) as im:
        n_frames = getattr(im, "n_frames", 1)
        if n_frames > 1:
            frames = []
            for i in range(n_frames):
                im.seek(i)
                frames.append(np.asarray(im))
            return np.stack(frames)
        return np.asarray(im)


def _lazy_image(image_path: str):
    ext = os.path.splitext(image_path)[1].lower()
    if ext in NUMPY_EXTENSIONS:
        return np.load(image_path, mmap_mode="r")
    return _PILImageReader(image_path)


def open_container(path: str, mode: str = "r"):
    """Open an HDF5/zarr/N5 container, returning a group-like handle."""
    ext = os.path.splitext(path)[1].lower()
    if ext in HDF5_EXTENSIONS:
        if h5py is None:
            raise RuntimeError("h5py is required for HDF5 access but is not installed.")
        return h5py.File(path, mode)
    raise ValueError(f"open_container only handles HDF5 directly; got {ext}. Use load_data for zarr/n5.")


def load_data(
    path: Union[str, Sequence[str], np.ndarray],
    key: Optional[Union[str, Sequence[str]]] = None,
    mode: str = "r",
) -> Any:
    """Load data lazily from HDF5 / zarr / N5 / image / npy paths.

    Mirrors the behavior of the reference ``load_data`` (util/image.py:72):
    - container path + key -> lazy dataset handle
    - image path(s) -> arrays (stacked if a list of paths resolves to ndarrays)
    - ndarray passes through

    Returns an object with ``shape``/``dtype``/``__getitem__``.
    """
    if isinstance(path, np.ndarray):
        return path
    if isinstance(path, (list, tuple)):
        if key is None:
            return np.stack([np.asarray(load_image(p)) for p in path])
        keys = key if isinstance(key, (list, tuple)) else [key] * len(path)
        return [load_data(p, k, mode=mode) for p, k in zip(path, keys)]
    if isinstance(key, (list, tuple)):
        # one container, several keys -> lazy channel stack (reference
        # supports multi-key channel inputs, e.g. the HPA channels)
        return _StackedDatasets([load_data(path, k, mode=mode) for k in key])

    ext = os.path.splitext(path)[1].lower()
    if ext in HDF5_EXTENSIONS:
        if key is None:
            raise ValueError(f"A key is required to load data from the container file {path}.")
        f = open_container(path, mode)
        return f[key]
    if ext in ZARR_EXTENSIONS:
        return _open_tensorstore(path, key, "zarr", mode)
    if ext in N5_EXTENSIONS:
        return _open_tensorstore(path, key, "n5", mode)
    if ext in IMAGE_EXTENSIONS:
        if key is not None:
            raise ValueError(f"Expected key=None for image file {path}, got {key}.")
        return _lazy_image(path)
    if ext in NUMPY_EXTENSIONS:
        return np.load(path, mmap_mode="r" if mode == "r" else None)
    if str(path).lower().endswith((".nii", ".nii.gz")):
        from .medical_io import load_nifti

        return load_nifti(path)
    if ext in (".mha", ".mhd"):
        from .medical_io import load_mha

        return load_mha(path)
    if ext in (".mrc", ".rec"):
        from .medical_io import load_mrc

        return load_mrc(path)
    if ext == ".nrrd":
        from .medical_io import load_nrrd

        return load_nrrd(path)
    raise ValueError(f"Unsupported data format: {ext} ({path}).")


class _StackedDatasets:
    """Lazy channel-stack over several same-shaped datasets of one container;
    shape is (C, *spatial) and slicing stacks the per-key results."""

    def __init__(self, datasets):
        assert len(datasets) > 0
        shapes = {tuple(ds.shape) for ds in datasets}
        assert len(shapes) == 1, f"Inconsistent shapes for stacked keys: {shapes}"
        self._datasets = datasets
        self.shape = (len(datasets),) + tuple(datasets[0].shape)
        self.dtype = datasets[0].dtype
        self.ndim = len(self.shape)

    def __getitem__(self, index):
        if not isinstance(index, tuple):
            index = (index,)
        chan = index[0] if len(index) > 0 else slice(None)
        rest = index[1:] if len(index) > 1 else (slice(None),) * (self.ndim - 1)
        if isinstance(chan, int):
            return np.asarray(self._datasets[chan][rest])
        selected = self._datasets[chan] if isinstance(chan, slice) else \
            [self._datasets[i] for i in np.atleast_1d(chan)]
        return np.stack([np.asarray(ds[rest]) for ds in selected])


def write_data(path: str, key: Optional[str], data: np.ndarray, chunks: Optional[Tuple[int, ...]] = None) -> None:
    """Write an array into an HDF5 / zarr / N5 container or an image/npy file."""
    ext = os.path.splitext(path)[1].lower()
    if ext in HDF5_EXTENSIONS:
        with h5py.File(path, "a") as f:
            if key in f:
                del f[key]
            f.create_dataset(key, data=data, chunks=chunks, compression="gzip")
        return
    if ext in ZARR_EXTENSIONS or ext in N5_EXTENSIONS:
        driver = "zarr" if ext in ZARR_EXTENSIONS else "n5"
        spec = _tensorstore_spec(path, key, driver)
        if driver == "zarr":
            spec["metadata"] = {"shape": list(data.shape)}
            if chunks is not None:
                spec["metadata"]["chunks"] = list(chunks)
        else:  # n5 metadata is column-major: dimensions/blockSize are reversed
            spec["metadata"] = {"dimensions": list(data.shape)[::-1]}
            if chunks is not None:
                spec["metadata"]["blockSize"] = list(chunks)[::-1]
        store = ts.open(spec, create=True, delete_existing=True, dtype=ts.dtype(data.dtype)).result()
        if driver == "n5":
            store = store.T  # column-major on disk; write through the C-order view
        store[...] = data
        return
    if ext in NUMPY_EXTENSIONS:
        np.save(path, data)
        return
    if ext in IMAGE_EXTENSIONS:
        import imageio.v3 as iio

        iio.imwrite(path, data)
        return
    raise ValueError(f"Unsupported output format: {ext} ({path}).")


def get_dataset_shape(path: str, key: Optional[str] = None) -> Tuple[int, ...]:
    """Probe the shape of a dataset without reading it."""
    data = load_data(path, key)
    return tuple(data.shape)


class RoiWrapper:
    """Lazy region-of-interest view over an array-like (reference: elf.wrapper.RoiWrapper,
    used at torch_em/data/segmentation_dataset.py:98-103).

    Translates item access into the ROI coordinate system without copying.
    """

    def __init__(self, volume, roi: Tuple[slice, ...]):
        if len(roi) > getattr(volume, "ndim", len(volume.shape)):
            raise ValueError(f"ROI has more dimensions ({len(roi)}) than the data ({volume.ndim}).")
        full = tuple(
            slice(*r.indices(volume.shape[i])) if isinstance(r, slice) else slice(int(r), int(r) + 1)
            for i, r in enumerate(roi)
        )
        # extend to full dimensionality
        full = full + tuple(slice(0, s) for s in volume.shape[len(full):])
        self._volume = volume
        self._roi = full
        self.shape = tuple(r.stop - r.start for r in full)
        self.dtype = volume.dtype

    @property
    def ndim(self):
        return len(self.shape)

    def __getitem__(self, index):
        if not isinstance(index, tuple):
            index = (index,)
        index = index + tuple(slice(None) for _ in range(self.ndim - len(index)))
        mapped = []
        for ix, r, sh in zip(index, self._roi, self.shape):
            if isinstance(ix, slice):
                start, stop, _ = ix.indices(sh)
                mapped.append(slice(r.start + start, r.start + stop))
            else:
                mapped.append(r.start + int(ix))
        return self._volume[tuple(mapped)]
