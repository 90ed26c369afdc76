"""ctypes bindings for the native (C++) host ops: watershed, mutex watershed.

The shared library is built lazily with g++ on first use and cached under
``~/.cache/tpu_em`` keyed by a source hash; rebuilds happen automatically when
the C++ source changes.
"""

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import List, Optional, Sequence

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "tem_native.cpp")
_CACHE_DIR = os.environ.get("TPU_EM_CACHE", os.path.expanduser("~/.cache/tpu_em"))
_LIB = None
_LOCK = threading.Lock()

__all__ = ["watershed", "mutex_watershed", "connected_components_labels", "is_available"]


def _build_library() -> str:
    with open(_SRC, "rb") as f:
        src = f.read()
    digest = hashlib.sha256(src).hexdigest()[:16]
    os.makedirs(_CACHE_DIR, exist_ok=True)
    lib_path = os.path.join(_CACHE_DIR, f"libtem_native_{digest}.so")
    if os.path.exists(lib_path):
        return lib_path
    tmp_path = lib_path + f".tmp{os.getpid()}"
    cmd = [
        "g++", "-O3", "-std=c++17", "-fPIC", "-shared", "-march=native",
        _SRC, "-o", tmp_path,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except subprocess.CalledProcessError as e:
        raise RuntimeError(f"Failed to build tem_native: {e.stderr}") from e
    os.replace(tmp_path, lib_path)
    return lib_path


def _get_lib():
    global _LIB
    if _LIB is None:
        with _LOCK:
            if _LIB is None:
                lib = ctypes.CDLL(_build_library())
                lib.watershed.argtypes = [
                    ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint32),
                    ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
                ]
                lib.mutex_watershed.argtypes = [
                    ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
                    ctypes.POINTER(ctypes.c_int64), ctypes.c_int, ctypes.POINTER(ctypes.c_int64),
                    ctypes.c_int, ctypes.c_uint64, ctypes.c_void_p,
                    ctypes.POINTER(ctypes.c_uint32),
                ]
                lib.connected_components_labels.argtypes = [
                    ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
                    ctypes.POINTER(ctypes.c_uint32),
                ]
                _LIB = lib
    return _LIB


def is_available() -> bool:
    try:
        _get_lib()
        return True
    except Exception:
        return False


def _as_c(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def watershed(hmap: np.ndarray, seeds: np.ndarray, mask: Optional[np.ndarray] = None) -> np.ndarray:
    """Seeded watershed via priority flood (skimage.watershed functional spec).

    Args:
        hmap: Height map (float).
        seeds: Seed labels (nonzero = seed); not modified.
        mask: Optional boolean mask restricting the flood.

    Returns:
        The labels grown from the seeds.
    """
    lib = _get_lib()
    hmap = np.ascontiguousarray(hmap, dtype="float32")
    labels = np.ascontiguousarray(seeds, dtype="uint32").copy()
    shape = np.asarray(hmap.shape, dtype="int64")
    assert labels.shape == hmap.shape
    if mask is not None:
        mask_arr = np.ascontiguousarray(mask, dtype="uint8")
        assert mask_arr.shape == hmap.shape
        mask_ptr = mask_arr.ctypes.data_as(ctypes.c_void_p)
    else:
        mask_arr = None
        mask_ptr = None
    lib.watershed(
        _as_c(hmap, ctypes.c_float), _as_c(labels, ctypes.c_uint32), mask_ptr,
        _as_c(shape, ctypes.c_int64), hmap.ndim,
    )
    return labels


def mutex_watershed(
    affinities: np.ndarray,
    offsets: List[List[int]],
    strides: Optional[Sequence[int]] = None,
    randomize_strides: bool = False,
    mask: Optional[np.ndarray] = None,
    seed: int = 0,
) -> np.ndarray:
    """Mutex watershed segmentation (elf.segmentation.mutex_watershed spec).

    ``affinities`` follow the training (disaffinity) convention: 1 = boundary.
    The first ndim offsets are attractive, the rest repulsive; strides
    subsample repulsive edges.
    """
    lib = _get_lib()
    affinities = np.ascontiguousarray(affinities, dtype="float32")
    n_offsets = affinities.shape[0]
    spatial = affinities.shape[1:]
    ndim = len(spatial)
    assert len(offsets) == n_offsets
    assert all(len(off) == ndim for off in offsets)
    offsets_arr = np.ascontiguousarray(np.asarray(offsets, dtype="int64"))
    if strides is None:
        strides = [1] * ndim
    strides_arr = np.ascontiguousarray(np.asarray(strides, dtype="int64"))
    shape = np.asarray(spatial, dtype="int64")
    out = np.zeros(spatial, dtype="uint32")
    if mask is not None:
        mask_arr = np.ascontiguousarray(mask, dtype="uint8")
        mask_ptr = mask_arr.ctypes.data_as(ctypes.c_void_p)
    else:
        mask_arr = None
        mask_ptr = None
    lib.mutex_watershed(
        _as_c(affinities, ctypes.c_float), _as_c(offsets_arr, ctypes.c_int64), n_offsets,
        _as_c(shape, ctypes.c_int64), ndim, _as_c(strides_arr, ctypes.c_int64),
        int(randomize_strides), seed, mask_ptr, _as_c(out, ctypes.c_uint32),
    )
    return out


def connected_components_labels(seg: np.ndarray) -> np.ndarray:
    """Connected components of a label image (same id + adjacency)."""
    lib = _get_lib()
    seg = np.ascontiguousarray(seg, dtype="uint32")
    shape = np.asarray(seg.shape, dtype="int64")
    out = np.zeros(seg.shape, dtype="uint32")
    lib.connected_components_labels(
        _as_c(seg, ctypes.c_uint32), _as_c(shape, ctypes.c_int64), seg.ndim,
        _as_c(out, ctypes.c_uint32),
    )
    return out
