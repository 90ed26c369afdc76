"""Utility layer: I/O, array helpers, serialization registry."""

from .io import load_data, load_image, supports_memmap, RoiWrapper, write_data
from .tensor import (
    ensure_array, ensure_spatial_array, ensure_array_with_channels, ensure_patch_shape, validate_roi,
)
