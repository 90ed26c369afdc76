"""Utility layer: I/O, array helpers, inference, decoding, eval tools, export."""

from .io import load_data, load_image, supports_memmap, RoiWrapper, write_data
from .prediction import Blocking, predict_with_halo, predict_with_padding
from .reporting import get_training_summary
from .segmentation import (
    connected_components_with_boundaries, mutex_watershed_segmentation, size_filter,
    watershed_from_center_and_boundary_distances, watershed_from_components, watershed_from_maxima,
)
from .tensor import (
    ensure_array, ensure_array_with_channels, ensure_patch_shape, ensure_spatial_array, validate_roi,
)
from .util import (
    auto_compile, get_constructor_arguments, get_normalizer, get_random_colors, get_trainer,
    is_compiled, load_model, model_is_equal,
)
