"""EM defect augmentations (reference torch_em/transform/defect.py).

Simulates slice-level acquisition defects in 3D EM stacks: dropped slices
(:94), low contrast (:100), slice deformations (compress with a blacked-out
line, or undirected smooth warps), and pasted artifacts from a
SegmentationDataset artifact source with alpha masks (:23-37), selected by
cumulative probabilities (:72-77). This is a host-side per-sample transform
(irregular, data-dependent control flow), using numpy/scipy instead of
skimage (line rasterization and CC implemented locally).
"""

from typing import Optional

import numpy as np
from scipy import ndimage

from ..data.sampler import MinForegroundSampler
from ..data.segmentation_dataset import SegmentationDataset
from ..ops import host as ops
from .augmentation import get_augmentations
from .raw import standardize

__all__ = ["EMDefectAugmentation", "get_artifact_source"]


def get_artifact_source(artifact_path, patch_shape, min_mask_fraction, normalizer=standardize,
                        raw_key="artifacts", mask_key="alpha_mask"):
    """Artifact source dataset for paste-artifact augmentation (reference defect.py:23)."""
    augmentation = get_augmentations(ndim=2)
    sampler = MinForegroundSampler(min_mask_fraction)
    return SegmentationDataset(
        artifact_path, raw_key, artifact_path, mask_key,
        patch_shape=patch_shape, raw_transform=normalizer, transform=augmentation, sampler=sampler,
    )


def _draw_line(x0, y0, x1, y1):
    """Integer coordinates of the line from (x0,y0) to (x1,y1) (Bresenham-ish;
    functional spec: skimage.draw.line)."""
    n = int(max(abs(x1 - x0), abs(y1 - y0))) + 1
    rr = np.round(np.linspace(x0, x1, n)).astype(int)
    cc = np.round(np.linspace(y0, y1, n)).astype(int)
    return rr, cc


class EMDefectAugmentation:
    """Augment raw data with EM-defect-like transformations (reference defect.py:40)."""

    def __init__(
        self,
        p_drop_slice: float,
        p_low_contrast: float,
        p_deform_slice: float,
        p_paste_artifact: float = 0.0,
        contrast_scale: float = 0.1,
        deformation_mode: str = "undirected",
        deformation_strength: float = 10.0,
        artifact_source=None,
        mean_val: Optional[float] = None,
        std_val: Optional[float] = None,
    ):
        if p_paste_artifact > 0.0:
            assert artifact_source is not None
        self.artifact_source = artifact_source

        # cumulative probabilities
        self.p_drop_slice = p_drop_slice
        self.p_low_contrast = self.p_drop_slice + p_low_contrast
        self.p_deform_slice = self.p_low_contrast + p_deform_slice
        self.p_paste_artifact = self.p_deform_slice + p_paste_artifact
        assert self.p_paste_artifact < 1.0

        self.contrast_scale = contrast_scale
        self.mean_val = mean_val
        self.std_val = std_val

        if isinstance(deformation_mode, str):
            assert deformation_mode in ("all", "undirected", "compress")
            self.deformation_mode = deformation_mode
        elif isinstance(deformation_mode, (list, tuple)):
            assert len(deformation_mode) == 2
            assert "undirected" in deformation_mode and "compress" in deformation_mode
            self.deformation_mode = "all"
        self.deformation_strength = deformation_strength

        self.init_kwargs = {
            "p_drop_slice": p_drop_slice, "p_low_contrast": p_low_contrast,
            "p_deform_slice": p_deform_slice, "p_paste_artifact": p_paste_artifact,
            "contrast_scale": contrast_scale, "deformation_mode": deformation_mode,
            "deformation_strength": deformation_strength, "artifact_source": artifact_source,
            "mean_val": mean_val, "std_val": std_val,
        }

    def drop_slice(self, raw):
        raw[:] = 0
        return raw

    def low_contrast(self, raw):
        mean = raw.mean()
        raw -= mean
        raw *= self.contrast_scale
        raw += mean
        return raw

    def compress_slice(self, raw):
        """Missing line of data with the rest compressed towards it (reference :108)."""
        shape = raw.shape
        fixed_x = np.random.rand() < 0.5
        if fixed_x:
            x0, y0 = 0, np.random.randint(1, shape[1] - 2)
            x1, y1 = shape[0] - 1, np.random.randint(1, shape[1] - 2)
        else:
            x0, y0 = np.random.randint(1, shape[0] - 2), 0
            x1, y1 = np.random.randint(1, shape[0] - 2), shape[1] - 1

        line_mask = np.zeros_like(raw, dtype="bool")
        rr, cc = _draw_line(x0, y0, x1, y1)
        line_mask[rr, cc] = 1

        line_vector = np.array([x1 - x0, y1 - y0], dtype="float32")
        line_vector /= np.linalg.norm(line_vector)
        normal_vector = np.array([-line_vector[1], line_vector[0]])

        x, y = np.meshgrid(np.arange(shape[1]), np.arange(shape[0]))
        flow_x, flow_y = np.zeros_like(raw), np.zeros_like(raw)

        components = ops.connected_components(np.logical_not(line_mask))
        if len(np.unique(components)) == 3:
            neg_val = components[0, 0] if fixed_x else components[-1, -1]
            pos_val = components[-1, -1] if fixed_x else components[0, 0]
            flow_x[components == pos_val] = self.deformation_strength * normal_vector[1]
            flow_y[components == pos_val] = self.deformation_strength * normal_vector[0]
            flow_x[components == neg_val] = -self.deformation_strength * normal_vector[1]
            flow_y[components == neg_val] = -self.deformation_strength * normal_vector[0]

        flow_x += np.random.uniform(-1, 1, shape) * (self.deformation_strength / 8.0)
        flow_y += np.random.uniform(-1, 1, shape) * (self.deformation_strength / 8.0)

        flow_x, flow_y = (x + flow_x).reshape(-1, 1), (y + flow_y).reshape(-1, 1)
        cval = 0.0 if self.mean_val is None else self.mean_val
        raw = ndimage.map_coordinates(
            raw, (flow_y, flow_x), mode="constant", order=3, cval=cval
        ).reshape(shape)

        line_mask = ndimage.binary_dilation(line_mask, iterations=10)
        raw[line_mask] = 0.0
        return raw

    def undirected_deformation(self, raw):
        shape = raw.shape
        x, y = np.meshgrid(np.arange(shape[0]), np.arange(shape[1]))
        flow_x = ndimage.gaussian_filter(
            np.random.uniform(-1, 1, shape) * self.deformation_strength, sigma=3.0
        )
        flow_y = ndimage.gaussian_filter(
            np.random.uniform(-1, 1, shape) * self.deformation_strength, sigma=3.0
        )
        flow_x, flow_y = (x + flow_x).reshape(-1, 1), (y + flow_y).reshape(-1, 1)
        raw = ndimage.map_coordinates(raw, (flow_y, flow_x), mode="constant").reshape(shape)
        return raw

    def deform_slice(self, raw):
        if self.deformation_mode in ("undirected", "compress"):
            mode = self.deformation_mode
        else:
            mode = "undirected" if np.random.rand() < 0.5 else "compress"
        return self.compress_slice(raw) if mode == "compress" else self.undirected_deformation(raw)

    def paste_artifact(self, raw):
        artifact_index = np.random.randint(len(self.artifact_source))
        artifact, alpha_mask = self.artifact_source[artifact_index]
        artifact = np.asarray(artifact).squeeze()
        alpha_mask = np.asarray(alpha_mask).squeeze()
        assert artifact.shape == raw.shape, f"{artifact.shape}, {raw.shape}"
        assert alpha_mask.shape == raw.shape
        assert alpha_mask.min() >= 0.0 and alpha_mask.max() <= 1.0
        return raw * (1.0 - alpha_mask) + artifact * alpha_mask

    def __call__(self, raw: np.ndarray) -> np.ndarray:
        raw = np.asarray(raw).astype("float32")
        for z in range(raw.shape[0]):
            r = np.random.rand()
            if r < self.p_drop_slice:
                raw[z] = self.drop_slice(raw[z])
            elif r < self.p_low_contrast:
                raw[z] = self.low_contrast(raw[z])
            elif r < self.p_deform_slice:
                raw[z] = self.deform_slice(raw[z])
            elif r < self.p_paste_artifact:
                raw[z] = self.paste_artifact(raw[z])
        return raw
