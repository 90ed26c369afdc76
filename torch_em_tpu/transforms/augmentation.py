"""TPU-native geometric augmentation pipeline (the kornia replacement).

Rebuild of torch_em/transform/augmentation.py: ``RandomElasticDeformation``
(:91) / ``RandomElasticDeformationStacked`` (:11), the shared-parameter
pipeline ``KorniaAugmentationPipeline`` (:156, here ``AugmentationPipeline``),
the ``AUGMENTATIONS`` registry (:233) and ``get_augmentations`` (:279).

Design differences from the reference (TPU-first, SURVEY.md §7):
- every augmentation is a pair of pure functions
  ``sample_params(key, shape) -> params`` and ``apply(x, params, interp)``,
  fully jittable with static shapes;
- the same sampled params are applied to raw and labels; interpolation is
  downgraded to nearest for non-float tensors (reference augmentation.py:193);
- the pipeline can run per-sample on host (numpy in/out, jit-cached by shape)
  or batched on device inside the train step via
  :meth:`AugmentationPipeline.apply_batched`.
"""

import functools
from typing import Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "RandomHorizontalFlip", "RandomVerticalFlip", "RandomDepthicalFlip3D",
    "RandomHorizontalFlip3D", "RandomVerticalFlip3D", "RandomRotation",
    "RandomRotation3D", "RandomAffine", "RandomAffine3D",
    "RandomElasticDeformation", "RandomElasticDeformation3D",
    "AugmentationPipeline", "KorniaAugmentationPipeline",
    "AUGMENTATIONS", "DEFAULT_2D_AUGMENTATIONS", "DEFAULT_3D_AUGMENTATIONS",
    "DEFAULT_ANISOTROPIC_AUGMENTATIONS", "get_augmentations", "gaussian_blur",
]


# ---------------------------------------------------------------------------
# JAX geometry helpers
# ---------------------------------------------------------------------------

def _map_coordinates_per_channel(x: jnp.ndarray, coords: List[jnp.ndarray], order: int) -> jnp.ndarray:
    """Apply map_coordinates over the leading channel axis of x (C, *spatial)."""
    fn = lambda c: jax.scipy.ndimage.map_coordinates(c, coords, order=order, mode="nearest")
    return jax.vmap(fn)(x)


def gaussian_blur(field: jnp.ndarray, sigma: float, truncate: float = 3.0) -> jnp.ndarray:
    """Separable Gaussian blur over the trailing spatial axes of (C, *spatial)."""
    radius = max(int(np.ceil(truncate * sigma)), 1)
    t = np.arange(-radius, radius + 1, dtype="float32")
    kernel = np.exp(-0.5 * (t / max(sigma, 1e-6)) ** 2)
    kernel = jnp.asarray(kernel / kernel.sum())
    ndim = field.ndim - 1
    out = field
    for ax in range(1, ndim + 1):
        moved = jnp.moveaxis(out, ax, -1)
        shape = moved.shape
        flat = moved.reshape(-1, shape[-1])
        padded = jnp.pad(flat, ((0, 0), (radius, radius)), mode="reflect")
        blurred = jax.vmap(lambda row: jnp.convolve(row, kernel, mode="valid"))(padded)
        out = jnp.moveaxis(blurred.reshape(shape), -1, ax)
    return out


def _affine_coords(spatial_shape: Tuple[int, ...], matrix: jnp.ndarray) -> List[jnp.ndarray]:
    """Coordinates for sampling under an affine map about the image center.

    ``matrix`` is (ndim, ndim); output coords implement the inverse warp
    out(p) = in(M @ (p - c) + c).
    """
    ndim = len(spatial_shape)
    grids = jnp.meshgrid(*[jnp.arange(s, dtype=jnp.float32) for s in spatial_shape], indexing="ij")
    center = jnp.asarray([(s - 1) / 2.0 for s in spatial_shape], dtype=jnp.float32)
    stacked = jnp.stack([g - c for g, c in zip(grids, center)], axis=0).reshape(ndim, -1)
    warped = matrix @ stacked
    return [warped[d].reshape(spatial_shape) + center[d] for d in range(ndim)]


def _rot2d(angle_rad: jnp.ndarray) -> jnp.ndarray:
    c, s = jnp.cos(angle_rad), jnp.sin(angle_rad)
    return jnp.array([[c, -s], [s, c]])


def _rot3d(yaw: jnp.ndarray, pitch: jnp.ndarray, roll: jnp.ndarray) -> jnp.ndarray:
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    rz = jnp.array([[1, 0, 0], [0, cy, -sy], [0, sy, cy]])
    ry = jnp.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    rx = jnp.array([[cr, -sr, 0], [sr, cr, 0], [0, 0, 1]])
    return rz @ ry @ rx


# ---------------------------------------------------------------------------
# Augmentation primitives
# ---------------------------------------------------------------------------

class _Augmentation:
    """Base: ``sample_params`` draws randomness, ``apply`` is deterministic."""

    #: whether apply() resamples and must respect the interpolation order
    interpolating = False

    def __init__(self, p: float = 0.5):
        self.p = p

    def sample_params(self, key, spatial_shape: Tuple[int, ...]) -> Dict[str, jnp.ndarray]:
        k_apply, k_param = jax.random.split(key)
        params = self._sample(k_param, spatial_shape)
        params["apply"] = jax.random.uniform(k_apply) < self.p
        return params

    def _sample(self, key, spatial_shape) -> Dict[str, jnp.ndarray]:
        return {}

    def apply(self, x: jnp.ndarray, params: Dict[str, jnp.ndarray], order: int) -> jnp.ndarray:
        transformed = self._apply(x, params, order)
        return jnp.where(params["apply"], transformed, x)

    def _apply(self, x, params, order):
        raise NotImplementedError


class _Flip(_Augmentation):
    """Flip along a spatial axis counted from the end (-1 = W, -2 = H, -3 = D)."""

    def __init__(self, axis_from_end: int, p: float = 0.5):
        super().__init__(p)
        self.axis_from_end = axis_from_end

    def _apply(self, x, params, order):
        return jnp.flip(x, axis=x.ndim - self.axis_from_end)


class RandomHorizontalFlip(_Flip):
    def __init__(self, p: float = 0.5):
        super().__init__(axis_from_end=1, p=p)


class RandomVerticalFlip(_Flip):
    def __init__(self, p: float = 0.5):
        super().__init__(axis_from_end=2, p=p)


class RandomDepthicalFlip3D(_Flip):
    def __init__(self, p: float = 0.5):
        super().__init__(axis_from_end=3, p=p)


# the 3D flip variants act on the same trailing axes
class RandomHorizontalFlip3D(RandomHorizontalFlip):
    pass


class RandomVerticalFlip3D(RandomVerticalFlip):
    pass


class RandomRotation(_Augmentation):
    """Continuous 2D rotation by a uniform angle in [-degrees, degrees]."""

    interpolating = True

    def __init__(self, degrees: float = 90, p: float = 0.5):
        super().__init__(p)
        self.degrees = degrees

    def _sample(self, key, spatial_shape):
        angle = jax.random.uniform(key, (), minval=-self.degrees, maxval=self.degrees)
        return {"angle": jnp.deg2rad(angle)}

    def _apply(self, x, params, order):
        coords = _affine_coords(x.shape[1:], _rot2d(params["angle"]))
        return _map_coordinates_per_channel(x, coords, order)


class RandomRotation3D(_Augmentation):
    """3D rotation with independent yaw/pitch/roll angles."""

    interpolating = True

    def __init__(self, degrees: Tuple[float, float, float] = (90, 90, 90), p: float = 0.5):
        super().__init__(p)
        self.degrees = degrees

    def _sample(self, key, spatial_shape):
        keys = jax.random.split(key, 3)
        angles = [
            jnp.deg2rad(jax.random.uniform(k, (), minval=-d, maxval=d))
            for k, d in zip(keys, self.degrees)
        ]
        return {"yaw": angles[0], "pitch": angles[1], "roll": angles[2]}

    def _apply(self, x, params, order):
        mat = _rot3d(params["yaw"], params["pitch"], params["roll"])
        coords = _affine_coords(x.shape[1:], mat)
        return _map_coordinates_per_channel(x, coords, order)


class RandomAffine(_Augmentation):
    """2D rotation + isotropic scale (reference registry entry 'RandomAffine')."""

    interpolating = True

    def __init__(self, degrees: float = 90, scale: Tuple[float, float] = (0.9, 1.1), p: float = 0.5):
        super().__init__(p)
        self.degrees = degrees
        self.scale = scale

    def _sample(self, key, spatial_shape):
        k1, k2 = jax.random.split(key)
        angle = jnp.deg2rad(jax.random.uniform(k1, (), minval=-self.degrees, maxval=self.degrees))
        scale = jax.random.uniform(k2, (), minval=self.scale[0], maxval=self.scale[1])
        return {"angle": angle, "scale": scale}

    def _apply(self, x, params, order):
        mat = _rot2d(params["angle"]) / params["scale"]
        coords = _affine_coords(x.shape[1:], mat)
        return _map_coordinates_per_channel(x, coords, order)


class RandomAffine3D(_Augmentation):
    interpolating = True

    def __init__(self, degrees: Tuple[float, float, float] = (90, 90, 90),
                 scale: Tuple[float, float] = (0.9, 1.1), p: float = 0.5):
        super().__init__(p)
        self.degrees = degrees
        self.scale = scale

    def _sample(self, key, spatial_shape):
        keys = jax.random.split(key, 4)
        angles = [
            jnp.deg2rad(jax.random.uniform(k, (), minval=-d, maxval=d))
            for k, d in zip(keys[:3], self.degrees)
        ]
        lo = min(self.scale[0], self.scale[1])
        hi = max(self.scale[0], self.scale[1])
        lo = max(lo, 1e-2)  # guard degenerate scale ranges like (0.0, 1.1)
        scale = jax.random.uniform(keys[3], (), minval=lo, maxval=hi)
        return {"yaw": angles[0], "pitch": angles[1], "roll": angles[2], "scale": scale}

    def _apply(self, x, params, order):
        mat = _rot3d(params["yaw"], params["pitch"], params["roll"]) / params["scale"]
        coords = _affine_coords(x.shape[1:], mat)
        return _map_coordinates_per_channel(x, coords, order)


class RandomElasticDeformation(_Augmentation):
    """2D elastic deformation via smoothed control-point noise.

    Parity target (statistical, SURVEY.md §7 hard part #4): the reference's
    control-point noise (augmentation.py:122-132) + kornia elastic_transform2d
    (gaussian-smoothed noise × alpha added to the normalized sampling grid).
    Displacements here are ``smooth(noise) * alpha * (size-1)/2`` pixels.
    """

    interpolating = True

    def __init__(self, control_point_spacing: Union[int, Sequence[int]] = 1,
                 sigma: Tuple[float, float] = (32.0, 32.0), alpha: Tuple[float, float] = (4.0, 4.0),
                 p: float = 0.5):
        super().__init__(p)
        if isinstance(control_point_spacing, int):
            control_point_spacing = [control_point_spacing] * 2
        self.control_point_spacing = list(control_point_spacing)
        self.sigma = sigma
        self.alpha = alpha

    def _noise_field(self, key, shape2d):
        control_shape = tuple(max(sh // sp, 2) for sh, sp in zip(shape2d, self.control_point_spacing))
        noise = jax.random.uniform(key, (2,) + control_shape, minval=-1.0, maxval=1.0)
        noise = jax.image.resize(noise, (2,) + tuple(shape2d), method="cubic")
        noise = gaussian_blur(noise, float(np.mean(self.sigma)))
        return noise

    def _sample(self, key, spatial_shape):
        return {"noise": self._noise_field(key, spatial_shape[-2:])}

    def _displacement(self, shape2d, noise):
        scale = jnp.asarray(
            [float(self.alpha[0]) * (shape2d[0] - 1) / 2.0, float(self.alpha[1]) * (shape2d[1] - 1) / 2.0],
            dtype=jnp.float32,
        )
        return noise * scale[:, None, None]

    def _apply(self, x, params, order):
        shape2d = x.shape[-2:]
        disp = self._displacement(shape2d, params["noise"])
        gy, gx = jnp.meshgrid(
            jnp.arange(shape2d[0], dtype=jnp.float32), jnp.arange(shape2d[1], dtype=jnp.float32), indexing="ij"
        )
        coords = [gy + disp[0], gx + disp[1]]
        return _map_coordinates_per_channel(x, coords, order)


class RandomElasticDeformation3D(RandomElasticDeformation):
    """Plane-consistent 3D elastic deformation: the same 2D field is applied to
    every z-plane (reference RandomElasticDeformationStacked, augmentation.py:11)."""

    def __init__(self, control_point_spacing: Union[int, Sequence[int]] = 1,
                 sigma: Tuple[float, float] = (32.0, 32.0), alpha: Tuple[float, float] = (4.0, 4.0),
                 p: float = 0.5):
        super().__init__(control_point_spacing, sigma, alpha, p)

    def _apply(self, x, params, order):
        # x: (C, D, H, W) -> flatten z into channels, warp in-plane, restore
        c, d = x.shape[0], x.shape[1]
        flat = x.reshape((c * d,) + x.shape[2:])
        shape2d = flat.shape[-2:]
        disp = self._displacement(shape2d, params["noise"])
        gy, gx = jnp.meshgrid(
            jnp.arange(shape2d[0], dtype=jnp.float32), jnp.arange(shape2d[1], dtype=jnp.float32), indexing="ij"
        )
        coords = [gy + disp[0], gx + disp[1]]
        warped = _map_coordinates_per_channel(flat, coords, order)
        return warped.reshape(x.shape)


# ---------------------------------------------------------------------------
# Pipeline
# ---------------------------------------------------------------------------

_INTERPOLATABLE = (jnp.float16, jnp.float32, jnp.float64, jnp.bfloat16)


class AugmentationPipeline:
    """Applies augmentations with shared sampled params to raw & label tensors.

    Equivalent of the reference ``KorniaAugmentationPipeline``
    (augmentation.py:156): one parameter draw per augmentation per call, the
    same geometry applied to every tensor, nearest-neighbor resampling for
    integer (label) tensors, bilinear for float tensors.

    Call with numpy arrays (host path, per sample) or use
    :meth:`apply_batched` with a jax PRNG key inside a jitted step.
    """

    def __init__(self, *augmentations: _Augmentation, dtype=jnp.float32, seed: Optional[int] = None):
        self.augmentations = list(augmentations)
        self.dtype = dtype
        self._np_rng = np.random.default_rng(seed)
        self.halo = self.compute_halo()
        self._jitted = {}

    def compute_halo(self):
        halo = None
        for aug in self.augmentations:
            if isinstance(aug, RandomRotation):
                halo = [32, 32]
            if isinstance(aug, RandomRotation3D):
                halo = [32, 32, 32]
        return halo

    def is_interpolatable(self, tensor) -> bool:
        return np.dtype(tensor.dtype) in (np.dtype("float16"), np.dtype("float32"), np.dtype("float64"))

    # --- traced core -------------------------------------------------------
    def _apply_traced(self, key, tensors: Tuple[jnp.ndarray, ...], orders: Tuple[int, ...]):
        keys = jax.random.split(key, max(len(self.augmentations), 1))
        out = list(tensors)
        for aug, k in zip(self.augmentations, keys):
            params = aug.sample_params(k, out[0].shape[1:])
            for i, t in enumerate(out):
                order = orders[i] if aug.interpolating else 0
                out[i] = aug.apply(t, params, order)
        return tuple(out)

    def apply_batched(self, key, *tensors: jnp.ndarray, interpolatable: Optional[Sequence[bool]] = None):
        """Batched on-device application: tensors are (B, C, *spatial); an
        independent parameter draw per batch element (vmapped)."""
        if interpolatable is None:
            interpolatable = [t.dtype in _INTERPOLATABLE for t in tensors]
        orders = tuple(1 if it else 0 for it in interpolatable)
        batch = tensors[0].shape[0]
        keys = jax.random.split(key, batch)
        fn = lambda k, *ts: self._apply_traced(k, ts, orders)
        return jax.vmap(fn)(keys, *tensors)

    # --- host path ---------------------------------------------------------
    def __call__(self, *tensors) -> List[np.ndarray]:
        interpolatable = [self.is_interpolatable(t) for t in tensors]
        arrays = tuple(jnp.asarray(np.asarray(t), dtype=self.dtype) for t in tensors)
        orders = tuple(1 if it else 0 for it in interpolatable)
        shapes = tuple(a.shape for a in arrays)
        cache_key = (shapes, orders)
        if cache_key not in self._jitted:
            self._jitted[cache_key] = jax.jit(functools.partial(self._apply_traced, orders=orders))
        seed = int(self._np_rng.integers(0, 2**31 - 1))
        # keep the per-sample host path on the CPU backend so it never contends
        # with device training work
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            out = self._jitted[cache_key](jax.random.PRNGKey(seed), arrays)
        return [np.asarray(o) for o in out]


# API-compatibility alias (the reference exposes KorniaAugmentationPipeline)
KorniaAugmentationPipeline = AugmentationPipeline


AUGMENTATIONS = {
    "RandomAffine": {"degrees": 90, "scale": (0.9, 1.1)},
    "RandomAffine3D": {"degrees": (90, 90, 90), "scale": (0.0, 1.1)},
    "RandomDepthicalFlip3D": {},
    "RandomHorizontalFlip": {},
    "RandomHorizontalFlip3D": {},
    "RandomRotation": {"degrees": 90},
    "RandomRotation3D": {"degrees": (90, 90, 90)},
    "RandomVerticalFlip": {},
    "RandomVerticalFlip3D": {},
    "RandomElasticDeformation": {},
    "RandomElasticDeformation3D": {"alpha": [5, 5], "sigma": [30, 30]},
}
"""All available augmentations and their default parameters (reference augmentation.py:233)."""

DEFAULT_2D_AUGMENTATIONS = ["RandomHorizontalFlip", "RandomVerticalFlip"]
DEFAULT_3D_AUGMENTATIONS = ["RandomHorizontalFlip3D", "RandomVerticalFlip3D", "RandomDepthicalFlip3D"]
DEFAULT_ANISOTROPIC_AUGMENTATIONS = ["RandomHorizontalFlip3D", "RandomVerticalFlip3D", "RandomDepthicalFlip3D"]


def create_augmentation(trafo: str) -> _Augmentation:
    if trafo not in globals():
        raise ValueError(f"Transformation {trafo} not defined")
    return globals()[trafo](**AUGMENTATIONS.get(trafo, {}))


def get_augmentations(ndim: Union[int, str] = 2, transforms: Optional[Sequence[str]] = None,
                      dtype=jnp.float32) -> AugmentationPipeline:
    """Build the default augmentation pipeline (reference augmentation.py:279)."""
    if transforms is None:
        assert ndim in (2, 3, "anisotropic"), f"Expect ndim to be one of (2, 3, 'anisotropic'), got {ndim}"
        if ndim == 2:
            transforms = DEFAULT_2D_AUGMENTATIONS
        elif ndim == 3:
            transforms = DEFAULT_3D_AUGMENTATIONS
        else:
            transforms = DEFAULT_ANISOTROPIC_AUGMENTATIONS
    augs = [create_augmentation(t) if isinstance(t, str) else t for t in transforms]
    pipeline = AugmentationPipeline(*augs, dtype=dtype)
    pipeline.init_kwargs = {"ndim": ndim, "transforms": [t for t in transforms if isinstance(t, str)] or None}
    pipeline.factory = "torch_em_tpu.transforms.augmentation.get_augmentations"
    return pipeline
