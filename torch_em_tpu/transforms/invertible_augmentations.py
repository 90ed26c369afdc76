"""Invertible augmentations for consistency training.

Rebuild of torch_em/transform/invertible_augmentations.py: weak/strong
augmentation pairs (:6-25), per-slice 3D application (:79), the invertible
augmenter that warps inputs and inverse-warps predictions (:126), and the
MeanTeacher/FixMatch/UniMatchv2 bundles (:154-184).

TPU-first: augmenters are pure functions —
``forward(rng, x) -> (warped, params)`` / ``inverse(pred, params)`` — fully
jittable with traced parameters (flips as flags, rot90 via lax.switch), so
they run inside the training step. Geometric ops act on the trailing two
spatial axes, which covers both 2D batches (B, C, H, W) and per-slice 3D
(B, C, D, H, W) — the reference's AugmentationSequential3D flattening is
implicit.
"""

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "InvertibleAugmenter", "MeanTeacherAugmenters", "FixMatchAugmenters", "UniMatchv2Augmenters",
    "DEFAULT_WEAK_AUGMENTATIONS", "DEFAULT_STRONG_AUGMENTATIONS",
]

DEFAULT_WEAK_AUGMENTATIONS = {
    "intensity": {},
    "geometrical": {"RandomHorizontalFlip": {}, "RandomVerticalFlip": {}, "RandomRotation90": {"times": (-1, 2)}},
}
DEFAULT_STRONG_AUGMENTATIONS = {
    "intensity": {
        "RandomGaussianBlur": {"kernel_size": (3, 3), "sigma": (0.1, 1.0)},
        "RandomGaussianNoise": {"mean": 0.0, "std": 0.1},
    },
    "geometrical": {"RandomHorizontalFlip": {}, "RandomVerticalFlip": {}, "RandomRotation90": {"times": (-1, 2)}},
}


def _rot90_lasttwo(x, k):
    """rot90 on the trailing two axes with a traced k (lax.switch over k % 4)."""
    fns = [
        lambda a: a,
        lambda a: jnp.rot90(a, k=1, axes=(-2, -1)),
        lambda a: jnp.rot90(a, k=2, axes=(-2, -1)),
        lambda a: jnp.rot90(a, k=3, axes=(-2, -1)),
    ]
    return jax.lax.switch(jnp.mod(k, 4), fns, x)


def _gaussian_blur3(x, sigma):
    """3x3 separable gaussian blur on the trailing two axes, traced sigma."""
    t = jnp.asarray([-1.0, 0.0, 1.0])
    kernel = jnp.exp(-0.5 * (t / jnp.maximum(sigma, 1e-3)) ** 2)
    kernel = kernel / kernel.sum()
    lead = x.shape[:-2]
    h, w = x.shape[-2:]
    flat = x.reshape(-1, h, w)

    def blur_rows(img):
        padded = jnp.pad(img, ((0, 0), (1, 1)), mode="edge")
        return padded[:, :-2] * kernel[0] + padded[:, 1:-1] * kernel[1] + padded[:, 2:] * kernel[2]

    flat = jax.vmap(blur_rows)(flat)
    flat = jax.vmap(lambda img: blur_rows(img.T).T)(flat)
    return flat.reshape(lead + (h, w))


class InvertibleAugmenter:
    """Weak/strong invertible augmenter (pure functions, see module docstring).

    Also exposes the reference's stateful API: ``transform(x)`` stores params,
    ``reverse_transform(pred)`` applies the stored inverse — usable outside jit.
    """

    def __init__(self, kind: str = "weak", p: float = 0.75,
                 times: Tuple[int, int] = (-1, 2),
                 blur_sigma: Tuple[float, float] = (0.1, 1.0), noise_std: float = 0.1,
                 seed: int = 0):
        assert kind in ("weak", "strong")
        self.kind = kind
        self.p = p
        self.times = times
        self.blur_sigma = blur_sigma
        self.noise_std = noise_std
        self.params = None
        self._np_rng = np.random.default_rng(seed)
        self.init_kwargs = {"kind": kind, "p": p, "times": times, "blur_sigma": blur_sigma,
                            "noise_std": noise_std}

    # --- pure API -----------------------------------------------------------
    def forward(self, rng, x):
        k_int, k_h, k_v, k_r, k_hp, k_vp, k_rp = jax.random.split(rng, 7)

        if self.kind == "strong":
            k_blur, k_noise, k_bs, k_bp, k_np_ = jax.random.split(k_int, 5)
            sigma = jax.random.uniform(k_bs, (), minval=self.blur_sigma[0], maxval=self.blur_sigma[1])
            blurred = _gaussian_blur3(x, sigma)
            x = jnp.where(jax.random.uniform(k_bp) < self.p, blurred, x)
            noise = jax.random.normal(k_noise, x.shape) * self.noise_std
            x = jnp.where(jax.random.uniform(k_np_) < self.p, x + noise, x)

        hflip = jax.random.uniform(k_hp) < self.p
        vflip = jax.random.uniform(k_vp) < self.p
        do_rot = jax.random.uniform(k_rp) < self.p
        k = jax.random.randint(k_r, (), self.times[0], self.times[1] + 1)
        k = jnp.where(do_rot, k, 0)

        x = jnp.where(hflip, jnp.flip(x, axis=-1), x)
        x = jnp.where(vflip, jnp.flip(x, axis=-2), x)
        x = _rot90_lasttwo(x, k)
        params = {"hflip": hflip, "vflip": vflip, "k": k}
        return x, params

    def inverse(self, pred, params):
        pred = _rot90_lasttwo(pred, -params["k"])
        pred = jnp.where(params["vflip"], jnp.flip(pred, axis=-2), pred)
        pred = jnp.where(params["hflip"], jnp.flip(pred, axis=-1), pred)
        return pred

    # --- stateful reference-style API ----------------------------------------
    def reset(self):
        self.params = None

    def transform(self, x):
        seed = int(self._np_rng.integers(0, 2 ** 31 - 1))
        out, params = self.forward(jax.random.PRNGKey(seed), jnp.asarray(np.asarray(x)))
        self.params = params
        return out

    def reverse_transform(self, x):
        assert self.params is not None, "Call transform before reverse_transform."
        return self.inverse(jnp.asarray(np.asarray(x)), self.params)


class MeanTeacherAugmenters:
    """Weak teacher / weak student augmenters (reference :154)."""

    def __init__(self, ndim: int, teacher=None, student=None):
        self.ndim = ndim
        self.teacher = teacher or InvertibleAugmenter("weak")
        self.student = student or InvertibleAugmenter("weak")
        self.init_kwargs = {"ndim": ndim}

    def reset_all(self):
        self.teacher.reset()
        self.student.reset()

    # pure API used inside the jitted step: warp the student view
    def forward(self, rng, x):
        return self.student.forward(rng, x)

    def inverse(self, pred, params):
        return self.student.inverse(pred, params)


class FixMatchAugmenters(MeanTeacherAugmenters):
    """Weak teacher / strong student augmenters (reference :169)."""

    def __init__(self, ndim: int, teacher=None, student=None):
        super().__init__(ndim, teacher or InvertibleAugmenter("weak"),
                         student or InvertibleAugmenter("strong"))


class UniMatchv2Augmenters:
    """One weak + two strong views (reference :184)."""

    def __init__(self, ndim: int, weak=None, strong1=None, strong2=None):
        self.ndim = ndim
        self.weak = weak or InvertibleAugmenter("weak")
        self.strong1 = strong1 or InvertibleAugmenter("strong")
        self.strong2 = strong2 or InvertibleAugmenter("strong")
        self.init_kwargs = {"ndim": ndim}

    def reset_all(self):
        self.weak.reset()
        self.strong1.reset()
        self.strong2.reset()
