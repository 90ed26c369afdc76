"""Loss wrapper and mask transforms (reference torch_em/loss/wrapper.py).

``LossWrapper`` (:7) applies a transform to (prediction, target) before the
loss; transforms: ``ApplyMask`` (:90), ``ApplyAndRemoveMask`` (:129, target
carries the mask in extra channels with target.C == 2 * pred.C),
``MaskIgnoreLabel`` (:155).

TPU note: the reference's 'crop' masking uses boolean indexing, which needs
dynamic shapes and cannot run under jit. Here 'crop' is realized as
multiplicative masking — numerically identical for the Dice family (masked
entries contribute zero to every sum) and fully static-shaped.
"""

from typing import Callable, Tuple

import jax.numpy as jnp

__all__ = ["LossWrapper", "ApplyMask", "ApplyAndRemoveMask", "MaskIgnoreLabel"]


class LossWrapper:
    """Wraps a loss with a (prediction, target) transform (reference wrapper.py:7)."""

    def __init__(self, loss: Callable, transform: Callable):
        if not callable(transform):
            raise ValueError("transform has to be callable.")
        self.loss = loss
        self.transform = transform
        self.init_kwargs = {"loss": loss, "transform": transform}

    def apply_transform(self, prediction, target, **kwargs):
        if isinstance(prediction, (list, tuple)):
            assert isinstance(target, (list, tuple))
            transformed = [self.transform(p, t, **kwargs) for p, t in zip(prediction, target)]
            return [p for p, _ in transformed], [t for _, t in transformed]
        return self.transform(prediction, target, **kwargs)

    def __call__(self, prediction, target, **kwargs):
        prediction, target = self.apply_transform(prediction, target, **kwargs)
        if isinstance(prediction, (list, tuple)):
            return sum(self.loss(p, t) for p, t in zip(prediction, target))
        return self.loss(prediction, target)


def _multiply(prediction, target, mask, channel_dim):
    mask = mask.astype(prediction.dtype)
    return prediction * mask, target * mask


class ApplyMask:
    """Mask prediction and target before the loss (reference wrapper.py:90).

    Both 'crop' and 'multiply' are realized multiplicatively (see module note).
    """

    MASKING_FUNCS = {"crop": _multiply, "multiply": _multiply}

    def __init__(self, masking_method: str = "crop", channel_dim: int = 1):
        if masking_method not in self.MASKING_FUNCS:
            raise ValueError(
                f"{masking_method} is not available, please use one of {list(self.MASKING_FUNCS)}."
            )
        self.masking_func = self.MASKING_FUNCS[masking_method]
        self.channel_dim = channel_dim
        self.init_kwargs = {"masking_method": masking_method, "channel_dim": channel_dim}

    def __call__(self, prediction, target, mask) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return self.masking_func(prediction, target, mask, self.channel_dim)


class ApplyAndRemoveMask(ApplyMask):
    """Extract the mask from extra target channels (reference wrapper.py:129)."""

    def __call__(self, prediction, target):
        assert target.ndim == prediction.ndim, f"{target.ndim}, {prediction.ndim}"
        assert target.shape[1] == 2 * prediction.shape[1], f"{target.shape[1]}, {prediction.shape[1]}"
        assert target.shape[2:] == prediction.shape[2:], f"{target.shape}, {prediction.shape}"
        separating_channel = target.shape[1] // 2
        mask = target[:, separating_channel:]
        target = target[:, :separating_channel]
        return super().__call__(prediction, target, mask)


class MaskIgnoreLabel(ApplyMask):
    """Mask an ignore label in the target (reference wrapper.py:155)."""

    def __init__(self, ignore_label: int = -1, masking_method: str = "crop", channel_dim: int = 1):
        super().__init__(masking_method, channel_dim)
        self.ignore_label = ignore_label
        self.init_kwargs["ignore_label"] = ignore_label

    def __call__(self, prediction, target):
        mask = (target != self.ignore_label)
        return super().__call__(prediction, target, mask)
