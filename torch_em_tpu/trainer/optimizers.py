"""Optimizer specs + host-driven LR scheduling.

The reference uses torch.optim.AdamW + ReduceLROnPlateau
(torch_em/segmentation.py:540-541). The TPU-native equivalent is an optax
chain wrapped in ``optax.inject_hyperparams`` so the learning rate lives in
the optimizer state as a mutable scalar — the host-side plateau scheduler can
adjust it between epochs without recompiling the jitted train step.

``OptimizerSpec`` and ``ReduceLROnPlateau`` both follow the ``init_kwargs``
convention so they round-trip through checkpoint serialization.
"""

from typing import Any, Dict, Optional

import optax

__all__ = ["OptimizerSpec", "ReduceLROnPlateau", "get_learning_rate", "set_learning_rate"]


_OPTIMIZERS = {
    "adam": optax.adam,
    "adamw": optax.adamw,
    "sgd": optax.sgd,
    "rmsprop": optax.rmsprop,
    "adagrad": optax.adagrad,
    "lamb": optax.lamb,
    "lion": optax.lion,
}


class OptimizerSpec:
    """Serializable optimizer description; ``build()`` yields the optax chain."""

    def __init__(self, name: str = "adamw", lr: float = 1e-4, grad_clip: Optional[float] = None, **kwargs):
        if name.lower() not in _OPTIMIZERS:
            raise ValueError(f"Unknown optimizer {name}; available: {sorted(_OPTIMIZERS)}")
        self.name = name.lower()
        self.lr = lr
        self.grad_clip = grad_clip
        self.kwargs = kwargs
        self.init_kwargs = {"name": name, "lr": lr, "grad_clip": grad_clip, **kwargs}

    def build(self) -> optax.GradientTransformation:
        def make(learning_rate):
            opt = _OPTIMIZERS[self.name](learning_rate=learning_rate, **self.kwargs)
            if self.grad_clip is not None:
                opt = optax.chain(optax.clip_by_global_norm(self.grad_clip), opt)
            return opt

        return optax.inject_hyperparams(make)(learning_rate=self.lr)


def _hyperparams(opt_state):
    # inject_hyperparams exposes .hyperparams on its state
    if hasattr(opt_state, "hyperparams"):
        return opt_state.hyperparams
    raise ValueError("Optimizer state does not expose hyperparams; build it via OptimizerSpec.")


def get_learning_rate(opt_state) -> float:
    return float(_hyperparams(opt_state)["learning_rate"])


def set_learning_rate(opt_state, lr: float):
    import jax.numpy as jnp

    hp = _hyperparams(opt_state)
    old = hp["learning_rate"]
    # keep the leaf a jnp scalar of the same dtype so the jitted step does not retrace
    hp["learning_rate"] = jnp.asarray(lr, dtype=getattr(old, "dtype", jnp.float32))
    return opt_state


class ReduceLROnPlateau:
    """Host-side plateau LR scheduler (torch ReduceLROnPlateau parity).

    ``step(metric)`` is called once per epoch with the validation metric
    (lower = better by framework convention, SURVEY.md §5.5); on plateau the
    learning rate in the optimizer state is scaled by ``factor``.
    """

    def __init__(self, mode: str = "min", factor: float = 0.5, patience: int = 5,
                 threshold: float = 1e-4, threshold_mode: str = "rel",
                 min_lr: float = 0.0, verbose: bool = False):
        assert mode in ("min", "max")
        assert threshold_mode in ("rel", "abs")
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.threshold_mode = threshold_mode
        self.min_lr = min_lr
        self.verbose = verbose
        self.best: Optional[float] = None
        self.num_bad_epochs = 0
        self._trainer = None
        self.init_kwargs = {
            "mode": mode, "factor": factor, "patience": patience, "threshold": threshold,
            "threshold_mode": threshold_mode, "min_lr": min_lr, "verbose": verbose,
        }

    def attach(self, trainer):
        self._trainer = trainer
        return self

    def _is_better(self, current: float) -> bool:
        if self.best is None:
            return True
        if self.threshold_mode == "rel":
            if self.mode == "min":
                return current < self.best * (1.0 - self.threshold)
            return current > self.best * (1.0 + self.threshold)
        if self.mode == "min":
            return current < self.best - self.threshold
        return current > self.best + self.threshold

    def step(self, metric: float):
        metric = float(metric)
        if self._is_better(metric):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.num_bad_epochs > self.patience:
            self.num_bad_epochs = 0
            if self._trainer is not None:
                old_lr = get_learning_rate(self._trainer.opt_state)
                new_lr = max(old_lr * self.factor, self.min_lr)
                if new_lr < old_lr:
                    set_learning_rate(self._trainer.opt_state, new_lr)
                    if self.verbose:
                        print(f"ReduceLROnPlateau: reducing learning rate to {new_lr:.3e}")

    def state_dict(self) -> Dict[str, Any]:
        return {"best": self.best, "num_bad_epochs": self.num_bad_epochs}

    def load_state_dict(self, state: Dict[str, Any]):
        self.best = state.get("best")
        self.num_bad_epochs = state.get("num_bad_epochs", 0)
