"""bf16 full-cast training (reference torch_em/trainer/flashoptim_trainer.py:14).

The reference wraps FlashAdamW + a bf16 model cast for memory efficiency. The
TPU-native equivalent casts BOTH parameters and optimizer moments to bf16
(the parameters are normally kept f32 with bf16 compute): halves the
parameter + optimizer HBM footprint, which is the point of FlashOptim. Like
the reference, mixed precision bookkeeping and compile flags are pinned.
"""

from typing import Optional

import jax
import jax.numpy as jnp

from .default_trainer import DefaultTrainer
from .optimizers import OptimizerSpec
from .tensorboard_logger import TensorboardLogger


class FlashOptimTrainer(DefaultTrainer):
    """Trainer with bf16 parameters and bf16 AdamW moments."""

    def __init__(self, **kwargs):
        optimizer = kwargs.get("optimizer")
        if optimizer is not None and getattr(optimizer, "name", "adamw") != "adamw":
            raise ValueError(
                f"FlashOptimTrainer is currently tested with the AdamW optimizer, got "
                f"'{getattr(optimizer, 'name', type(optimizer).__name__)}'."
            )
        # pin the flags the same way the reference does (:44-56)
        kwargs["mixed_precision"] = True  # bf16 compute path
        kwargs["compile_model"] = False
        super().__init__(**kwargs)
        self._kwargs = {}

    def _initialize(self, iterations, load_from_checkpoint, epochs=None):
        best_metric = super()._initialize(iterations, load_from_checkpoint, epochs)
        # cast parameters and optimizer moments to bf16
        self.variables = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16) if jnp.issubdtype(a.dtype, jnp.floating) else a,
            self.variables,
        )
        self.opt_state = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating) and a.ndim > 0 else a,
            self.opt_state,
        )
        return best_metric
