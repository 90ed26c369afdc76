"""The tracked CREMI bench configuration, shared by the perf experiment
scripts (ab_matrix, loader_scaling, copy_analysis) so the model/step they
measure cannot drift from each other. ``bench.py`` (the driver-facing
artifact at the repo root) intentionally stays self-contained; keep its
config in sync with this one — the committed nominal-FLOP table's
param-count fingerprint catches a silent divergence on the bench side.
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

PATCH = (32, 256, 256)
BATCH = 1


def build():
    """Returns (model, loss_obj, tx, train_step) for the tracked config."""
    import jax
    import jax.numpy as jnp

    from torch_em_tpu.loss import DiceLoss
    from torch_em_tpu.models import AnisotropicUNet
    from torch_em_tpu.trainer.optimizers import OptimizerSpec

    model = AnisotropicUNet(
        in_channels=1, out_channels=1,
        scale_factors=[[1, 2, 2], [1, 2, 2], [2, 2, 2], [2, 2, 2]],
        initial_features=32, final_activation="Sigmoid", anisotropic_kernel=True,
        dtype=jnp.bfloat16)
    loss_obj = DiceLoss()
    tx = OptimizerSpec("adamw", lr=1e-4).build()

    def train_step(variables, opt_state, x, y):
        def loss_fn(p):
            pred = model.module.apply({"params": p}, x, train=True)
            return loss_obj(pred, y)

        loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
        updates, opt_state_new = tx.update(grads, opt_state, variables["params"])
        params = jax.tree_util.tree_map(lambda p, u: p + u,
                                        variables["params"], updates)
        return {"params": params}, opt_state_new, loss

    return model, loss_obj, tx, train_step


def example_batch(rng=None, batch=BATCH, patch=PATCH):
    rng = rng or np.random.default_rng(0)
    x = rng.random((batch, 1) + patch, dtype=np.float32)
    y = (rng.random((batch, 1) + patch) > 0.5).astype(np.float32)
    return x, y
