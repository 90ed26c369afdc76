"""Ablation timings on the CREMI bench step: phase on/off x norm on/off.

Isolates where the phase mode's expected ~5 ms L0 saving goes: if
norm=None closes the gap, the masked-norm path is the drag; if not, it's
the conv-adjacent copies on the odd-sized shifted grid.
"""

import os
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import jax.numpy as jnp

from torch_em_tpu.loss import DiceLoss
from torch_em_tpu.models import AnisotropicUNet
from torch_em_tpu.models import unet as um
from torch_em_tpu.trainer.optimizers import OptimizerSpec


def measure(phase, norm):
    model = AnisotropicUNet(
        in_channels=1, out_channels=1,
        scale_factors=[[1, 2, 2], [1, 2, 2], [2, 2, 2], [2, 2, 2]],
        initial_features=32, final_activation="Sigmoid", anisotropic_kernel=True,
        norm=norm, dtype=jnp.bfloat16,
    )
    loss_obj = DiceLoss()
    tx = OptimizerSpec("adamw", lr=1e-4).build()
    device = jax.devices()[0]
    variables = jax.device_put(model.variables, device)
    opt_state = jax.device_put(tx.init(variables["params"]), device)

    def train_step(variables, opt_state, x, y):
        def loss_fn(p):
            pred = model.module.apply({"params": p}, x, train=True)
            return loss_obj(pred, y)
        loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
        updates, opt_state_new = tx.update(grads, opt_state, variables["params"])
        params = jax.tree_util.tree_map(lambda p, u: p + u, variables["params"], updates)
        return {"params": params}, opt_state_new, loss

    step = jax.jit(train_step, donate_argnums=(0, 1))
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.random((1, 1, 32, 256, 256), dtype=np.float32), device)
    y = jax.device_put((rng.random((1, 1, 32, 256, 256)) > 0.5).astype(np.float32), device)
    for _ in range(3):
        variables, opt_state, loss = step(variables, opt_state, x, y)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(15):
        variables, opt_state, loss = step(variables, opt_state, x, y)
    jax.block_until_ready(loss)
    return (time.perf_counter() - t0) / 15 * 1000


def main():
    for phase in (True, False):
        for norm in ("InstanceNorm", None):
            with um.perf_options(phase_packing=phase):
                dt = measure(phase, norm)
            print(f"phase={phase!s:5s} norm={str(norm):12s}: {dt:7.2f} ms/it",
                  flush=True)


if __name__ == "__main__":
    main()
