"""Minimal CREMI train-step timing (the primary bench metric only) for the
MFU iteration loop. Uses the persistent compile cache and prints ms/it.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    from torch_em_tpu.loss import DiceLoss
    from torch_em_tpu.models import AnisotropicUNet
    from torch_em_tpu.trainer.optimizers import OptimizerSpec

    patch = tuple(int(x) for x in os.environ.get("BENCH_PATCH", "32,256,256").split(","))
    batch_size = int(os.environ.get("BENCH_BATCH", "1"))

    model = AnisotropicUNet(
        in_channels=1, out_channels=1,
        scale_factors=[[1, 2, 2], [1, 2, 2], [2, 2, 2], [2, 2, 2]],
        initial_features=32, final_activation="Sigmoid", anisotropic_kernel=True,
        dtype=jnp.bfloat16,
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
    x = jax.device_put(rng.random((batch_size, 1) + patch, dtype=np.float32), device)
    y = jax.device_put((rng.random((batch_size, 1) + patch) > 0.5).astype(np.float32), device)

    # perf-switch A/Bs from env, e.g. SB_PHASE_WPAD=1 SB_PALLAS_NORM=0
    from torch_em_tpu.models.unet import perf_options

    flag_kwargs = {}
    for arg in ("packing", "pallas_norm", "norm_fold", "packed_conv_mode",
                "phase_packing", "phase_wpad"):
        env = os.environ.get("SB_" + arg.upper())
        if env is not None:
            flag_kwargs[arg] = env if arg == "packed_conv_mode" else env == "1"
    if flag_kwargs:
        print("flags:", flag_kwargs, flush=True)

    t0 = time.perf_counter()
    with perf_options(**flag_kwargs):
        for _ in range(3):
            variables, opt_state, loss = step(variables, opt_state, x, y)
        jax.block_until_ready(loss)
    print(f"compile+warmup: {time.perf_counter() - t0:.1f} s", flush=True)

    for rep in range(3):
        t0 = time.perf_counter()
        n = 15
        for _ in range(n):
            variables, opt_state, loss = step(variables, opt_state, x, y)
        jax.block_until_ready(loss)
        dt = (time.perf_counter() - t0) / n
        print(f"rep{rep}: {dt * 1e3:.2f} ms/it  loss={float(loss):.4f}", flush=True)


if __name__ == "__main__":
    main()
