"""Multi-step (lax.scan) execution experiment for the CREMI bench.

Measures the per-iteration cost of running k train steps in one jitted
scan over k staged batches vs dispatching k single steps. The scan form
is the `steps_per_execution` production pattern: the loader stages k
batches into one stacked device buffer; one dispatch consumes them.
"""

import os
import time

import numpy as np


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
    k = int(os.environ.get("BENCH_SCAN_K", "8"))

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

    def one_step(params, opt_state, x, y):
        def loss_fn(p):
            pred = model.module.apply({"params": p}, x, train=True)
            return loss_obj(pred, y)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state_new = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state_new, loss

    def scan_steps(variables, opt_state, xs, ys):
        def body(carry, batch):
            params, opt_state = carry
            x, y = batch
            params, opt_state, loss = one_step(params, opt_state, x, y)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (variables["params"], opt_state), (xs, ys))
        return {"params": params}, opt_state, losses

    step = jax.jit(scan_steps, donate_argnums=(0, 1))

    rng = np.random.default_rng(0)
    xs = jax.device_put(
        rng.random((k, batch_size, 1) + patch, dtype=np.float32), device)
    ys = jax.device_put(
        (rng.random((k, batch_size, 1) + patch) > 0.5).astype(np.float32), device)

    t0 = time.perf_counter()
    for _ in range(2):
        variables, opt_state, losses = step(variables, opt_state, xs, ys)
    jax.block_until_ready(losses)
    print(f"compile+warmup: {time.perf_counter() - t0:.1f} s", flush=True)

    for rep in range(3):
        t0 = time.perf_counter()
        n = max(15 // k, 2)
        for _ in range(n):
            variables, opt_state, losses = step(variables, opt_state, xs, ys)
        jax.block_until_ready(losses)
        dt = (time.perf_counter() - t0) / (n * k)
        print(f"rep{rep}: {dt * 1e3:.2f} ms/it (k={k})  loss={float(losses[-1]):.4f}",
              flush=True)


if __name__ == "__main__":
    main()
