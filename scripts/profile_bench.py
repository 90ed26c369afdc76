"""Capture a jax.profiler trace of the CREMI bench train step and print an
op-level time breakdown (aggregated from the perfetto trace JSON).

Usage: python scripts/profile_bench.py [outdir]
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict


def capture(outdir):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp
    import numpy as np

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

    for _ in range(3):
        variables, opt_state, loss = step(variables, opt_state, x, y)
    jax.block_until_ready(loss)

    with jax.profiler.trace(outdir):
        for _ in range(5):
            variables, opt_state, loss = step(variables, opt_state, x, y)
        jax.block_until_ready(loss)


def analyze(outdir):
    traces = sorted(glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"), recursive=True))
    if not traces:
        print("no trace found under", outdir)
        return
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # find TPU op tracks: process names containing "TPU" / thread "XLA Ops"
    pid_name = {}
    tid_name = {}
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                pid_name[e["pid"]] = e["args"].get("name", "")
            if e.get("name") == "thread_name":
                tid_name[(e["pid"], e["tid"])] = e["args"].get("name", "")
    op_time = defaultdict(float)
    op_count = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        tname = tid_name.get((e.get("pid"), e.get("tid")), "")
        pname = pid_name.get(e.get("pid"), "")
        if "XLA Ops" not in tname:
            continue
        if "TPU" not in pname and "tpu" not in pname.lower():
            # axon platform may report differently; accept all XLA Ops tracks
            pass
        dur = e.get("dur", 0) / 1e3  # ms
        name = e.get("name", "?")
        # collapse fusion instance suffixes
        base = name.split(".")[0]
        op_time[base] += dur
        op_count[base] += 1
        total += dur
    print(f"total XLA-op time: {total:.2f} ms over 5 steps -> {total/5:.2f} ms/step")
    rows = sorted(op_time.items(), key=lambda kv: -kv[1])
    print(f"{'op':55s} {'ms':>9s} {'%':>6s} {'count':>6s}")
    for name, t in rows[:45]:
        print(f"{name[:55]:55s} {t:9.2f} {100*t/total:6.2f} {op_count[name]:6d}")


if __name__ == "__main__":
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace_bench"
    if not os.environ.get("ANALYZE_ONLY"):
        capture(outdir)
    analyze(outdir)
