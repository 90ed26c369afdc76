"""Device-trace profile of the tracked bench train step.

Runs the exact bench.py config (AnisotropicUNet f=32, patch (32,256,256),
bs1 bf16, jitted donated train step) under the JAX profiler and aggregates
XLA-op device time by op family, so the remaining non-MXU time is visible.

Usage:  python experiments/perf/full_step_profile.py [wpad]
"""

import glob
import gzip
import json
import sys
from collections import defaultdict

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
sys.path.insert(0, "/root/repo")

from torch_em_tpu.loss import DiceLoss
from torch_em_tpu.models import AnisotropicUNet
from torch_em_tpu.models.unet import perf_options
from torch_em_tpu.trainer.optimizers import OptimizerSpec

OUT = "/tmp/jax_trace_full_step"


def main():
    use_wpad = len(sys.argv) > 1 and sys.argv[1] == "wpad"
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

    rng = np.random.default_rng(0)
    x = jax.device_put(rng.random((1, 1, 32, 256, 256), dtype=np.float32), device)
    y = jax.device_put((rng.random((1, 1, 32, 256, 256)) > 0.5).astype(np.float32), device)

    with perf_options(phase_wpad=use_wpad) if use_wpad else _null():
        step = jax.jit(train_step, donate_argnums=(0, 1))
        for _ in range(3):
            variables, opt_state, loss = step(variables, opt_state, x, y)
        jax.block_until_ready(loss)

        with jax.profiler.trace(OUT):
            for _ in range(4):
                variables, opt_state, loss = step(variables, opt_state, x, y)
            jax.block_until_ready(loss)

    tr = sorted(glob.glob(OUT + "/**/*.trace.json.gz", recursive=True))[-1]
    with gzip.open(tr, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]
    tid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_name[(e["pid"], e["tid"])] = e["args"].get("name", "")

    # aggregate by fusion/op name root and by coarse family
    agg = defaultdict(lambda: [0.0, 0])
    fam = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if "XLA Ops" not in tid_name.get((e.get("pid"), e.get("tid")), ""):
            continue
        dur = e.get("dur", 0) / 1e3
        name = e["name"]
        total += dur
        root = name.split(".")[0]
        agg[root][0] += dur
        agg[root][1] += 1
        f = ("conv" if root.startswith(("convolution", "conv")) else
             "fusion" if root.startswith(("fusion", "loop_")) else
             "copy" if "copy" in root or "transpose" in root or "bitcast" in root else
             "reduce" if "reduce" in root else
             "dot" if "dot" in root else root[:12])
        fam[f] += dur
    n_steps = 4
    print(f"total device time/step: {total / n_steps:.3f} ms   (wpad={use_wpad})")
    print("\nby family (ms/step):")
    for k, v in sorted(fam.items(), key=lambda kv: -kv[1]):
        print(f"  {v / n_steps:8.3f}  {k}")
    print("\ntop 30 op roots (ms/step x count/step):")
    for k, (t, c) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:30]:
        print(f"  {t / n_steps:8.3f} x{c // n_steps:3d}  {k[:70]}")


class _null:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


if __name__ == "__main__":
    main()
