"""Pinpoint the relayout copies in the tracked bench train step.

Compiles the exact bench.py config, profiles a few steps, aggregates device
time per INDIVIDUAL op, and cross-references every `copy`/`transpose`/
`bitcast` (and the top fusions) against the optimized HLO text so each hot
copy is reported with its operand shape and layouts.

Usage:  python experiments/perf/copy_analysis.py [wpad]
"""

import glob
import gzip
import json
import re
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

OUT = "/tmp/jax_trace_copy_analysis"


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

    with perf_options(phase_wpad=use_wpad):
        step = jax.jit(train_step, donate_argnums=(0, 1))
        compiled = step.lower(variables, opt_state, x, y).compile()
        hlo = compiled.as_text()
        for _ in range(3):
            variables, opt_state, loss = step(variables, opt_state, x, y)
        jax.block_until_ready(loss)
        with jax.profiler.trace(OUT):
            for _ in range(4):
                variables, opt_state, loss = step(variables, opt_state, x, y)
            jax.block_until_ready(loss)

    # instruction name -> its full HLO definition line (shapes + layouts)
    hlo_def = {}
    for line in hlo.splitlines():
        m = re.match(r"\s*(?:ROOT )?%?([\w.-]+)\s*=\s*(.*)", line)
        if m:
            hlo_def[m.group(1)] = m.group(2)

    tr = sorted(glob.glob(OUT + "/**/*.trace.json.gz", recursive=True))[-1]
    with gzip.open(tr, "rt") as f:
        events = json.load(f)["traceEvents"]
    tid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_name[(e["pid"], e["tid"])] = e["args"].get("name", "")

    per_op = defaultdict(float)
    for e in events:
        if e.get("ph") != "X":
            continue
        if "XLA Ops" not in tid_name.get((e.get("pid"), e.get("tid")), ""):
            continue
        per_op[e["name"]] += e.get("dur", 0) / 1e3

    n_steps = 4
    copies = {k: v for k, v in per_op.items()
              if k.split(".")[0] in ("copy", "transpose", "bitcast")
              or "copy" in k.split(".")[0]}
    print(f"== individual copies by device time (ms/step), wpad={use_wpad}")
    total_copy = 0.0
    for k, v in sorted(copies.items(), key=lambda kv: -kv[1]):
        total_copy += v
        if v / n_steps < 0.02:
            continue
        d = hlo_def.get(k, "?")
        print(f"  {v / n_steps:7.3f}  {k:18s}  {d[:140]}")
    print(f"  total copy: {total_copy / n_steps:.3f} ms/step")

    print("\n== top 15 fusions (ms/step) with root op")
    fus = {k: v for k, v in per_op.items() if k.split(".")[0].startswith(("fusion", "loop_"))}
    for k, v in sorted(fus.items(), key=lambda kv: -kv[1])[:15]:
        d = hlo_def.get(k, "?")
        m = re.search(r'op_name="([^"]*)"', d)
        s = re.search(r'source_file="([^"]*)".*?source_line=(\d+)', d)
        meta = (m.group(1) if m else "") + (
            f"  @{s.group(1).split('/')[-1]}:{s.group(2)}" if s else "")
        print(f"  {v / n_steps:7.3f}  {k:18s}  {d[:110]}")
        print(f"           {meta[:150]}")

    print("\n== broadcast_maximum / pad_maximum fusions (pool chain)")
    for k, v in sorted(per_op.items(), key=lambda kv: -kv[1]):
        if "maximum" in k and v / n_steps > 0.03:
            d = hlo_def.get(k, "?")
            m = re.search(r'op_name="([^"]*)"', d)
            s = re.search(r'source_file="([^"]*)".*?source_line=(\d+)', d)
            meta = (m.group(1) if m else "") + (
                f"  @{s.group(1).split('/')[-1]}:{s.group(2)}" if s else "")
            print(f"  {v / n_steps:7.3f}  {k:28s}  {d[:110]}")
            print(f"           {meta[:150]}")


if __name__ == "__main__":
    main()
