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

from torch_em_tpu.models.unet import perf_options

OUT = "/tmp/jax_trace_copy_analysis"


def main():
    use_wpad = len(sys.argv) > 1 and sys.argv[1] == "wpad"
    import tracked_config

    model, _, tx, train_step = tracked_config.build()
    device = jax.devices()[0]
    variables = jax.device_put(model.variables, device)
    opt_state = jax.device_put(tx.init(variables["params"]), device)

    xh, yh = tracked_config.example_batch()
    x = jax.device_put(xh, device)
    y = jax.device_put(yh, device)

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
