"""UNETR/ViT tiled-inference profiling (VERDICT round-2 weak #8): give the
17.3 Mpix/s number a roofline context — device-trace the 448² block forward
and classify it compute- vs bandwidth-bound, like the UNet step was.

Run: PYTHONPATH=/root/repo:/root/.axon_site python unetr_inference_profile.py
"""

import glob
import gzip
import json
import sys
import time
from collections import defaultdict

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
sys.path.insert(0, "/root/repo")

OUT = "/tmp/jax_trace_unetr"
PEAK_TFS = 197.0


def main():
    from torch_em_tpu.models.unetr import UNETR

    model = UNETR(img_size=448, backbone="sam", encoder="vit_t", out_channels=2,
                  resize_input=False, use_skip_connection=True, dtype=jnp.bfloat16)
    fwd = jax.jit(lambda v, x: model.module.apply(
        {"params": v["params"]}, x, train=False))

    rs = np.random.RandomState(0)
    bufs = [jax.device_put(rs.rand(1, 1, 448, 448).astype("float32"))
            for _ in range(4)]
    variables = jax.device_put(model.variables)

    jax.block_until_ready(fwd(variables, bufs[0]))
    t0 = time.perf_counter()
    outs = [fwd(variables, b) for b in bufs for _ in range(3)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / len(outs)
    print(f"448^2 block fwd: {dt * 1e3:.2f} ms -> {448 * 448 / dt / 1e6:.1f} Mpix/s "
          "(host-timed; device trace below is the ground truth)")

    with jax.profiler.trace(OUT):
        outs = [fwd(variables, b) for b in bufs]
        jax.block_until_ready(outs)

    tr = sorted(glob.glob(OUT + "/**/*.trace.json.gz", recursive=True))[-1]
    with gzip.open(tr, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]
    tid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_name[(e["pid"], e["tid"])] = e["args"].get("name", "")
    agg = defaultdict(lambda: [0.0, 0.0, 0.0])
    total = total_fl = total_by = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if "XLA Ops" not in tid_name.get((e.get("pid"), e.get("tid")), ""):
            continue
        a = e.get("args", {})
        t = e.get("dur", 0) / 1e3 / 4
        fl = float(a.get("model_flops", 0) or 0) / 4
        by = float(a.get("bytes_accessed", 0) or 0) / 4
        total += t
        total_fl += fl
        total_by += by
        cat = a.get("hlo_category", e["name"].split(".")[0])
        agg[cat][0] += t
        agg[cat][1] += fl
        agg[cat][2] += by
    print(f"\ndevice total: {total:.2f} ms/block -> {448 * 448 / total / 1e3:.1f} Mpix/s")
    print(f"flops {total_fl / 1e9:.1f} GF -> {total_fl / total / 1e9:.1f} TF/s "
          f"({total_fl / total / 1e9 / PEAK_TFS * 100:.0f}% peak); "
          f"bytes {total_by / 1e6:.0f} MB -> {total_by / total / 1e6:.0f} GB/s")
    for cat, (t, fl, by) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:14]:
        print(f"  {cat[:36]:36s} {t:7.3f} ms  {fl / t / 1e9 if t else 0:7.1f} TF/s "
              f"{by / t / 1e6 if t else 0:6.0f} GB/s")


if __name__ == "__main__":
    main()
