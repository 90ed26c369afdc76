"""Device-trace comparison: dense3 packed conv vs 2x2 shifted-phase conv on
the L0 shape. Host wall-clock over the axon tunnel is unreliable; the xplane
trace's device op times are the ground truth (they reproduce the end-to-end
step time).
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
import torch_em_tpu.models.unet as um
from experiments.perf.phase_conv_microbench import (
    phase_kernel_2x2, shift_phase_pack, phase_conv)

OUT = "/tmp/jax_trace_phase"


def main():
    rs = np.random.RandomState(0)
    dt = jnp.bfloat16
    N = 6
    x_bufs = [jnp.asarray(rs.rand(32, 256, 256, 32), dt) for _ in range(N)]
    w = jnp.asarray(rs.randn(3, 3, 32, 32) * 0.1, dt)
    wp = phase_kernel_2x2(np.asarray(w, np.float32)).astype(dt)
    xs_bufs = [jax.block_until_ready(jax.jit(shift_phase_pack)(x)) for x in x_bufs]
    # aligned-phase buffers (H/2, W/2, 4C) for the persistent-layout variant
    xa_bufs = [jax.block_until_ready(
        jax.jit(lambda x: x[:, :-1, :-1, :])(xs)) for xs in xs_bufs]

    dense3 = jax.jit(lambda x, w: um._conv2d_wp(x, w, 4))
    pconv = jax.jit(phase_conv)

    def shift_from_aligned(xa):
        # aligned (B, Hb, Wb, (a,b,c)) -> shifted (B, Hb+1, Wb+1, (a',b',c))
        b, hb, wb, c4 = xa.shape
        c = c4 // 4
        xp = jnp.pad(xa, ((0, 0), (1, 1), (1, 1), (0, 0)))
        groups = []
        for ap in range(2):
            for bp in range(2):
                a, b_ = 1 - ap, 1 - bp
                du, dv = (0 if ap == 0 else 1), (0 if bp == 0 else 1)
                src = xp[:, du:du + hb + 1, dv:dv + wb + 1,
                         (a * 2 + b_) * c:(a * 2 + b_ + 1) * c]
                groups.append(src)
        return jnp.concatenate(groups, axis=-1)

    shifted_conv = jax.jit(lambda xa, wp: phase_conv(shift_from_aligned(xa), wp))

    # warmup all
    jax.block_until_ready(dense3(x_bufs[0], w))
    jax.block_until_ready(pconv(xs_bufs[0], wp))
    jax.block_until_ready(shifted_conv(xa_bufs[0], wp))

    with jax.profiler.trace(OUT):
        outs = []
        for i in range(N):
            outs.append(dense3(x_bufs[i], w))
        jax.block_until_ready(outs)
        outs = []
        for i in range(N):
            outs.append(pconv(xs_bufs[i], wp))
        jax.block_until_ready(outs)
        outs = []
        for i in range(N):
            outs.append(shifted_conv(xa_bufs[i], wp))
        jax.block_until_ready(outs)

    analyze()


def analyze():
    tr = sorted(glob.glob(OUT + "/**/*.trace.json.gz", recursive=True))[-1]
    with gzip.open(tr, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]
    tid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_name[(e["pid"], e["tid"])] = e["args"].get("name", "")
    agg = defaultdict(lambda: [0.0, 0, 0.0])
    for e in events:
        if e.get("ph") != "X":
            continue
        if "XLA Ops" not in tid_name.get((e.get("pid"), e.get("tid")), ""):
            continue
        a = e.get("args", {})
        key = (e["name"].split(".")[0], a.get("tf_op", "")[:60])
        agg[key][0] += e.get("dur", 0) / 1e3
        agg[key][1] += 1
        agg[key][2] += float(a.get("model_flops", 0) or 0)
    for (n, op), (t, c, fl) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:20]:
        print(f"{t / max(c, 1):7.3f} ms x{c:2d} {fl / t / 1e9 if t else 0:7.1f} TF/s  {n[:30]:30s} {op}")


if __name__ == "__main__":
    main()
