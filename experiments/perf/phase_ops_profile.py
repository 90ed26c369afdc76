"""Price the phase-mode building blocks on the real chip (device-trace times):

- s2d_slices: space-to-depth via 4 strided slices + concat
- s2d_transpose: same via reshape -> transpose -> reshape
- d2s: inverse (depth-to-space)
- group_max: 2x2 pool as max over the 4 phase groups
- convA: aligned->shifted phase conv (padding (1,0),(1,0))
- convB: shifted->aligned phase conv (VALID)
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
from experiments.perf.phase_conv_microbench import phase_kernel_2x2

OUT = "/tmp/jax_trace_phase_ops"


def s2d_slices(x):
    parts = [x[:, a::2, b::2, :] for a in range(2) for b in range(2)]
    return jnp.concatenate(parts, axis=-1)


def s2d_transpose(x):
    b, h, w, c = x.shape
    y = x.reshape(b, h // 2, 2, w // 2, 2, c)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5))
    return y.reshape(b, h // 2, w // 2, 4 * c)


def d2s(y):
    b, hb, wb, c4 = y.shape
    c = c4 // 4
    z = y.reshape(b, hb, wb, 2, 2, c)
    z = jnp.transpose(z, (0, 1, 3, 2, 4, 5))
    return z.reshape(b, hb * 2, wb * 2, c)


def group_max(y):
    b, hb, wb, c4 = y.shape
    return jnp.max(y.reshape(b, hb, wb, 4, c4 // 4), axis=3)


def conv_a(x, wp):  # aligned -> shifted
    return jax.lax.conv_general_dilated(
        x, wp, (1, 1), [(1, 0), (1, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), preferred_element_type=x.dtype)


def conv_b(x, wp):  # shifted -> aligned
    return jax.lax.conv_general_dilated(
        x, wp, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), preferred_element_type=x.dtype)


def main():
    rs = np.random.RandomState(0)
    dt = jnp.bfloat16
    N = 6
    x_bufs = [jnp.asarray(rs.rand(32, 256, 256, 32), dt) for _ in range(N)]
    xa_bufs = [jnp.asarray(rs.rand(32, 128, 128, 128), dt) for _ in range(N)]
    xs_bufs = [jnp.asarray(rs.rand(32, 129, 129, 128), dt) for _ in range(N)]
    w = jnp.asarray(rs.randn(3, 3, 32, 32) * 0.1, dt)
    wp = phase_kernel_2x2(np.asarray(w, np.float32)).astype(dt)

    fns = {
        "s2d_slices": (jax.jit(s2d_slices), x_bufs),
        "s2d_transpose": (jax.jit(s2d_transpose), x_bufs),
        "d2s": (jax.jit(d2s), xa_bufs),
        "group_max": (jax.jit(group_max), xa_bufs),
        "convA": (jax.jit(lambda x: conv_a(x, wp)), xa_bufs),
        "convB": (jax.jit(lambda x: conv_b(x, wp)), xs_bufs),
    }
    for name, (f, bufs) in fns.items():
        jax.block_until_ready(f(bufs[0]))

    with jax.profiler.trace(OUT):
        for name, (f, bufs) in fns.items():
            outs = [f(b) for b in bufs]
            jax.block_until_ready(outs)

    tr = sorted(glob.glob(OUT + "/**/*.trace.json.gz", recursive=True))[-1]
    with gzip.open(tr, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]
    tid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_name[(e["pid"], e["tid"])] = e["args"].get("name", "")
    agg = defaultdict(lambda: [0.0, 0])
    for e in events:
        if e.get("ph") != "X":
            continue
        if "XLA Ops" not in tid_name.get((e.get("pid"), e.get("tid")), ""):
            continue
        a = e.get("args", {})
        key = (e["name"].split(".")[0], a.get("tf_op", "")[:50])
        agg[key][0] += e.get("dur", 0) / 1e3
        agg[key][1] += 1
    for (n, op), (t, c) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:22]:
        print(f"{t / max(c, 1):7.3f} ms x{c:2d}  {n[:34]:34s} {op}")


if __name__ == "__main__":
    main()
