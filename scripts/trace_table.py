"""Aggregate a jax profiler trace into a per-op roofline table.

Usage: python scripts/trace_table.py /tmp/jax_trace2 [n_steps]
"""
import glob
import gzip
import json
import sys
from collections import defaultdict

outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace2"
nsteps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

tr = sorted(glob.glob(outdir + "/**/*.trace.json.gz", recursive=True))[-1]
with gzip.open(tr, "rt") as f:
    data = json.load(f)
events = data["traceEvents"]
tid_name = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") == "thread_name":
        tid_name[(e["pid"], e["tid"])] = e["args"].get("name", "")

agg = defaultdict(lambda: [0.0, 0.0, 0.0])  # time ms, flops, bytes
for e in events:
    if e.get("ph") != "X":
        continue
    if "XLA Ops" not in tid_name.get((e.get("pid"), e.get("tid")), ""):
        continue
    a = e.get("args", {})
    t = e.get("dur", 0) / 1e3 / nsteps
    tf_op = a.get("tf_op", "").replace("jit(train_step)/", "")
    src = a.get("source", "").split("/")[-1]
    cat = a.get("hlo_category", "?")
    key = (tf_op[-70:] or e["name"].split(".")[0], src, cat)
    agg[key][0] += t
    agg[key][1] += float(a.get("model_flops", 0) or 0) / nsteps
    agg[key][2] += float(a.get("bytes_accessed", 0) or 0) / nsteps

rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
total_t = sum(v[0] for v in agg.values())
total_f = sum(v[1] for v in agg.values())
print(f"total {total_t:.1f} ms/step, {total_f/1e12:.2f} model TFLOP/step, "
      f"avg {total_f/total_t/1e9:.1f} TFLOP/s ({total_f/total_t/1e9/197:.1%} of v5e peak)")
print(f"{'ms':>7} {'%':>5} {'TF/s':>6} {'GB/s':>6} {'category':<22} {'tf_op':<70} src")
for (tf_op, src, cat), (t, fl, by) in rows[:45]:
    tfs = fl / t / 1e9 if t else 0
    gbs = by / t / 1e6 if t else 0
    print(f"{t:7.3f} {100*t/total_t:5.1f} {tfs:6.1f} {gbs:6.0f} {cat:<22} {tf_op:<70} {src}")
