"""Single-claim A/B matrix over the UNet perf switches on the tracked CREMI
step. One process = one axon device claim (fresh claims measured to queue up
to ~25 min), so every variant compiles+times inside this process.

Usage: python experiments/perf/ab_matrix.py 'name=flag:val,flag:val;name2=...'
Default matrix: wpad on/off x pallas_norm on/off.
Writes ab_matrix.json next to this file.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

HERE = os.path.dirname(os.path.abspath(__file__))


def parse_matrix(spec):
    out = {}
    for item in spec.split(";"):
        name, _, flags = item.partition("=")
        kv = {}
        for f in filter(None, flags.split(",")):
            k, _, v = f.partition(":")
            kv[k] = v if k == "packed_conv_mode" else v == "1"
        out[name] = kv
    return out


DEFAULT = ("wpad1_pnorm1=phase_wpad:1,pallas_norm:1;"
           "wpad1_pnorm0=phase_wpad:1,pallas_norm:0;"
           "wpad0_pnorm1=phase_wpad:0,pallas_norm:1;"
           "wpad0_pnorm0=phase_wpad:0,pallas_norm:0")


def main():
    from torch_em_tpu.models.unet import perf_options

    import tracked_config

    matrix = parse_matrix(sys.argv[1] if len(sys.argv) > 1 else DEFAULT)

    device = jax.devices()[0]
    t0 = time.perf_counter()
    jax.block_until_ready(jax.device_put(np.zeros(8, np.float32), device))
    print(f"device acquired in {time.perf_counter() - t0:.1f}s", flush=True)

    model, _, tx, train_step = tracked_config.build()
    base_variables = jax.device_get(model.variables)

    xh, yh = tracked_config.example_batch()
    x = jax.device_put(xh, device)
    y = jax.device_put(yh, device)

    results = {}
    for name, flags in matrix.items():
        # fresh jit per variant: the flags change how modules trace
        step = jax.jit(train_step, donate_argnums=(0, 1))
        variables = jax.device_put(base_variables, device)
        opt_state = jax.device_put(tx.init(variables["params"]), device)
        with perf_options(**flags):
            t0 = time.perf_counter()
            for _ in range(3):
                variables, opt_state, loss = step(variables, opt_state, x, y)
            jax.block_until_ready(loss)
            compile_s = time.perf_counter() - t0
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(15):
                    variables, opt_state, loss = step(variables, opt_state, x, y)
                jax.block_until_ready(loss)
                times.append((time.perf_counter() - t0) / 15)
        ms = min(times) * 1e3
        results[name] = {"flags": flags, "ms_per_it": round(ms, 3),
                         "compile_s": round(compile_s, 1),
                         "loss": round(float(loss), 4)}
        print(f"{name}: {ms:.2f} ms/it (compile {compile_s:.0f}s, "
              f"loss {float(loss):.4f})", flush=True)

    with open(os.path.join(HERE, "ab_matrix.json"), "w") as f:
        json.dump(results, f, indent=2)
    print("wrote ab_matrix.json")


if __name__ == "__main__":
    main()
