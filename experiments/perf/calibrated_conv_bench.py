"""Calibrated conv-variant microbench for the round-3 MFU work.

The first phase_conv_microbench run produced an impossible number (dense3 at
2155 TF/s nominal — 10x hardware peak), indicating that timing identical
(executable, args) calls over the axon tunnel is unreliable. This harness

1. calibrates against a 4096^3 bf16 matmul whose speed-of-light is known
   (137.4 GFLOP -> ~0.7 ms at 197 TF/s on v5e), and
2. cycles N_BUFS distinct input buffers per variant so no two consecutive
   dispatches are identical.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

N_BUFS = 4
PEAK_TFS = 197.0


def timeit(fn, bufs, *fixed, n=24):
    for b in bufs:
        jax.block_until_ready(fn(b, *fixed))
    t0 = time.perf_counter()
    outs = []
    for i in range(n):
        outs.append(fn(bufs[i % len(bufs)], *fixed))
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / n * 1000


def main():
    import sys

    sys.path.insert(0, "/root/repo")
    import torch_em_tpu.models.unet as um
    from experiments.perf.phase_conv_microbench import (
        phase_kernel_2x2, shift_phase_pack, phase_conv, unphase)

    rs = np.random.RandomState(0)
    dt = jnp.bfloat16

    # --- calibration: 4096^3 matmul ---
    a_bufs = [jnp.asarray(rs.rand(4096, 4096), dt) for _ in range(N_BUFS)]
    b = jnp.asarray(rs.rand(4096, 4096), dt)
    mm = jax.jit(lambda a, b: a @ b)
    t = timeit(mm, a_bufs, b)
    tf = 2 * 4096**3 / 1e12
    print(f"calib 4096^3 matmul: {t:7.3f} ms  {tf / (t / 1e3):6.1f} TF/s "
          f"({tf / (t / 1e3) / PEAK_TFS * 100:.0f}% peak)")

    # --- level0: (32, 256, 256, 32), p=4 ---
    shape = (32, 256, 256, 32)
    x_bufs = [jnp.asarray(rs.rand(*shape), dt) for _ in range(N_BUFS)]
    w = jnp.asarray(rs.randn(3, 3, 32, 32) * 0.1, dt)
    nominal = 2 * 9 * 32 * 32 * np.prod(shape[:3]) / 1e12

    dense3 = jax.jit(lambda x, w: um._conv2d_wp(x, w, 4))
    t = timeit(dense3, x_bufs, w)
    print(f"dense3 (4.00x exec):   {t:7.3f} ms  {nominal / (t / 1e3):6.1f} TF/s nominal  "
          f"exec {nominal * 4 / (t / 1e3):6.1f} TF/s")

    wp = phase_kernel_2x2(np.asarray(w, np.float32)).astype(dt)
    pf = jax.jit(lambda x, wp: unphase(phase_conv(shift_phase_pack(x), wp), 256, 256))
    t = timeit(pf, x_bufs, wp)
    print(f"phase2x2 full:         {t:7.3f} ms  {nominal / (t / 1e3):6.1f} TF/s nominal")

    xs_bufs = [jax.block_until_ready(jax.jit(shift_phase_pack)(x)) for x in x_bufs]
    pc = jax.jit(phase_conv)
    t = timeit(pc, xs_bufs, wp)
    print(f"phase2x2 conv only:    {t:7.3f} ms  {nominal / (t / 1e3):6.1f} TF/s nominal  "
          f"exec {nominal * 16 / 9 / (t / 1e3):6.1f} TF/s")

    # unpacked baseline conv (what a no-packing UNet would run)
    plain = jax.jit(lambda x, w: jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dt))
    t = timeit(plain, x_bufs, w)
    print(f"plain 3x3 (1.00x):     {t:7.3f} ms  {nominal / (t / 1e3):6.1f} TF/s nominal")


if __name__ == "__main__":
    main()
