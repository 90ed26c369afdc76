"""Microbenchmark: 2x2 shifted-phase packed conv vs the dense3 width-packed
conv (round-3 MFU candidate, PARITY.md breadcrumb #1).

The dense3 lowering executes p x nominal FLOPs (p = 128/C). Folding BOTH
spatial dims (2x2 space-to-depth on a one-pixel-shifted grid) turns the
3x3/pad-1 conv into a dense VALID 2x2 conv over 4C -> 4C channels:
executed = 2*2*4*4/(4*9) = 16/9 = 1.78x nominal for p=4, and the W-only
shifted variant gives 3*2*2*2/(2*9) = 1.33x for p=2 — vs 4x / 2x dense3.

Mapping (output pixel (2i+a, 2j+b), tap (dy,dx)):
  ku = (a+dy+1)//2, a' = (a+dy+1)%2   (same for kv, b')
  Wp[ku, kv, (a',b',ci), (a,b,co)] = W[dy+1, dx+1, ci, co]
Shifted-phase input (pad-1 grid): x_shift[:,u,v,(a',b',c)] = xpad[:,2u+a',2v+b',c]
with H/2+1 x W/2+1 blocks; the VALID 2x2 conv yields (H/2, W/2) blocks =
the aligned-phase output.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")


def phase_kernel_2x2(w):
    """(3, 3, Ci, Co) -> (2, 2, 4Ci, 4Co) shifted-phase kernel."""
    ci, co = w.shape[2], w.shape[3]
    wp = np.zeros((2, 2, 2, 2, ci, 2, 2, co), w.dtype)  # ku kv a' b' ci a b co
    for a in range(2):
        for b in range(2):
            for dy in range(-1, 2):
                for dx in range(-1, 2):
                    ku, ap = (a + dy + 1) // 2, (a + dy + 1) % 2
                    kv, bp = (b + dx + 1) // 2, (b + dx + 1) % 2
                    wp[ku, kv, ap, bp, :, a, b, :] = w[dy + 1, dx + 1]
    return jnp.asarray(wp.reshape(2, 2, 4 * ci, 4 * co))


def shift_phase_pack(x):
    """(B, H, W, C) -> (B, H/2+1, W/2+1, 4C) shifted-phase layout."""
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    parts = []
    for ap in range(2):
        for bp in range(2):
            parts.append(xp[:, ap:ap + h + 1:2, bp:bp + w + 1:2, :])
    return jnp.concatenate(parts, axis=-1)  # note: (a',b') major over c


def phase_conv(x, wp):
    """Dense VALID 2x2 conv on the shifted-phase layout."""
    return jax.lax.conv_general_dilated(
        x, wp, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )


def unphase(y, h, w):
    """(B, H/2, W/2, 4C) aligned-phase -> (B, H, W, C)."""
    b, hb, wb, c4 = y.shape
    c = c4 // 4
    y = y.reshape(b, hb, wb, 2, 2, c)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5))  # b, hb, a, wb, b_, c
    return y.reshape(b, h, w, c)


# -- W-only shifted variant for p=2 (C=64) -----------------------------------

def shiftw_kernel(w, p=2):
    """(3, 3, Ci, Co) -> (3, 2, p*Ci, p*Co) shifted-W kernel."""
    kh, _, ci, co = w.shape
    wp = np.zeros((kh, 2, p, ci, p, co), w.dtype)
    for b in range(p):
        for dx in range(-1, 2):
            kv, bp = (b + dx + 1) // p, (b + dx + 1) % p
            wp[:, kv, bp, :, b, :] = w[:, dx + 1]
    return jnp.asarray(wp.reshape(kh, 2, p * ci, p * co))


def shiftw_pack(x, p=2):
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))
    parts = [xp[:, :, bp:bp + w + 1:2, :] for bp in range(p)]
    return jnp.concatenate(parts, axis=-1)


def shiftw_conv(x, wp):
    kh = 3
    return jax.lax.conv_general_dilated(
        x, wp, (1, 1), [(kh // 2, kh // 2), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )


def timeit(fn, *args, n=20):
    y = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        y = fn(*args)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / n * 1000, y


def main():
    import torch_em_tpu.models.unet as um

    rs = np.random.RandomState(0)
    dt = jnp.bfloat16

    print("=== level0 shapes: (32, 256, 256, 32), p=4 ===")
    x = jnp.asarray(rs.rand(32, 256, 256, 32), dt)
    w = jnp.asarray(rs.randn(3, 3, 32, 32) * 0.1, dt)
    nominal_tf = 2 * 9 * 32 * 32 * 32 * 256 * 256 / 1e12

    # A: current dense3 W-packed
    def dense3(x, w):
        return um._conv2d_wp(x, w, 4)

    f = jax.jit(dense3)
    tA, yA = timeit(f, x, w)
    print(f"dense3 (4.00x):        {tA:7.3f} ms  {nominal_tf / (tA / 1e3):6.1f} TF/s nominal")

    # B: phase conv, repack INCLUDED (from unpacked input)
    wp = phase_kernel_2x2(np.asarray(w, np.float32)).astype(dt)

    def phase_full(x, wp):
        return unphase(phase_conv(shift_phase_pack(x), wp), 256, 256)

    f = jax.jit(phase_full)
    tB, yB = timeit(f, x, wp)
    print(f"phase2x2 +re/unpack:   {tB:7.3f} ms  {nominal_tf / (tB / 1e3):6.1f} TF/s nominal")

    # C: phase conv only (phase-resident pipeline)
    xs = jax.block_until_ready(jax.jit(shift_phase_pack)(x))

    def phase_only(xs, wp):
        return phase_conv(xs, wp)

    f = jax.jit(phase_only)
    tC, _ = timeit(f, xs, wp)
    print(f"phase2x2 conv only:    {tC:7.3f} ms  {nominal_tf / (tC / 1e3):6.1f} TF/s nominal (1.78x exec)")

    err = float(jnp.max(jnp.abs(yA.astype(jnp.float32) - yB.astype(jnp.float32))))
    print(f"max |dense3 - phase|: {err:.4f}")

    # backward through the phase conv vs dense3
    def lossA(w):
        return jnp.sum(jnp.sin(dense3(x, w).astype(jnp.float32)))

    def lossB(wp):
        return jnp.sum(jnp.sin(phase_conv(xs, wp).astype(jnp.float32)))

    gA = jax.jit(jax.grad(lossA))
    gB = jax.jit(jax.grad(lossB))
    tgA, _ = timeit(gA, w)
    tgB, _ = timeit(gB, wp)
    print(f"grad dense3: {tgA:7.3f} ms   grad phase: {tgB:7.3f} ms")

    print("=== level1 shapes: (32, 128, 128, 64), p=2 ===")
    x1 = jnp.asarray(rs.rand(32, 128, 128, 64), dt)
    w1 = jnp.asarray(rs.randn(3, 3, 64, 64) * 0.1, dt)
    nominal_tf1 = 2 * 9 * 64 * 64 * 32 * 128 * 128 / 1e12

    def dense3_l1(x, w):
        return um._conv2d_wp(x, w, 2)

    f = jax.jit(dense3_l1)
    tA1, yA1 = timeit(f, x1, w1)
    print(f"dense3 (2.00x):        {tA1:7.3f} ms  {nominal_tf1 / (tA1 / 1e3):6.1f} TF/s nominal")

    wp1 = shiftw_kernel(np.asarray(w1, np.float32)).astype(dt)

    def shiftw_full(x, wp):
        y = shiftw_conv(shiftw_pack(x), wp)
        b, h, wb, pc = y.shape
        return y.reshape(b, h, wb * 2, pc // 2)

    f = jax.jit(shiftw_full)
    tB1, yB1 = timeit(f, x1, wp1)
    print(f"shiftW +repack (1.33x):{tB1:7.3f} ms  {nominal_tf1 / (tB1 / 1e3):6.1f} TF/s nominal")

    xs1 = jax.block_until_ready(jax.jit(shiftw_pack)(x1))

    def shiftw_only(xs, wp):
        return shiftw_conv(xs, wp)

    f = jax.jit(shiftw_only)
    tC1, _ = timeit(f, xs1, wp1)
    print(f"shiftW conv only:      {tC1:7.3f} ms  {nominal_tf1 / (tC1 / 1e3):6.1f} TF/s nominal")

    err1 = float(jnp.max(jnp.abs(yA1.astype(jnp.float32) - yB1.astype(jnp.float32))))
    print(f"max |dense3 - shiftW|: {err1:.4f}")

    # 2x2 phase at level1 too (1.78x but bigger pixels-per-lane)
    wph1 = phase_kernel_2x2(np.asarray(w1, np.float32)).astype(dt)
    xsp1 = jax.block_until_ready(jax.jit(shift_phase_pack)(x1))

    def phase_only1(xs, wp):
        return phase_conv(xs, wp)

    f = jax.jit(phase_only1)
    tD1, _ = timeit(f, xsp1, wph1)
    print(f"phase2x2 conv only:    {tD1:7.3f} ms  {nominal_tf1 / (tD1 / 1e3):6.1f} TF/s nominal (1.78x exec, 256 lanes)")


if __name__ == "__main__":
    main()
