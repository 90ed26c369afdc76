"""Microbenchmark max-pool variants (fwd+bwd) on the bench model's hot shapes."""
import time
import jax
import jax.numpy as jnp
import numpy as np
from functools import partial


def _max_pool_reshape(x, window):
    n, c = x.shape[0], x.shape[-1]
    spatial = x.shape[1:-1]
    new_shape = [n]
    axes = []
    for i, (s, w) in enumerate(zip(spatial, window)):
        new_shape.extend([s // w, w])
        axes.append(2 + 2 * i)
    new_shape.append(c)
    return x.reshape(new_shape).max(axis=tuple(axes))


def _max_pool_pairwise(x, window):
    # repeated pairwise max via strided slices; window entries must be powers of 2
    for axis, w in enumerate(window, start=1):
        while w > 1:
            sl_a = [slice(None)] * x.ndim
            sl_b = [slice(None)] * x.ndim
            sl_a[axis] = slice(0, None, 2)
            sl_b[axis] = slice(1, None, 2)
            x = jnp.maximum(x[tuple(sl_a)], x[tuple(sl_b)])
            w //= 2
    return x


def _max_pool_lax(x, window):
    import flax.linen as nn
    return nn.max_pool(x, window_shape=tuple(window), strides=tuple(window))


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _max_pool_cvjp(x, window):
    return _max_pool_reshape(x, window)


def _cvjp_fwd(x, window):
    y = _max_pool_reshape(x, window)
    return y, (x, y)


def _cvjp_bwd(window, res, g):
    x, y = res
    # broadcast y,g back to x's shape via repeat on pooled axes
    yb = y
    gb = g
    for axis, w in enumerate(window, start=1):
        if w > 1:
            yb = jnp.repeat(yb, w, axis=axis)
            gb = jnp.repeat(gb, w, axis=axis)
    mask = (x == yb)
    return (jnp.where(mask, gb, 0).astype(x.dtype),)


_max_pool_cvjp.defvjp(_cvjp_fwd, _cvjp_bwd)


def timeit(fn, x, n=20):
    def loss(x):
        return jnp.sum(fn(x))
    g = jax.jit(jax.grad(loss))
    r = g(x)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = g(x)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    shapes = [
        ((32, 256, 256, 32), (2, 2)),
        ((32, 128, 128, 64), (2, 2)),
        ((1, 32, 64, 64, 128), (2, 2, 2)),
        ((1, 16, 32, 32, 256), (2, 2, 2)),
    ]
    variants = {
        "reshape": _max_pool_reshape,
        "pairwise": _max_pool_pairwise,
        "lax_reduce_window": _max_pool_lax,
        "cvjp_eq": _max_pool_cvjp,
    }
    rng = np.random.default_rng(0)
    for shape, window in shapes:
        x = jax.device_put(rng.random(shape, dtype=np.float32).astype(np.dtype("bfloat16")))
        print(f"shape {shape} window {window}")
        for name, fn in variants.items():
            try:
                ms = timeit(lambda t, f=fn, w=window: f(t, w), x)
                print(f"  {name:20s} {ms:8.3f} ms fwd+bwd")
            except Exception as e:
                print(f"  {name:20s} FAILED: {type(e).__name__}: {str(e)[:90]}")


if __name__ == "__main__":
    main()
