"""Time the full bench train step under implementation variants.

Usage: python scripts/exp_step.py VARIANT [VARIANT...]
Variants: baseline, pool_pairwise, pool_cvjp, pool_lax, bs2, bs4,
          upsample_manual, no_pallas_norm, no_w4
"""
import sys
import time
from functools import partial

import numpy as np


def build_step(batch_size=1):
    import jax
    import jax.numpy as jnp
    from torch_em_tpu.loss import DiceLoss
    from torch_em_tpu.models import AnisotropicUNet
    from torch_em_tpu.trainer.optimizers import OptimizerSpec

    patch = (32, 256, 256)
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

    step = jax.jit(train_step, donate_argnums=(0, 1))
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.random((batch_size, 1) + patch, dtype=np.float32), device)
    y = jax.device_put((rng.random((batch_size, 1) + patch) > 0.5).astype(np.float32), device)
    return step, variables, opt_state, x, y


def time_step(batch_size=1, n=15):
    import jax
    step, variables, opt_state, x, y = build_step(batch_size)
    for _ in range(3):
        variables, opt_state, loss = step(variables, opt_state, x, y)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(n):
        variables, opt_state, loss = step(variables, opt_state, x, y)
    jax.block_until_ready(loss)
    return (time.perf_counter() - t0) / n * 1e3


# ---- pool variants -------------------------------------------------------

def pool_pairwise(x, window):
    import jax.numpy as jnp
    for axis, w in enumerate(window, start=1):
        while w > 1:
            sl_a = [slice(None)] * x.ndim
            sl_b = [slice(None)] * x.ndim
            sl_a[axis] = slice(0, None, 2)
            sl_b[axis] = slice(1, None, 2)
            x = jnp.maximum(x[tuple(sl_a)], x[tuple(sl_b)])
            w //= 2
    return x


def make_pool_cvjp():
    import jax
    import jax.numpy as jnp
    from torch_em_tpu.models import unet as unet_mod
    reshape_pool = unet_mod._max_pool_reshape

    @partial(jax.custom_vjp, nondiff_argnums=(1,))
    def pool(x, window):
        return reshape_pool(x, window)

    def fwd(x, window):
        y = reshape_pool(x, window)
        return y, (x, y)

    def bwd(window, res, g):
        x, y = res
        yb, gb = y, g
        for axis, w in enumerate(window, start=1):
            if w > 1:
                yb = jnp.repeat(yb, w, axis=axis)
                gb = jnp.repeat(gb, w, axis=axis)
        return (jnp.where(x == yb, gb, 0).astype(x.dtype),)

    pool.defvjp(fwd, bwd)
    return pool


def pool_lax(x, window):
    import flax.linen as nn
    return nn.max_pool(x, window_shape=tuple(window), strides=tuple(window))


def main():
    variants = sys.argv[1:] or ["baseline"]
    from torch_em_tpu.models import unet as unet_mod
    orig_pool = unet_mod._max_pool_reshape
    orig_upsample = unet_mod._upsample
    for v in variants:
        unet_mod._max_pool_reshape = orig_pool
        unet_mod._upsample = orig_upsample
        unet_mod.PALLAS_NORM = True
        unet_mod.W4_PACKING = True
        bs = 1
        if v == "baseline":
            pass
        elif v == "pool_pairwise":
            unet_mod._max_pool_reshape = pool_pairwise
        elif v == "pool_cvjp":
            unet_mod._max_pool_reshape = make_pool_cvjp()
        elif v == "pool_lax":
            unet_mod._max_pool_reshape = pool_lax
        elif v == "bs2":
            bs = 2
        elif v == "bs4":
            bs = 4
        elif v == "no_pallas_norm":
            unet_mod.PALLAS_NORM = False
        elif v == "no_w4":
            unet_mod.W4_PACKING = False
        elif v == "upsample_resize":
            import jax as _jax

            def _resize_up(x, factor, mode):
                new_spatial = tuple(int(s * f) for s, f in zip(x.shape[1:-1], factor))
                return _jax.image.resize(
                    x, (x.shape[0],) + new_spatial + (x.shape[-1],), method=mode)
            unet_mod._upsample = _resize_up
        elif v == "pool_reshape":
            def pool_reshape(x, window):
                import jax.numpy as jnp
                n, c = x.shape[0], x.shape[-1]
                new_shape = [n]
                axes = []
                for i, (s, w) in enumerate(zip(x.shape[1:-1], window)):
                    new_shape.extend([s // w, w])
                    axes.append(2 + 2 * i)
                new_shape.append(c)
                return x.reshape(new_shape).max(axis=tuple(axes))
            unet_mod._max_pool_reshape = pool_reshape
        else:
            print(f"unknown variant {v}")
            continue
        ms = time_step(batch_size=bs)
        print(f"{v:20s} {ms:8.2f} ms/step  ({ms/bs:.2f} ms/patch)")


if __name__ == "__main__":
    main()
