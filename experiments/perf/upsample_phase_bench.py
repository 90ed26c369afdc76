"""Compare _upsample2x_to_phase formulations in the full CREMI step.

Variants:
  ad       - current in-tree form (factored blends, AD backward)
  vjp      - same factored forward, hand-written concat-form transpose
  direct   - 4-tap per-group forward (no shared t), AD backward

Usage: UPS_VARIANT=vjp python experiments/perf/upsample_phase_bench.py
"""

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import torch_em_tpu.models.unet as um


def _sh(arr, axis, off):
    pad = [(0, 0)] * arr.ndim
    sl = [slice(None)] * arr.ndim
    n = arr.shape[axis]
    if off > 0:
        pad[axis] = (off, 0)
        sl[axis] = slice(0, n)
    else:
        pad[axis] = (0, -off)
        sl[axis] = slice(-off, n - off)
    return jnp.pad(arr, pad, mode="edge")[tuple(sl)]


def _shT(g, axis, off):
    """Transpose of the edge-clamped shift _sh (|off| = 1)."""
    n = g.shape[axis]
    idx = lambda a, b: tuple(
        slice(a, b) if d == axis else slice(None) for d in range(g.ndim))
    z = jnp.zeros_like(g[idx(0, 1)])
    if off > 0:
        # y_i = x_{max(i-1,0)}: dT_0 = g0+g1; dT_j = g_{j+1}; dT_{n-1} = 0
        return jnp.concatenate(
            [g[idx(0, 1)] + g[idx(1, 2)], g[idx(2, n)], z], axis=axis)
    # y_i = x_{min(i+1,n-1)}: dT_0 = 0; dT_j = g_{j-1}; dT_{n-1} = g_{n-2}+g_{n-1}
    return jnp.concatenate(
        [z, g[idx(0, n - 2)], g[idx(n - 2, n - 1)] + g[idx(n - 1, n)]], axis=axis)


def _fwd_factored(x):
    rows = (0.75 * x + 0.25 * _sh(x, 1, 1), 0.75 * x + 0.25 * _sh(x, 1, -1))
    groups = []
    for t in rows:
        groups.append(0.75 * t + 0.25 * _sh(t, 2, 1))
        groups.append(0.75 * t + 0.25 * _sh(t, 2, -1))
    return jnp.concatenate(groups, axis=-1)


@jax.custom_vjp
def upsample_vjp(x):
    return _fwd_factored(x)


def _upsample_vjp_fwd(x):
    return _fwd_factored(x), None


def _upsample_vjp_bwd(_, g):
    c4 = g.shape[-1]
    c = c4 // 4
    g0, g1, g2, g3 = (g[..., i * c:(i + 1) * c] for i in range(4))
    dtp = 0.75 * (g0 + g1) + 0.25 * (_shT(g0, 2, 1) + _shT(g1, 2, -1))
    dtm = 0.75 * (g2 + g3) + 0.25 * (_shT(g2, 2, 1) + _shT(g3, 2, -1))
    dx = 0.75 * (dtp + dtm) + 0.25 * (_shT(dtp, 1, 1) + _shT(dtm, 1, -1))
    return (dx,)


upsample_vjp.defvjp(_upsample_vjp_fwd, _upsample_vjp_bwd)


def upsample_direct(x):
    xs = {a: _sh(x, 1, a) for a in (1, -1)}
    groups = []
    for a in (1, -1):
        for b in (1, -1):
            groups.append(0.5625 * x + 0.1875 * xs[a] + 0.1875 * _sh(x, 2, b)
                          + 0.0625 * _sh(xs[a], 2, b))
    return jnp.concatenate(groups, axis=-1)


def main():
    variant = os.environ.get("UPS_VARIANT", "ad")
    if variant == "vjp":
        um._upsample2x_to_phase = upsample_vjp
    elif variant == "direct":
        um._upsample2x_to_phase = upsample_direct

    # numeric check vs the in-tree forward/backward on a small case
    rs = np.random.RandomState(0)
    xs = jnp.asarray(rs.rand(2, 8, 8, 4), jnp.float32)
    ref_f, ref_vjp = jax.vjp(_fwd_factored, xs)
    for name, fn in (("vjp", upsample_vjp), ("direct", upsample_direct)):
        f, fvjp = jax.vjp(fn, xs)
        g = jnp.asarray(rs.rand(*f.shape), jnp.float32)
        assert np.allclose(f, ref_f, atol=1e-6), name
        assert np.allclose(fvjp(g)[0], ref_vjp(g)[0], atol=1e-5), name
    print("numeric check ok")

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
        params = jax.tree_util.tree_map(
            lambda p, u: p + u, variables["params"], updates)
        return {"params": params}, opt_state_new, loss

    step = jax.jit(train_step, donate_argnums=(0, 1))
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.random((1, 1) + patch, dtype=np.float32), device)
    y = jax.device_put((rng.random((1, 1) + patch) > 0.5).astype(np.float32), device)

    t0 = time.perf_counter()
    for _ in range(3):
        variables, opt_state, loss = step(variables, opt_state, x, y)
    jax.block_until_ready(loss)
    print(f"[{variant}] compile+warmup: {time.perf_counter() - t0:.1f} s", flush=True)
    for rep in range(3):
        t0 = time.perf_counter()
        n = 15
        for _ in range(n):
            variables, opt_state, loss = step(variables, opt_state, x, y)
        jax.block_until_ready(loss)
        print(f"[{variant}] rep{rep}: {(time.perf_counter() - t0) / n * 1e3:.2f} ms/it",
              flush=True)


if __name__ == "__main__":
    main()
