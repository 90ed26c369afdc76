"""Fused instance-norm Pallas TPU kernel.

The XLA lowering of instance norm is two HBM sweeps forward (one fused
stats pass, one normalize pass) and four backward (stats of the cotangent,
then the dx pass, each reading x and g). When a full (sample, channel-block)
spatial slab fits in VMEM, one kernel instance can do each direction in a
single read per operand:

  forward : read x once; stats + normalize in VMEM; write out (+ mean/rstd)
  backward: read x and g once; all three reductions + dx in VMEM

Layout strategy: the (N, *spatial, C) activation is viewed as (R, L*C) —
a pure reshape of adjacent memory dims. Each kernel instance loads one row
into VMEM as an (L*C/128, 128)-shaped block (full 128-lane utilization even
for C < 128). Per-channel statistics fall out of a sublane reduction followed
by a tiny (128/C, C) fold, because channel c occupies lane positions
congruent to c (mod C).

Supported when C divides 128, L*C is a multiple of 128 and the slab fits
the VMEM budget; callers check :func:`supports_pallas_norm` and fall back
to the jnp path otherwise.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    PALLAS_NORM_SUPPORTED = True
except Exception:  # pragma: no cover - pallas always importable in CI
    pltpu = None
    PALLAS_NORM_SUPPORTED = False

# VMEM budget per operand slab (bytes). The backward kernel's working set
# (x, g, dx + f32 temporaries) is ~6x the slab, and the v5e scoped-VMEM
# limit is 16 MB, so slabs are capped at 2 MB. Larger slabs would need a
# two-phase grid, whose HBM traffic equals XLA's lowering -- no win there,
# so the jnp path handles them.
_VMEM_BUDGET = 2 * 1024 * 1024


def supports_pallas_norm(shape, dtype) -> bool:
    """Whether the fused kernel supports an (R, L, C) view of this shape."""
    if not PALLAS_NORM_SUPPORTED or len(shape) < 3:
        return False
    c = shape[-1]
    l = 1
    for s in shape[1:-1]:
        l *= s
    lc = l * c
    if c < 1 or c > 128 or 128 % c != 0:
        return False
    if lc % 128 != 0 or lc == 0:
        return False
    itemsize = jnp.dtype(dtype).itemsize
    return lc * itemsize <= _VMEM_BUDGET


def _channel_stats(x32, c):
    """Per-channel mean/meansq (1, c) of an (M, 128) f32 block whose
    flattened layout is row-major (L, C). Pure 2D ops (sublane reduction +
    static lane slices) — Mosaic does not support 1D reshapes/tiles."""
    m = x32.shape[0]
    n_per_c = m * 128 // c
    col_sum = jnp.sum(x32, axis=0, keepdims=True)       # (1, 128)
    col_sq = jnp.sum(x32 * x32, axis=0, keepdims=True)  # (1, 128)
    groups = 128 // c
    mean = sum(col_sum[:, g * c:(g + 1) * c] for g in range(groups)) / n_per_c
    mean_sq = sum(col_sq[:, g * c:(g + 1) * c] for g in range(groups)) / n_per_c
    return mean, mean_sq


def _broadcast_channels(vec, c, m):
    """Broadcast a per-channel (1, c) vector back to an (M, 128) block."""
    row = jnp.concatenate([vec] * (128 // c), axis=1) if c < 128 else vec
    return jnp.broadcast_to(row, (m, 128))


def _fwd_kernel(x_ref, o_ref, mean_ref, rstd_ref, *, c, eps):
    x = x_ref[0].astype(jnp.float32)  # (M, 128)
    mean, mean_sq = _channel_stats(x, c)
    rstd = jax.lax.rsqrt(mean_sq - mean * mean + eps)
    m = x.shape[0]
    out = (x - _broadcast_channels(mean, c, m)) * _broadcast_channels(rstd, c, m)
    o_ref[0] = out.astype(o_ref.dtype)
    mean_ref[0] = mean
    rstd_ref[0] = rstd


def _bwd_kernel(x_ref, g_ref, mean_ref, rstd_ref, dx_ref, *, c):
    x = x_ref[0].astype(jnp.float32)  # (M, 128)
    g = g_ref[0].astype(jnp.float32)
    m = x.shape[0]
    mean = _broadcast_channels(mean_ref[0], c, m)
    rstd = _broadcast_channels(rstd_ref[0], c, m)
    xhat = (x - mean) * rstd
    g_sum, _ = _channel_stats(g, c)
    gx_sum, _ = _channel_stats(g * xhat, c)
    g_mean = _broadcast_channels(g_sum, c, m)
    gx_mean = _broadcast_channels(gx_sum, c, m)
    dx = rstd * (g - g_mean - xhat * gx_mean)
    dx_ref[0] = dx.astype(dx_ref.dtype)


def _norm_fwd(x, c, eps, interpret):
    # x arrives as (R, M, 128); stats are (R, 1, C) to satisfy the TPU
    # block-shape alignment rules (last two dims must match the array).
    r = x.shape[0]
    grid = (r,)
    block = (1,) + x.shape[1:]
    index = lambda i: (i, 0, 0)
    stat_block, stat_index = (1, 1, c), (lambda i: (i, 0, 0))
    stat_shape = (r, 1, c)
    out, mean, rstd = pl.pallas_call(
        functools.partial(_fwd_kernel, c=c, eps=eps),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct(stat_shape, jnp.float32),
            jax.ShapeDtypeStruct(stat_shape, jnp.float32),
        ),
        grid=grid,
        in_specs=[pl.BlockSpec(block, index)],
        out_specs=(
            pl.BlockSpec(block, index),
            pl.BlockSpec(stat_block, stat_index),
            pl.BlockSpec(stat_block, stat_index),
        ),
        interpret=interpret,
    )(x)
    return out, mean, rstd


def _norm_bwd(x, g, mean, rstd, c, interpret):
    r = x.shape[0]
    block = (1,) + x.shape[1:]
    index = lambda i: (i, 0, 0)
    stat_block = (1, 1, c)
    stat_index = index
    return pl.pallas_call(
        functools.partial(_bwd_kernel, c=c),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(r,),
        in_specs=[
            pl.BlockSpec(block, index),
            pl.BlockSpec(block, index),
            pl.BlockSpec(stat_block, stat_index),
            pl.BlockSpec(stat_block, stat_index),
        ],
        out_specs=pl.BlockSpec(block, index),
        interpret=interpret,
    )(x, g, mean, rstd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _instance_norm_2d(x, c, eps, interpret):
    out, _, _ = _norm_fwd(x, c, eps, interpret)
    return out


def _instance_norm_2d_fwd(x, c, eps, interpret):
    out, mean, rstd = _norm_fwd(x, c, eps, interpret)
    return out, (x, mean, rstd)


def _instance_norm_2d_bwd(c, eps, interpret, res, g):
    x, mean, rstd = res
    return (_norm_bwd(x, g, mean, rstd, c, interpret),)


_instance_norm_2d.defvjp(_instance_norm_2d_fwd, _instance_norm_2d_bwd)


def instance_norm_pallas(x, eps: float = 1e-5, interpret: bool = False):
    """Fused instance norm over the spatial axes of a channels-last
    (N, *spatial, C) tensor. Caller must check :func:`supports_pallas_norm`.
    """
    c = x.shape[-1]
    x3d = x.reshape(x.shape[0], -1, 128)
    out = _instance_norm_2d(x3d, c, float(eps), interpret)
    return out.reshape(x.shape)
