"""U-Net model family: UNet2d, UNet3d, AnisotropicUNet.

TPU-native rebuild of torch_em/model/unet.py: ``UNetBase`` (:104) encoder/
base/decoder composition with side outputs (:137,:211), str-named final
activations (:162), the in-model POSTPROCESSING registry (:89) for
bioimage.io deployment, input divisibility checks (:229,:671), ``ConvBlock``
(:409, 2x[norm-conv-ReLU] with InstanceNorm default), max-pooling encoders,
interpolate+1x1-conv upsamplers (:444), ``UNet2d`` (:481) with
features = initial_features * gain**level (:520), ``AnisotropicUNet`` (:584)
with per-level scale factors and anisotropic kernels (:256-272), and
``UNet3d`` (:683).

Architecture notes (TPU-first):
- flax.linen modules; data is channels-last internally (N, *spatial, C) — the
  layout XLA tiles onto the MXU — while the public API stays channel-first
  (N, C, *spatial) for reference parity.
- ``dtype`` selects the compute precision (bf16 for training speed); params
  are always f32.
- Static shapes end-to-end; the divisibility check runs at trace time.
"""

import itertools
from functools import partial
from typing import Any, Callable, List, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .base import Model, get_activation

__all__ = [
    "UNet2d", "UNet3d", "AnisotropicUNet", "UNetModule", "POSTPROCESSING",
    "AccumulateChannels", "ConvBlock2d", "ConvBlock3d", "Upsampler2d", "Upsampler3d",
]


# ---------------------------------------------------------------------------
# In-model postprocessing (channel accumulation for bioimage.io deployment,
# reference model/unet.py:15-101)
# ---------------------------------------------------------------------------

class AccumulateChannels:
    """Accumulate affinity channels into boundaries (channel-first arrays)."""

    def __init__(self, invariant_channels, accumulate_channels, accumulator):
        assert accumulator in ("mean", "min", "max")
        self.invariant_channels = invariant_channels
        self.accumulate_channels = accumulate_channels
        self.accumulator = {"mean": jnp.mean, "min": jnp.min, "max": jnp.max}[accumulator]

    def __call__(self, x):
        c0, c1 = self.accumulate_channels
        acc = self.accumulator(x[:, c0:c1], axis=1, keepdims=True)
        if self.invariant_channels is None:
            return acc
        i0, i1 = self.invariant_channels
        return jnp.concatenate([x[:, i0:i1], acc], axis=1)


POSTPROCESSING = {
    "affinities_to_boundaries_anisotropic": lambda: AccumulateChannels(None, (1, 3), "max"),
    "affinities_to_boundaries2d": lambda: AccumulateChannels(None, (0, 2), "max"),
    "affinities_with_foreground_to_boundaries2d": lambda: AccumulateChannels((0, 1), (1, 3), "max"),
    "affinities_to_boundaries3d": lambda: AccumulateChannels(None, (0, 3), "max"),
    "affinities_with_foreground_to_boundaries3d": lambda: AccumulateChannels((0, 1), (1, 4), "max"),
}


# ---------------------------------------------------------------------------
# Parameter initialization
#
# The reference ConvBlock (torch_em/model/unet.py:409-441) relies on torch's
# Conv2d/3d DEFAULT init: kaiming_uniform(a=sqrt(5)) on the weight — which
# algebraically reduces to U(-1/sqrt(fan_in), +1/sqrt(fan_in)) with
# fan_in = in_channels * prod(kernel_size) — plus a uniform bias with the
# same bound.  flax's lecun_normal has 3x the weight variance and a zero
# bias; that difference was measured to slow CREMI-3D convergence by up to
# 5x on some seeds (round-3 parity sweep), so the UNet family initializes
# conv kernels and biases with the torch-matching distributions.
# ---------------------------------------------------------------------------

def _torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """torch Conv default weight init for a ``kernel_size + (I, O)`` kernel."""
    fan_in = int(np.prod(shape[:-1]))
    bound = fan_in ** -0.5
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def _torch_conv_bias_init(fan_in):
    """torch Conv default bias init: U(+-1/sqrt(fan_in)) with the WEIGHT's
    fan_in (the bias shape alone does not determine it, so it is a closure)."""
    bound = int(fan_in) ** -0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def _get_postprocessing(postprocessing):
    if postprocessing is None:
        return None
    if callable(postprocessing):
        return postprocessing
    if postprocessing in POSTPROCESSING:
        return POSTPROCESSING[postprocessing]()
    raise ValueError(f"Invalid postprocessing: {postprocessing}")


# ---------------------------------------------------------------------------
# Norms (channels-last)
# ---------------------------------------------------------------------------

# Fused Pallas instance-norm kernel (single HBM sweep per direction) for
# slabs that fit VMEM; module-level switch for benchmarking/debugging.
PALLAS_NORM = True


def _instance_norm(x, eps=1e-5, stat_groups=None):
    """Parameter-free instance norm over spatial axes (torch InstanceNorm default).

    Single-pass statistics (E[x^2] - E[x]^2) with f32 accumulation: one data
    sweep instead of jnp.var's two, and XLA fuses the two reductions. On TPU,
    slabs that fit VMEM use the fused Pallas kernel (ops/pallas/norm.py)
    instead: one HBM read forward, two backward (XLA needs 2 / 4).

    ``stat_groups`` (None = standard per-sample stats) supports the 2.5D
    execution mode, where the depth axis of 3D data is folded into the batch:
    the batch rows are split into ``stat_groups`` groups (one per original
    sample) that share statistics.
    """
    if PALLAS_NORM and stat_groups is None and x.ndim >= 3:
        try:
            from ..ops.pallas.norm import instance_norm_pallas, supports_pallas_norm

            if supports_pallas_norm(x.shape, x.dtype):
                # select the branch at LOWERING time: the Pallas kernel only
                # lowers on TPU, while the same traced program may run on CPU
                # (param init under jax.default_device(cpu), device="cpu"
                # training while the TPU plugin is registered, virtual-mesh
                # tests).  platform_dependent lowers only the target
                # platform's branch, so the CPU executable never sees the
                # pallas_call.
                return jax.lax.platform_dependent(
                    x,
                    tpu=lambda xx: instance_norm_pallas(xx, eps=eps),
                    default=lambda xx: _norm_core(xx, 1, None, eps),
                )
        except ImportError:
            pass
    return _norm_core(x, 1, stat_groups, eps)


class _InstanceNormTrackStats(nn.Module):
    """Affine instance norm with running statistics — torch
    ``InstanceNorm*d(affine=True, track_running_stats=True)`` semantics:
    training normalizes per instance and accumulates per-channel running
    mean/var (momentum 0.1, unbiased var); eval normalizes with the running
    statistics. Stats live in the 'batch_stats' collection, which the trainer
    threads through train steps and checkpoints."""

    epsilon: float = 1e-5
    momentum: float = 0.1  # torch convention: new = (1 - m) * old + m * observed
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))

        spatial_axes = tuple(range(1, x.ndim - 1))
        if train:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=spatial_axes, keepdims=True)          # (B, 1.., C)
            var = jnp.mean(jnp.square(xf - mean), axis=spatial_axes, keepdims=True)
            xhat = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
            if not self.is_initializing():
                n = float(np.prod([x.shape[a] for a in spatial_axes]))
                unbiased = jnp.mean(var, axis=0).reshape(c) * (n / max(n - 1.0, 1.0))
                obs_mean = jnp.mean(mean, axis=0).reshape(c)
                ra_mean.value = ((1 - self.momentum) * ra_mean.value
                                 + self.momentum * jax.lax.stop_gradient(obs_mean))
                ra_var.value = ((1 - self.momentum) * ra_var.value
                                + self.momentum * jax.lax.stop_gradient(unbiased))
        else:
            shape = (1,) * (x.ndim - 1) + (c,)
            xhat = ((x.astype(jnp.float32) - ra_mean.value.reshape(shape))
                    * jax.lax.rsqrt(ra_var.value.reshape(shape) + self.epsilon))
        return (scale * xhat + bias).astype(x.dtype)


class _NormLayer(nn.Module):
    """Dispatches the reference's norm options (model/unet.py:391)."""

    norm: Optional[str]
    stat_groups: Optional[int] = None  # 2.5D mode: groups sharing statistics
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.norm is None:
            return x
        if self.norm == "InstanceNorm":
            return _instance_norm(x, stat_groups=self.stat_groups)
        if self.norm == "InstanceNormTrackStats":
            return _InstanceNormTrackStats(dtype=self.dtype)(x, train=train)
        if self.norm == "GroupNorm":
            return nn.GroupNorm(num_groups=min(32, x.shape[-1]), epsilon=1e-5, dtype=self.dtype)(x)
        if self.norm == "BatchNorm":
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype
            )(x)
        raise ValueError(
            f"Invalid norm: expect one of 'InstanceNorm', 'BatchNorm' or 'GroupNorm', got {self.norm}"
        )


def _to_tuple(v, dim):
    return (v,) * dim if isinstance(v, int) else tuple(v)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _pool2_axis(x, axis):
    """Pairwise max along ``axis`` (window 2, stride 2)."""
    sl_a = [slice(None)] * x.ndim
    sl_b = [slice(None)] * x.ndim
    sl_a[axis] = slice(0, None, 2)
    sl_b[axis] = slice(1, None, 2)
    return jnp.maximum(x[tuple(sl_a)], x[tuple(sl_b)])


def _pool2_axis_fwd(x, axis):
    sl_a = [slice(None)] * x.ndim
    sl_b = [slice(None)] * x.ndim
    sl_a[axis] = slice(0, None, 2)
    sl_b[axis] = slice(1, None, 2)
    a = x[tuple(sl_a)]
    b = x[tuple(sl_b)]
    return jnp.maximum(a, b), (a >= b)


def _pool2_axis_bwd(axis, mask, g):
    # Route the full gradient to the left operand on ties (torch-style single
    # winner). Interleave via two interior pads + add: unlike stack+reshape
    # (whose merge of a non-minor axis pair forces relayout copies around the
    # pads) interior padding keeps the operand layout.
    ga = jnp.where(mask, g, 0)
    gb = g - ga
    cfg = [(0, 0, 0)] * g.ndim
    cfg_a, cfg_b = list(cfg), list(cfg)
    cfg_a[axis] = (0, 1, 1)  # even positions
    cfg_b[axis] = (1, 0, 1)  # odd positions
    zero = jnp.zeros((), g.dtype)
    return (jax.lax.pad(ga, zero, cfg_a) + jax.lax.pad(gb, zero, cfg_b),)


_pool2_axis.defvjp(_pool2_axis_fwd, _pool2_axis_bwd)


def _max_pool_reshape(x, window):
    """Max pooling with window == strides via repeated pairwise maxima.

    Equivalent to ``nn.max_pool(x, window, window)`` for divisible shapes.
    Strided-slice pairwise maxima profile ~6ms/step faster than the previous
    reshape+reduce_max formulation on the CREMI UNet3d step: the reshape
    variant materializes 6-D intermediates in its VJP (eq/broadcast/
    reduce_sum at awkward layouts). The custom VJP routes gradients with a
    select + interleave instead of the gather/scatter-add pair XLA picks for
    strided-slice VJPs. Ties send the gradient to the first (left) element,
    like torch's max-pool argmax. Non-power-of-2 windows fall back to
    nn.max_pool. x: (N, *spatial, C).
    """
    if any(w & (w - 1) for w in window):
        return nn.max_pool(x, window_shape=tuple(window), strides=tuple(window))
    for axis, w in enumerate(window, start=1):
        while w > 1:
            x = _pool2_axis(x, axis)
            w //= 2
    return x


# Width-packing (1xP pixels -> channels) for small-channel convs. Module-level
# switch so benchmarks can measure nominal model FLOPs (cost_analysis counts
# the packed lowering's Px FLOPs otherwise) and for debugging.
W4_PACKING = True

# 2x2 shifted-phase execution for p=4 levels (see the PHASE section below):
# 1.78x executed/nominal instead of dense3's 4x, layout-resident end to end.
PHASE_PACKING = True

# Norm-fold execution: when the parameter-free InstanceNorm has a SINGLE
# statistics group (batch 1, or the 2.5D mode's stat_groups=1), fold the
# affine normalize into the following conv's weights (reference order is
# norm -> conv -> ReLU, torch_em/model/unet.py:409-427, with no nonlinearity
# between norm and conv): conv(s*(x-mean), W) == conv(x, W*s) + border bias
# (see _fold_bias_apply). This removes the materialized normalize pass
# forward AND turns the norm backward's activation-sized reductions into
# weight-sized contractions flowing through the conv's weight gradient.
NORM_FOLD = True

# Dead-column W padding for the SHIFTED phase grid: the shifted tensors are
# (Hb+1, Wb+1) and the odd W extent breaks the (8-sublane x 128-lane) tiling,
# forcing relayout copies around each phase conv (round-3 trace finding).
# With wpad the to_shifted conv emits extra zero columns so the shifted W is
# the next multiple of 8 (conv pad (1, 1+e)), and the to_aligned conv trims
# them with negative padding (0, -e) — layouts stay tile-aligned end to end.
# H stays odd (not a tiled dimension). Exactness is kept by the masks and a
# count-scale that excludes the dead columns. Off by default until the bench
# confirms the win (perf_options(phase_wpad=True)).
PHASE_WPAD = False


class perf_options:
    """Config surface for the UNet perf switches (width packing, Pallas norm,
    packed-conv lowering). Usable as a setter or a context manager::

        from torch_em_tpu.models.unet import perf_options
        perf_options(packing=False)             # set globally
        with perf_options(pallas_norm=False):   # scoped override
            ...

    These switches select exactly-equivalent lowerings (numerics covered by
    TestPackedExecution); they are module-global because they change how
    modules TRACE — toggling them invalidates jit caches, so they must be set
    before compilation, not per-call.
    """

    _FLAGS = {"packing": "W4_PACKING", "pallas_norm": "PALLAS_NORM",
              "norm_fold": "NORM_FOLD",
              "packed_conv_mode": "PACKED_CONV_MODE",
              "phase_packing": "PHASE_PACKING",
              "phase_wpad": "PHASE_WPAD",
              "groupmax_vjp": "GROUPMAX_VJP"}

    def __init__(self, packing=None, pallas_norm=None, packed_conv_mode=None,
                 phase_packing=None, norm_fold=None, phase_wpad=None,
                 groupmax_vjp=None):
        g = globals()
        self._saved = {}
        for arg, name in self._FLAGS.items():
            value = {"packing": packing, "pallas_norm": pallas_norm,
                     "packed_conv_mode": packed_conv_mode,
                     "phase_packing": phase_packing,
                     "norm_fold": norm_fold,
                     "phase_wpad": phase_wpad,
                     "groupmax_vjp": groupmax_vjp}[arg]
            if value is not None:
                self._saved[name] = g[name]
                g[name] = value

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        g = globals()
        for name, value in self._saved.items():
            g[name] = value
        return False


def _expand_kernel_wp(w, p):
    """Expand a 3x3 conv kernel (3, 3, Ci, Co) to the exactly-equivalent
    block-space kernel (3, 3, p*Ci, p*Co) operating on width-packed tensors
    (p adjacent pixels along W folded into channels, index ``dj*Ci + ci``).
    For output within-block position oj and tap kx, the input pixel lands in
    width-block offset bj at within-block position dj with
    ``p*bj + dj = oj + kx - 1`` (same padding=1)."""
    kh, kw, ci, co = w.shape
    wp = jnp.zeros((kh, 3, p, ci, p, co), w.dtype)
    for oj in range(p):
        for kx in range(kw):
            bj, dj = divmod(oj + kx - 1, p)
            wp = wp.at[:, bj + 1, dj, :, oj, :].set(w[:, kx])
    return wp.reshape(kh, 3, p * ci, p * co)


# ---------------------------------------------------------------------------
# 2x2 shifted-phase execution for p=4 levels
# ---------------------------------------------------------------------------
# The dense3 W-packed lowering executes p x nominal FLOPs. For p=4 the
# shifted-phase representation cuts that to 16/9 = 1.78x: activations live as
# ALIGNED phase tensors (B, H/2, W/2, 4C) — channel index (a*2 + b)*C + c for
# pixel parity (a, b) — and every 3x3 conv becomes a dense 2x2 conv that
# ALTERNATES between the aligned grid and the half-pixel-SHIFTED grid
# (blocks covering pixels 2u-1..2u), so the 3-tap window always spans exactly
# two blocks and no data movement ("shift") is ever materialized: conv0 of a
# block maps aligned->shifted, conv1 maps shifted->aligned. The layout is
# produced once from the tiny network input / by the phase-emitting 2x
# upsampler and leaves once through the (block-diagonal) out conv, so the
# only relayouts touch small tensors (the transpose-based space-to-depth on
# the full activation measured 1.4-2.5 ms per 128 MB on v5e — avoided).
PHASE = -4


def _is_phase(pack):
    return pack == PHASE


def _s2d_phase(x):
    """(B, H, W, C) -> aligned phase (B, H/2, W/2, 4C). reshape+transpose
    form: the strided-slice form lowers to gathers (~15x slower on TPU)."""
    b, h, w, c = x.shape
    y = x.reshape(b, h // 2, 2, w // 2, 2, c)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5))
    return y.reshape(b, h // 2, w // 2, 4 * c)


def _d2s_phase(y):
    """Aligned phase (B, Hb, Wb, 4C) -> (B, 2Hb, 2Wb, C)."""
    b, hb, wb, c4 = y.shape
    c = c4 // 4
    z = y.reshape(b, hb, wb, 2, 2, c)
    z = jnp.transpose(z, (0, 1, 3, 2, 4, 5))
    return z.reshape(b, hb * 2, wb * 2, c)


def _unpack_any(x, pack):
    """Undo either packing: width-pack factor p or the phase layout."""
    if _is_phase(pack):
        return _d2s_phase(x)
    return _unpack_w(x, pack)


def _phase_placement():
    """Constant placement tensor M[ku, kv, ap, bp, a, b, ky, kx] of the
    phase-transition kernel: target phase t with tap dy reads source phase
    (t + dy + 1) % 2 at block tap (t + dy + 1) // 2 (same along W)."""
    m = np.zeros((2, 2, 2, 2, 2, 2, 3, 3), np.float32)
    for a in range(2):
        for b in range(2):
            for dy in range(-1, 2):
                for dx in range(-1, 2):
                    ku, ap = (a + dy + 1) // 2, (a + dy + 1) % 2
                    kv, bp = (b + dx + 1) // 2, (b + dx + 1) % 2
                    m[ku, kv, ap, bp, a, b, dy + 1, dx + 1] = 1.0
    return m


_PHASE_PLACEMENT = _phase_placement()


def _phase_kernel(w):
    """(3, 3, Ci, Co) -> (2, 2, 4Ci, 4Co) phase-transition conv kernel.

    The same kernel serves both directions — the half-pixel offsets are
    symmetric: aligned->shifted runs it with padding (1,1)/(1,1),
    shifted->aligned VALID. Built as ONE einsum against the constant
    placement tensor (36 scattered dynamic-update-slices serialize badly on
    TPU and their AD transpose is 36 gathers)."""
    ci, co = w.shape[2], w.shape[3]
    m = jnp.asarray(_PHASE_PLACEMENT, w.dtype)
    wp = jnp.einsum("uvpqabyx,yxio->uvpqiabo", m, w)
    return wp.reshape(2, 2, 4 * ci, 4 * co)


def _conv_phase_apply(x, wp, to_shifted, e=0):
    """``e`` = dead-column padding of the SHIFTED grid along W (PHASE_WPAD):
    to_shifted emits e extra zero columns (pad (1, 1+e)); to_aligned trims
    them with negative padding (0, -e) — both fused into the conv op."""
    pad = [(1, 1), (1, 1 + e)] if to_shifted else [(0, 0), (0, -e)]
    return jax.lax.conv_general_dilated(
        x, wp, (1, 1), pad, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _conv_phase_p(x, wp, to_shifted, e=0):
    """Phase-transition 2x2 conv on the (already expanded) phase kernel,
    with a hand-written VJP: the default transpose lowers the weight
    gradient with the SHIFTED (Hb+1)^2 cotangent in the kernel role, which
    the TPU conv canonicalizer materializes as a full-size `reverse`
    (~0.8 ms/step on the CREMI bench). Here the input gradient is the
    opposite-direction phase conv (spatially flipped, io-transposed kernel)
    and the weight gradient always puts the larger (Hb+1)^2 operand in the
    image role with VALID padding, so no large reversal exists."""
    return _conv_phase_apply(x, wp, to_shifted, e)


def _conv_phase_p_fwd(x, wp, to_shifted, e=0):
    return _conv_phase_apply(x, wp, to_shifted, e), (x, wp)


def _conv_phase_p_bwd(to_shifted, e, res, g):
    x, wp = res
    gx = _conv_phase_apply(
        g, jnp.flip(wp, (0, 1)).transpose(0, 1, 3, 2), not to_shifted, e)
    # (A four-sliced-dot_general weight grad — one tall-skinny contraction
    # per 2x2 tap — measured 6.7 ms/step SLOWER than these conv forms.)
    # With wpad, the dead-column windows of the VALID weight-grad conv are
    # trimmed by the same negative padding; dead-column cotangents are zero
    # (masked upstream), so the kept windows carry the exact sums.
    if to_shifted:
        # dwp[u,v,i,o] = sum_{n,a,b} g[n,a,b,o] x[n,a+u-1,b+v-1,i]:
        # image = g (shifted grid), kernel = x, VALID; the length-2 output
        # window comes out u-reversed (dwp[u] reads g[k+1-u]).
        out = jax.lax.conv_general_dilated(
            g, x, (1, 1), [(0, 0), (0, -e)],
            dimension_numbers=("CHWN", "IHWO", "NHWC"),
            preferred_element_type=jnp.float32)          # (4Co, 2, 2, 4Ci)
        gw = jnp.flip(out, (1, 2)).transpose(1, 2, 3, 0)
    else:
        # dwp[u,v,i,o] = sum_{n,a,b} x[n,a+u,b+v,i] g[n,a,b,o]:
        # image = x (shifted grid), kernel = g, VALID, direct orientation.
        out = jax.lax.conv_general_dilated(
            x, g, (1, 1), [(0, 0), (0, -e)],
            dimension_numbers=("CHWN", "IHWO", "NHWC"),
            preferred_element_type=jnp.float32)          # (4Ci, 2, 2, 4Co)
        gw = out.transpose(1, 2, 0, 3)
    return gx, gw.astype(wp.dtype)


_conv_phase_p.defvjp(_conv_phase_p_fwd, _conv_phase_p_bwd)


def _conv_phase(x, kernel, to_shifted, e=0):
    """3x3/pad-1 conv as a phase-transition 2x2 conv. ``to_shifted`` consumes
    an ALIGNED tensor (Hb, Wb) and produces the SHIFTED grid
    (Hb+1, Wb+1+e); otherwise the inverse."""
    wp = _phase_kernel(kernel)
    return _conv_phase_p(x, wp, to_shifted, e)


def _mask_shifted(x, c, e=0):
    """Zero the out-of-image positions of a SHIFTED phase tensor (pixel row
    -1 = block 0 phase a'=0, pixel row H = last block phase a'=1; same along
    W). Required for exactness: the next conv's taps beyond the image border
    must read zero (the reference's zero padding), not the extrapolated
    values the previous conv computed there. ``e`` = PHASE_WPAD dead columns
    at the high end of W (zeroed entirely; the real W border sits at
    sw-1-e).

    Implemented as multiplies with constant-folded broadcast masks — they
    fuse into the neighboring elementwise ops, unlike edge
    dynamic-update-slices (which copy)."""
    sh, sw = x.shape[1], x.shape[2]
    last_w = sw - 1 - e
    mh = np.ones((sh, 1, 4 * c), np.float32)
    mh[0, :, :2 * c] = 0.0
    mh[-1, :, 2 * c:] = 0.0
    mw = np.ones((sw, 4 * c), np.float32)
    mw[0, :c] = 0.0
    mw[0, 2 * c:3 * c] = 0.0
    mw[last_w, c:2 * c] = 0.0
    mw[last_w, 3 * c:] = 0.0
    if e:
        mw[last_w + 1:] = 0.0
    return x * jnp.asarray(mh, x.dtype) * jnp.asarray(mw, x.dtype)


# route the phase-pool group max through the no-tie-normalization custom VJP.
# Default False (plain AD reduce_max backward): under bf16 activations equal
# positive values across phase groups are common, not measure-zero, and the
# custom backward would deliver the FULL gradient to every tied position
# (k*g on a k-way tie) where AD splits g/k — an invalid subgradient on ties.
# The round-5 on-chip A/B measured the two within 0.02 ms/it (ab_matrix.json),
# so correctness wins and the switch stays only for re-audits.
GROUPMAX_VJP = False


@jax.custom_vjp
def _groupmax4(y5):
    return jnp.max(y5, axis=3)


def _groupmax4_fwd(y5):
    m = jnp.max(y5, axis=3)
    return m, (y5, m)


def _groupmax4_bwd(res, g):
    # Gradient to EVERY argmax position, with no tie normalization: one eq +
    # one masked broadcast-multiply, where jax's reduce_max AD adds a tie
    # count (convert + reduce_sum + div) — three more full-tensor passes.
    # Ties between phase groups occur at post-ReLU zeros, where the upstream
    # ReLU backward zeroes the duplicated gradient anyway; positive-value
    # ties are measure-zero on continuous activations.
    y5, m = res
    return (jnp.where(y5 == m[:, :, :, None, :], g[:, :, :, None, :], 0),)


_groupmax4.defvjp(_groupmax4_fwd, _groupmax4_bwd)


def _pool2x2_phase(y):
    """2x2 max pool of an ALIGNED phase tensor: the window IS the phase
    block, so the pool is a max over the 4 phase groups -> (B, Hb, Wb, C)
    unpacked at the pooled resolution. (Lane-slice maxima measured ~1.4
    ms/step slower, and a custom tie-splitting VJP ~0.7 ms/step slower,
    than this reshape+reduce on the CREMI bench; the _groupmax4 custom VJP
    only replaces the backward's tie-splitting arithmetic.)"""
    b, hb, wb, c4 = y.shape
    y5 = y.reshape(b, hb, wb, 4, c4 // 4)
    return _groupmax4(y5) if GROUPMAX_VJP else jnp.max(y5, axis=3)


def _upsample2x_to_phase(x):
    """Exact 2x linear upsample (half-pixel centers, edge-clamped — identical
    to _upsample2x_linear_axis) emitted directly in the ALIGNED phase layout:
    each phase group is a 2-tap blend of the low-res tensor, so the full-res
    spatial layout is never materialized."""
    def sh(arr, axis, off):
        # (the concat-based edge shift measured 0.6 ms/step slower than
        # this pad+slice form on the CREMI bench)
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

    rows = (0.75 * x + 0.25 * sh(x, 1, 1), 0.75 * x + 0.25 * sh(x, 1, -1))
    groups = []
    for t in rows:
        groups.append(0.75 * t + 0.25 * sh(t, 2, 1))
        groups.append(0.75 * t + 0.25 * sh(t, 2, -1))
    return jnp.concatenate(groups, axis=-1)


class _ConvPhase(nn.Module):
    """3x3 conv executed as a phase-transition 2x2 conv (see _phase_kernel).
    Parameter layout identical to _Conv2dFast / _Conv3dFast (``kernel_size +
    (I, O)`` kernel + (O,) bias — (1, 3, 3) in the 2.5D mode), so checkpoints
    are interchangeable across lowerings regardless of which one traced at
    init. Tuple inputs are virtual channel concatenations (kernel sliced per
    part)."""

    features: int
    to_shifted: bool
    kernel_size: Tuple[int, ...] = (3, 3)
    dtype: Any = jnp.float32
    wpad: int = 0  # PHASE_WPAD dead columns of the shifted grid

    @nn.compact
    def __call__(self, x, fold=None):
        parts = x if isinstance(x, (tuple, list)) else (x,)
        in_features = sum(p.shape[-1] // 4 for p in parts)
        kernel = self.param(
            "kernel", _torch_conv_kernel_init,
            tuple(self.kernel_size) + (in_features, self.features), jnp.float32,
        )
        fan_in = in_features * int(np.prod(self.kernel_size))
        bias = self.param("bias", _torch_conv_bias_init(fan_in),
                          (self.features,), jnp.float32)
        y = None
        c0 = 0
        t_total = None
        folds = fold if fold is not None else (None,) * len(parts)
        for p, f in zip(parts, folds):
            cin = p.shape[-1] // 4
            k = kernel[..., c0:c0 + cin, :]
            if len(self.kernel_size) == 3:  # 2.5D: (1, 3, 3, I, O)
                k = k[0]
            c0 += cin
            if f is not None:
                # norm-fold: scale the input-channel axis, collect the tap
                # sums for the border bias (see _fold_bias_apply)
                mean, scale = f
                tt = jnp.einsum("yxio,i->yxo", k, mean * scale)
                t_total = tt if t_total is None else t_total + tt
                k = k * scale[:, None]
            k = k.astype(self.dtype)
            yi = _conv_phase(p.astype(self.dtype), k, self.to_shifted, self.wpad)
            y = yi if y is None else y + yi
        b = jnp.tile(bias, 4)
        y = _bias_add(y, b.astype(self.dtype))
        if t_total is not None:
            y = _fold_bias_apply(
                y, t_total,
                _fold_specs_phase(y, self.to_shifted, self.features,
                                  self.wpad if self.to_shifted else 0), 4)
        return y


class _DensePhase(nn.Module):
    """Pointwise (1x1) conv on an ALIGNED phase tensor with nn.Dense-
    compatible (I, O) parameters, applied as ``x @ blockdiag_4(kernel)`` so
    the phase layout never round-trips through (B, H, W, C)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1] // 4
        kernel = self.param("kernel", _torch_conv_kernel_init,
                            (c, self.features), jnp.float32)
        bias = self.param("bias", _torch_conv_bias_init(c),
                          (self.features,), jnp.float32)
        kb = jnp.zeros((4 * c, 4 * self.features), self.dtype)
        for g in range(4):
            kb = kb.at[g * c:(g + 1) * c, g * self.features:(g + 1) * self.features].set(
                kernel.astype(self.dtype))
        return x.astype(self.dtype) @ kb + jnp.tile(bias, 4).astype(self.dtype)


def _pc_stats(xg, p, c, eps, count_scale=1.0):
    """Per-(group, channel) mean and rsqrt-scale of (g, rows, *spatial, p*C)
    data, folding the p packed positions into their channel.

    ``count_scale`` = counted positions / true positions corrects the means
    when the tensor carries zeroed out-of-image slots (the SHIFTED phase
    layout): zeros leave the sums untouched, so scaling the means by the
    slot ratio recovers the exact statistics over the real pixels."""
    g = xg.shape[0]
    axes = tuple(range(1, xg.ndim - 1))
    meanp = jnp.mean(xg, axis=axes, dtype=jnp.float32)                  # (g, pC)
    mean_sqp = jnp.mean(jnp.square(xg.astype(jnp.float32)), axis=axes)  # (g, pC)
    mean = jnp.mean(meanp.reshape(g, p, c), axis=1) * count_scale       # (g, C)
    mean_sq = jnp.mean(mean_sqp.reshape(g, p, c), axis=1) * count_scale
    scale = jax.lax.rsqrt(mean_sq - mean * mean + eps)
    return mean, scale


def _pc_broadcast(v, p, xg_ndim):
    """(g, C) per-channel value -> (g, 1, ..., 1, p*C) broadcastable."""
    g = v.shape[0]
    shape = (g,) + (1,) * (xg_ndim - 2) + (p * v.shape[1],)
    return jnp.tile(v, (1, p)).reshape(shape)


def _fold_stats(x, p, eps=1e-5, count_scale=1.0):
    """Single-group instance-norm statistics of a (possibly packed) tensor:
    per-channel ``(mean, scale)`` of shape (C,), statistics over ALL batch
    rows and spatial positions (valid when the effective group count is 1 —
    batch 1, or the 2.5D execution's stat_groups=1). Inputs feed the
    norm-fold conv path (see NORM_FOLD / _fold_bias_apply)."""
    c = x.shape[-1] // p
    mean, scale = _pc_stats(x[None], p, c, eps, count_scale)
    return mean[0], scale[0]


def _fold_bias_apply(y, t, axis_specs, tile):
    """Add the norm-fold border-correction bias to a conv output.

    Folding the parameter-free InstanceNorm ``n = s*(x - mean)`` into the
    conv that consumes it rewrites ``conv(n, W)`` (zero-padded) as
    ``conv(x, W*s) + bias_map`` with
    ``bias_map(pos) = -sum_{taps inside the image} t[tap]`` and
    ``t[tap, co] = sum_ci W[tap, ci, co] * s_ci * mean_ci``. The map is the
    constant ``-t.sum()`` in the interior and deviates only where the 3-tap
    window crosses the image border, so inclusion-exclusion over the missing
    tap sides expands it into at most 3^d broadcast terms (constant one-hot
    masks times tiny dynamic tap sums) that XLA fuses into the conv epilogue
    — no extra memory pass, and its backward is weight-sized plus the bias
    gradient's existing reduction.

    ``t``: f32 ``(3,)*d + (Co,)`` (d = number of folded conv axes);
    ``axis_specs``: per folded axis ``(y_axis, lo, hi)``, lo/hi =
    ``(spatial_onehot, channel_mask_or_None)`` locating that border's pixels
    in y's (possibly packed/phase) layout; ``tile``: channel-tiling factor of
    y's layout (4 for phase, p for width packing, 1 plain)."""
    d = len(axis_specs)
    add = None
    for combo in itertools.product((None, 0, 2), repeat=d):
        n_miss = sum(c is not None for c in combo)
        coef = -1.0 if n_miss % 2 == 0 else 1.0
        ts = t
        for ax in reversed(range(d)):
            if combo[ax] is None:
                ts = ts.sum(axis=ax)
            else:
                ts = jnp.take(ts, combo[ax], axis=ax)
        term = jnp.tile(ts, tile) if tile > 1 else ts  # (tile*Co,)
        chan = None
        spat = []
        for (y_ax, lo, hi), c in zip(axis_specs, combo):
            if c is None:
                continue
            sv, cv = lo if c == 0 else hi
            spat.append((y_ax, sv))
            if cv is not None:
                chan = cv if chan is None else chan * cv
        if chan is not None:
            term = term * jnp.asarray(chan, term.dtype)
        expr = (coef * term).astype(y.dtype).reshape(
            (1,) * (y.ndim - 1) + (term.shape[0],))
        for y_ax, sv in spat:
            shape = [1] * y.ndim
            shape[y_ax] = len(sv)
            expr = expr * jnp.asarray(sv, y.dtype).reshape(shape)
        add = expr if add is None else add + expr
    return y + add


def _fold_onehot(n, i):
    v = np.zeros(n, np.float32)
    v[i] = 1.0
    return v


def _fold_specs_phase(y, to_shifted, c, e=0):
    """Border specs (see _fold_bias_apply) for a phase-layout conv output:
    channel group (a*2 + b)*C holds row-phase a / col-phase b. ALIGNED grids
    put pixel row 0 at (block 0, a=0); SHIFTED grids at (block 0, a'=1)
    (pixel rows are ``2I - 1 + a'``); mirrored on the high side and along W.
    ``e`` (PHASE_WPAD dead columns) moves the shifted grid's real high-W
    border to sw-1-e; the dead columns themselves are masked out downstream,
    so their (wrong) bias values never survive."""
    def gm(groups):
        v = np.zeros(4 * c, np.float32)
        for g in groups:
            v[g * c:(g + 1) * c] = 1.0
        return v

    sh, sw = y.shape[1], y.shape[2]
    if to_shifted:
        row = (1, (_fold_onehot(sh, 0), gm((2, 3))), (_fold_onehot(sh, sh - 1), gm((0, 1))))
        col = (2, (_fold_onehot(sw, 0), gm((1, 3))), (_fold_onehot(sw, sw - 1 - e), gm((0, 2))))
    else:
        row = (1, (_fold_onehot(sh, 0), gm((0, 1))), (_fold_onehot(sh, sh - 1), gm((2, 3))))
        col = (2, (_fold_onehot(sw, 0), gm((0, 2))), (_fold_onehot(sw, sw - 1), gm((1, 3))))
    return [row, col]


def _fold_specs_2d(y, p, co, axis0=1):
    """Border specs for a (possibly width-packed) 2D conv output
    (B, H, W/p, p*Co): row borders are plain; the W borders live in the
    first / last packed position's channel slice of the first / last block."""
    h, wb = y.shape[axis0], y.shape[axis0 + 1]
    if p > 1:
        cm_lo = np.zeros(p * co, np.float32)
        cm_lo[:co] = 1.0
        cm_hi = np.zeros(p * co, np.float32)
        cm_hi[(p - 1) * co:] = 1.0
    else:
        cm_lo = cm_hi = None
    row = (axis0, (_fold_onehot(h, 0), None), (_fold_onehot(h, h - 1), None))
    col = (axis0 + 1, (_fold_onehot(wb, 0), cm_lo), (_fold_onehot(wb, wb - 1), cm_hi))
    return [row, col]


def _fold_specs_3d(y):
    """Border specs for an unpacked 3D conv output (B, D, H, W, C) with a
    3x3x3 pad-1 kernel."""
    dz = (1, (_fold_onehot(y.shape[1], 0), None),
          (_fold_onehot(y.shape[1], y.shape[1] - 1), None))
    return [dz] + _fold_specs_2d(y, 1, y.shape[-1], axis0=2)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def _norm_core(x, p, stat_groups, eps, count_scale=1.0):
    """Parameter-free instance norm with packed-position folding.

    x: (B, *spatial, p*C) with packed channel index dj*C + c (p=1 = plain
    channels-last). Statistics are per (group, channel) where the batch rows
    are split into ``stat_groups`` groups (None = per-sample stats).

    Custom VJP: the analytic dx = s*(g - mean_c(g) - y*mean_c(g*y)) runs as
    two fused reduction sweeps instead of the tile/concatenate chains XLA
    derives from the forward (~4ms/step on the CREMI UNet3d benchmark).
    """
    g = stat_groups if stat_groups is not None else x.shape[0]
    c = x.shape[-1] // p
    xg = x.reshape((g, x.shape[0] // g) + x.shape[1:])
    mean, scale = _pc_stats(xg, p, c, eps, count_scale)
    y = (xg - _pc_broadcast(mean, p, xg.ndim).astype(x.dtype)) \
        * _pc_broadcast(scale, p, xg.ndim).astype(x.dtype)
    return y.reshape(x.shape)


def _norm_core_fwd(x, p, stat_groups, eps, count_scale=1.0):
    g = stat_groups if stat_groups is not None else x.shape[0]
    c = x.shape[-1] // p
    xg = x.reshape((g, x.shape[0] // g) + x.shape[1:])
    mean, scale = _pc_stats(xg, p, c, eps, count_scale)
    y = (xg - _pc_broadcast(mean, p, xg.ndim).astype(x.dtype)) \
        * _pc_broadcast(scale, p, xg.ndim).astype(x.dtype)
    return y.reshape(x.shape), (y, scale)


def _norm_core_bwd(p, stat_groups, eps, count_scale, res, gr):
    yf, scale = res
    g = scale.shape[0]
    c = scale.shape[1]
    yg = yf.reshape((g, yf.shape[0] // g) + yf.shape[1:])
    grg = gr.reshape(yg.shape)
    axes = tuple(range(1, yg.ndim - 1))
    # n = true position count (count_scale corrects for zeroed slots;
    # their upstream gradients are zero, so the sums are over real pixels)
    n = np.prod([yg.shape[a] for a in axes]) * p / count_scale
    # per-channel means of g and g*y (fold packed positions)
    s1 = jnp.sum(grg, axis=axes, dtype=jnp.float32).reshape(g, p, c).sum(axis=1)
    s2 = jnp.sum((grg * yg).astype(jnp.float32), axis=axes,
                 dtype=jnp.float32).reshape(g, p, c).sum(axis=1)
    m1 = _pc_broadcast(s1 / n, p, yg.ndim).astype(gr.dtype)
    m2 = _pc_broadcast(s2 / n, p, yg.ndim).astype(gr.dtype)
    sc = _pc_broadcast(scale, p, yg.ndim).astype(gr.dtype)
    dx = sc * (grg - m1 - yg * m2)
    return (dx.reshape(gr.shape),)


_norm_core.defvjp(_norm_core_fwd, _norm_core_bwd)


def _instance_norm_packed(x, p, eps=1e-5, stat_groups=None, count_scale=1.0):
    """Instance norm on a width-packed (B, H, W/p, p*C) tensor (packed channel
    index = dj*C + c): per-channel statistics are the equal-weight average of
    the p within-block positions' statistics — exact, no unpacking.
    ``count_scale`` corrects the statistics of SHIFTED phase tensors whose
    out-of-image slots are zeroed (see _pc_stats)."""
    return _norm_core(x, p, stat_groups, eps, count_scale)


def _conv2d_wp(x, kernel, p):
    """3x3/pad-1 2D conv computed in a width-packed (1xP -> channels)
    representation.

    TPU-native lowering for small channel counts: a stride-1 3x3 conv with
    Co < 128 output channels leaves most of the 128-wide MXU output lanes
    idle (profiled at ~3-8% MXU on v5e for Co=32). Folding p = 128/Co
    adjacent W-pixels into channels widens the output to p*Co = 128 lanes at
    p-times the nominal conv FLOPs — a net win because MXU utilization
    improves by the same factor while the tensors get 128-lane layouts
    (folding further would add FLOPs with no utilization gain, hence p is
    capped by Co). W and C are adjacent memory dims in NHWC, so the packing
    is a pure reshape (no transpose/copy, unlike 2x2 space-to-depth). Exact
    (see _expand_kernel_wp) and differentiates through; the VJP is the same
    trick on the transposed convs.
    """
    b, h, w, c = x.shape
    c_out = kernel.shape[-1]
    y = _conv_packed(x.reshape(b, h, w // p, p * c), kernel, p)
    return y.reshape(b, h, w, c_out)


# Packed-conv lowering: "dense3" (default) is the 3-block expanded kernel —
# p x nominal FLOPs but a single dense MXU-saturating conv consuming the
# packed input IN PLACE. Both lower-FLOP alternatives measured SLOWER on the
# CREMI bench (49.4 ms dense3 baseline):
#  - "core": 1-block core conv + two tiny cross-block correction convs
#    (~1/3 executed FLOPs on paper) -> 78.5 ms: the narrow corrections and
#    their pads schedule as separate low-utilization ops and break fusions.
#  - "shift2": re-pack the input one pixel late so the window fits a 2-block
#    kernel (2p/3 x nominal, still one dense conv) -> 61.4 ms: the per-conv
#    re-pack copy + the width-2 kernel's worse emitter schedule eat the win.
# Executed-FLOP reduction does not pay on this emitter; dense3 stands.
PACKED_CONV_MODE = "dense3"


def _core_kernel_wp(w, p):
    """In-block part of the width-packed conv kernel: (kh, 1, p*Ci, p*Co)
    holding every tap whose input pixel stays inside the output's block
    (``t = oj + kx - 1`` with ``0 <= t < p``)."""
    kh, kw, ci, co = w.shape
    wp = jnp.zeros((kh, 1, p, ci, p, co), w.dtype)
    for oj in range(p):
        for kx in range(kw):
            t = oj + kx - 1
            if 0 <= t < p:
                wp = wp.at[:, 0, t, :, oj, :].set(w[:, kx])
    return wp.reshape(kh, 1, p * ci, p * co)


def _conv_packed_core(x, kernel, p):
    """Width-packed 3x3 conv as core + boundary corrections (exact).

    x: (B, H, W/p, p*Ci) packed; kernel: (kh, 3, Ci, Co). The core conv
    covers all taps that stay inside each output block; the two remaining
    taps — output position 0 reading the last pixel of the previous block
    (kx=0) and position p-1 reading the first pixel of the next block (kx=2)
    — are Ci->Co convs over one channel slice with a one-block shift,
    2/(3p) of the nominal FLOPs each.
    """
    kh, kw, ci, co = kernel.shape
    dn = ("NHWC", "HWIO", "NHWC")
    hpad = (kh // 2, kh // 2)
    y = jax.lax.conv_general_dilated(
        x, _core_kernel_wp(kernel, p), (1, 1), [hpad, (0, 0)],
        dimension_numbers=dn, preferred_element_type=x.dtype,
    )
    wb = x.shape[2]
    # left: oj=0, kx=0 <- previous block's last pixel (dj = p-1)
    yl = jax.lax.conv_general_dilated(
        x[..., (p - 1) * ci:], kernel[:, 0:1], (1, 1), [hpad, (1, 0)],
        dimension_numbers=dn, preferred_element_type=x.dtype,
    )[:, :, :wb]
    # right: oj=p-1, kx=2 <- next block's first pixel (dj = 0)
    yr = jax.lax.conv_general_dilated(
        x[..., :ci], kernel[:, 2:3], (1, 1), [hpad, (0, 1)],
        dimension_numbers=dn, preferred_element_type=x.dtype,
    )[:, :, 1:]
    pad = [(0, 0)] * 3
    return (y + jnp.pad(yl, pad + [(0, (p - 1) * co)])
            + jnp.pad(yr, pad + [((p - 1) * co, 0)]))


def _shift_kernel_wp(w, p):
    """Expanded kernel for the SHIFTED width packing: with the input packed
    one pixel late (block j covers pixels [p*j-1 .. p*j+p-2]), the 3-tap
    window of every output block fits TWO input blocks — kernel
    (kh, 2, p*Ci, p*Co), 2p/3 x nominal executed FLOPs instead of the
    aligned 3-block kernel's p x. Mapping: tap kx of output position oj
    reads shifted-input offset t = oj + kx, block t//p, within-block t%p."""
    kh, kw, ci, co = w.shape
    wp = jnp.zeros((kh, 2, p, ci, p, co), w.dtype)
    for oj in range(p):
        for kx in range(kw):
            bj, dj = divmod(oj + kx, p)
            wp = wp.at[:, bj, dj, :, oj, :].set(w[:, kx])
    return wp.reshape(kh, 2, p * ci, p * co)


def _conv_packed_shift2(x, kernel, p):
    """Width-packed 3x3 conv via the shifted 2-block kernel (exact).

    x arrives in standard packing; it is re-packed one pixel late (pad 1
    left / p-1 right — one fused copy) so the conv needs only a width-2
    block kernel: a single dense MXU conv at 2p/3 x nominal FLOPs (vs p x
    for the aligned 3-block expansion)."""
    kh = kernel.shape[0]
    b, h, wb, pc = x.shape
    c = pc // p
    xs = jnp.pad(x.reshape(b, h, wb * p, c), ((0, 0), (0, 0), (1, p - 1), (0, 0)))
    xs = xs.reshape(b, h, wb + 1, pc)
    return jax.lax.conv_general_dilated(
        xs, _shift_kernel_wp(kernel, p), (1, 1), [(kh // 2, kh // 2), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), preferred_element_type=x.dtype,
    )


def _conv_packed(x, kernel, p):
    """Conv on a width-packed tensor; dispatches on PACKED_CONV_MODE."""
    if kernel.shape[1] == 3:
        if PACKED_CONV_MODE == "core":
            return _conv_packed_core(x, kernel, p)
        if PACKED_CONV_MODE == "shift2":
            return _conv_packed_shift2(x, kernel, p)
    kh = kernel.shape[0]
    return jax.lax.conv_general_dilated(
        x, _expand_kernel_wp(kernel, p), (1, 1), [(kh // 2, kh // 2), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), preferred_element_type=x.dtype,
    )


def _pack_factor(c_out):
    """Pixels-per-block for width packing: fill the 128 MXU output lanes.

    Restricted to powers of two: the packed pooling helpers
    (``_pool2_w_packed`` / ``_pool2x2_packed``) split the p pixel slices into
    even/odd pairs, which assumes 2 | p. An odd factor (e.g. p=3 for
    33 <= c_out <= 42) would silently drop channels there, so round down to
    the largest power of two <= 128 // c_out, capped at 4."""
    p = int(np.clip(128 // max(int(c_out), 1), 1, 4))
    return 1 << (p.bit_length() - 1)


def _unpack_w(x, p):
    """(B, H, W/p, p*C) width-packed -> (B, H, W, C)."""
    if p == 1:
        return x
    b, h, wb, pc = x.shape
    return x.reshape(b, h, wb * p, pc // p)


def _repack_w(x, p_from, p_to):
    """Change the width-pack factor; a pure reshape (the packed flat order
    (W/p, p, C) is pixel-major for every p)."""
    if p_from == p_to:
        return x
    b, h, wb, pc = x.shape
    c = pc // p_from
    w = wb * p_from
    return x.reshape(b, h, w // p_to, p_to * c)


def _pool2_w_packed(x, p):
    """Pairwise max over W of a width-packed (B, H, W/p, p*C) tensor without
    unpacking: adjacent pixels live in adjacent channel slices (within a
    block) or in the neighboring block, so the pool is static channel-slice
    maxima — minor-dim work instead of a W-interleave."""
    c = x.shape[-1] // p
    even, odd = x[:, :, 0::2, :], x[:, :, 1::2, :]
    outs = []
    for t in (even, odd):
        for d in range(p // 2):
            outs.append(jnp.maximum(t[..., (2 * d) * c:(2 * d + 1) * c],
                                    t[..., (2 * d + 1) * c:(2 * d + 2) * c]))
    return jnp.concatenate(outs, axis=-1)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _pool2x2_packed(x, p):
    """2x2 max pool (H and W) of a width-packed (B, H, W/p, p*C) tensor.

    The hand-written VJP routes gradients with channel-slice selects and
    block-granularity interleaves (stack+reshape over 256-byte rows); the
    AD-derived pool backward lowers to scatter-add / while chains that cost
    ~4ms/step on the CREMI UNet3d benchmark. Ties route to the first element,
    like torch's max-pool argmax."""
    return _pool2_w_packed(_pool2_axis(x, 1), p)


def _pool2x2_packed_fwd(x, p):
    a, b = x[:, 0::2], x[:, 1::2]
    mh = a >= b
    y1 = jnp.maximum(a, b)
    c = x.shape[-1] // p
    even, odd = y1[:, :, 0::2, :], y1[:, :, 1::2, :]
    outs, mws = [], []
    for t in (even, odd):
        for d in range(p // 2):
            u = t[..., (2 * d) * c:(2 * d + 1) * c]
            v = t[..., (2 * d + 1) * c:(2 * d + 2) * c]
            mws.append(u >= v)
            outs.append(jnp.maximum(u, v))
    y = jnp.concatenate(outs, axis=-1)
    mw = jnp.concatenate(mws, axis=-1)
    return y, (mh, mw)


def _pool2x2_packed_bwd(p, res, g):
    mh, mw = res
    c = g.shape[-1] // p
    half = p // 2
    # W stage: rebuild the gradient w.r.t. the H-pooled tensor. The u/v
    # gradients are computed as TWO bulk selects over each contiguous
    # half-channel range (instead of 2p c-wide where/concat ops, whose
    # lane-granularity concatenate measured ~2.4 ms/step on the CREMI bench)
    # and interleaved with one stack+reshape at c granularity.
    b, hh, wb2, _ = g.shape
    halves = []
    for bi in range(2):  # even / odd W-blocks
        gh = g[..., bi * half * c:(bi + 1) * half * c]
        mwh = mw[..., bi * half * c:(bi + 1) * half * c]
        gu = jnp.where(mwh, gh, 0)
        gv = gh - gu
        pair = jnp.stack([gu.reshape(b, hh, wb2, half, c),
                          gv.reshape(b, hh, wb2, half, c)], axis=4)
        halves.append(pair.reshape(b, hh, wb2, p * c))
    dy1 = jnp.stack(halves, axis=3).reshape(mh.shape)
    # H stage: row-granularity interleave
    ga = jnp.where(mh, dy1, 0)
    gb = dy1 - ga
    shape = list(mh.shape)
    shape[1] *= 2
    return (jnp.stack([ga, gb], axis=2).reshape(shape),)


_pool2x2_packed.defvjp(_pool2x2_packed_fwd, _pool2x2_packed_bwd)


def _max_pool_2d(x, window, p):
    """Max pool a (possibly width-packed or phase-packed) 4D tensor.
    Returns (pooled, pack)."""
    wh, ww = window
    if _is_phase(p):
        if tuple(window) == (2, 2):
            # the 2x2 window IS the phase block: pool = max over phase groups
            return _pool2x2_phase(x), 1
        x = _d2s_phase(x)
        p = 1
    if p > 1:
        ok = (not (wh & (wh - 1)) and not (ww & (ww - 1))
              and x.shape[1] % wh == 0 and x.shape[2] % ww == 0)
        if ok:
            if (wh, ww) == (2, 2):
                return _pool2x2_packed(x, p), p
            while wh > 1:
                x = _pool2_axis(x, 1)
                wh //= 2
            while ww > 1:
                x = _pool2_w_packed(x, p)
                ww //= 2
            return x, p
        x = _unpack_w(x, p)
    if all(s % w == 0 for s, w in zip(x.shape[1:-1], window)):
        return _max_pool_reshape(x, window), 1
    return nn.max_pool(x, window_shape=tuple(window), strides=tuple(window)), 1


def _use_s2d(x, kernel, padding):
    """Width-packing pays off for 3x3/pad-1 convs with few output channels on
    the full-res U-Net levels (W divisible by the pack factor and large
    enough to matter). Returns the pack factor p (1 = no packing)."""
    p = _pack_factor(kernel.shape[3])
    if (
        W4_PACKING
        and p > 1
        and kernel.shape[:2] == (3, 3)
        and tuple(padding[-2]) == (1, 1) and tuple(padding[-1]) == (1, 1)
        and x.shape[-2] % p == 0
        and x.shape[-3] >= 64 and x.shape[-2] >= 64
    ):
        return p
    return 1


def _conv3d_decomposed(x, kernel, padding):
    """3D conv (stride 1) as kd batched 2D convs.

    XLA's TPU backend tiles 2D convolutions onto the MXU far better than 3D
    ones, and all framework convs are stride 1, so a (kd, kh, kw) conv is
    computed as the sum over kd of 2D convs on the (N*D, H, W, C) batch.
    x: (N, D, H, W, C); kernel: (kd, kh, kw, I, O); padding: [(pd,pd),(ph,ph),(pw,pw)].
    """
    kd = kernel.shape[0]
    n, d, h, w, c = x.shape
    o = kernel.shape[-1]
    pad_d = padding[0][0]
    if pad_d > 0:
        x = jnp.pad(x, ((0, 0), (pad_d, pad_d), (0, 0), (0, 0), (0, 0)))
    d_out = x.shape[1] - (kd - 1)
    out = None
    s2d = _use_s2d(x, kernel[0], padding[1:])
    for i in range(kd):
        xi = x[:, i:i + d_out].reshape(n * d_out, h, w, c)
        if s2d > 1:
            oi = _conv2d_wp(xi, kernel[i], s2d)
        else:
            oi = jax.lax.conv_general_dilated(
                xi, kernel[i], (1, 1), list(padding[1:]),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=xi.dtype,
            )
        out = oi if out is None else out + oi
    return out.reshape(n, d_out, out.shape[1], out.shape[2], o)


@jax.custom_vjp
def _bias_add(y, b):
    """Channel bias add whose VJP computes the bias gradient as a
    ones-vector ``dot_general`` over the flattened spatial axes instead of
    the AD-derived ``reduce_sum`` (which lowered to a serialized VPU loop
    fusion at ~170 GB/s, 5x below HBM peak, ~3.3 ms/step across the CREMI
    UNet's conv bias grads). In-context the end-to-end step measured neutral
    (49.5 ms/it either way — XLA reschedules the freed bandwidth), but the
    dot form is kept: it expresses the f32 accumulation on the MXU and is
    no worse anywhere measured."""
    return y + b


def _bias_add_fwd(y, b):
    return y + b, None


def _bias_add_bwd(res, g):
    del res
    g2 = g.reshape(-1, g.shape[-1])
    ones = jnp.ones((g2.shape[0],), g.dtype)
    db = jax.lax.dot_general(ones, g2, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    # b and y share a dtype (both cast by the caller before the add)
    return g, db.astype(g.dtype)


_bias_add.defvjp(_bias_add_fwd, _bias_add_bwd)


@jax.custom_vjp
def _relu_o(x):
    """ReLU whose VJP residual is the OUTPUT instead of the input:
    ``g * (out > 0)`` equals ``g * (x > 0)`` except at x == 0 where the
    subgradient choice is arbitrary anyway. The AD-derived relu keeps x
    alive for the backward, which makes the conv-epilogue fusions
    materialize two full-size tensors (value + residual)."""
    return jnp.maximum(x, 0)


def _relu_o_fwd(x):
    out = jnp.maximum(x, 0)
    return out, out


def _relu_o_bwd(out, g):
    return (jnp.where(out > 0, g, 0),)


_relu_o.defvjp(_relu_o_fwd, _relu_o_bwd)


class _Conv2dFast(nn.Module):
    """2D conv layer that routes small-channel 3x3 convs through the
    width-packed lowering (see _conv2d_wp). Parameter layout matches
    ``nn.Conv`` ((kh, kw, I, O) kernel + (O,) bias) so checkpoints are
    interchangeable with the nn.Conv version.

    ``x`` may be a tuple of tensors, interpreted as a channel-concatenation
    that is never materialized: the kernel is sliced along its input axis and
    the per-part convolutions are summed (conv is linear in channels, so this
    is exact). Used by the decoder to avoid concat copies."""

    features: int
    kernel_size: Tuple[int, int]
    padding: Any
    pack: int = 1  # >1: expects/produces width-packed (B, H, W/p, p*C) tensors
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, fold=None):
        parts = x if isinstance(x, (tuple, list)) else (x,)
        div = self.pack
        in_features = sum(p.shape[-1] // div for p in parts)
        kernel = self.param(
            "kernel", _torch_conv_kernel_init,
            tuple(self.kernel_size) + (in_features, self.features), jnp.float32,
        )
        bias = self.param("bias",
                          _torch_conv_bias_init(in_features * int(np.prod(self.kernel_size))),
                          (self.features,), jnp.float32)
        y = None
        c0 = 0
        t_total = None
        folds = fold if fold is not None else (None,) * len(parts)
        for p, f in zip(parts, folds):
            cin = p.shape[-1] // div
            k = kernel[..., c0:c0 + cin, :]
            if f is not None:
                mean, scale = f
                tt = jnp.einsum("yxio,i->yxo", k, mean * scale)
                t_total = tt if t_total is None else t_total + tt
                k = k * scale[:, None]
            k = k.astype(self.dtype)
            c0 += cin
            if self.pack > 1:
                yi = _conv_packed(p.astype(self.dtype), k, self.pack)
            elif (pk := _use_s2d(p, k, self.padding)) > 1:
                yi = _conv2d_wp(p.astype(self.dtype), k, pk)
            else:
                yi = jax.lax.conv_general_dilated(
                    p.astype(self.dtype), k, (1, 1), list(self.padding),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=self.dtype,
                )
            y = yi if y is None else y + yi
        b = jnp.tile(bias, self.pack) if self.pack > 1 else bias
        y = _bias_add(y, b.astype(self.dtype))
        if t_total is not None:
            y = _fold_bias_apply(
                y, t_total, _fold_specs_2d(y, self.pack, self.features), self.pack)
        return y


class _Conv3dFast(nn.Module):
    """Conv layer for 3D data using the 2D-decomposed lowering.

    Parameters always have the 3D shape (kd, kh, kw, I, O). Inputs may be 5D
    (N, D, H, W, C) — decomposed over kd — or 4D (N*D, H, W, C) in the 2.5D
    execution mode (kd must be 1 then): the conv runs directly in 2D.
    """

    features: int
    kernel_size: Tuple[int, int, int]
    padding: Any
    pack: int = 1  # 2.5D mode: width-packed (B, H, W/p, p*C) in/out
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, fold=None):
        parts = x if isinstance(x, (tuple, list)) else (x,)
        div = self.pack
        in_features = sum(p.shape[-1] // div for p in parts)
        kernel = self.param(
            "kernel", _torch_conv_kernel_init,
            self.kernel_size + (in_features, self.features), jnp.float32,
        )
        bias = self.param("bias",
                          _torch_conv_bias_init(in_features * int(np.prod(self.kernel_size))),
                          (self.features,), jnp.float32)
        y = None
        c0 = 0
        t_total = None
        fold_z = self.kernel_size[0] == 3  # z is a folded border axis
        folds = fold if fold is not None else (None,) * len(parts)
        for p, f in zip(parts, folds):
            cin = p.shape[-1] // div
            k = kernel[..., c0:c0 + cin, :]
            if f is not None:
                mean, scale = f
                tt = jnp.einsum("zyxio,i->zyxo", k, mean * scale)
                if not fold_z:
                    tt = tt[0]
                t_total = tt if t_total is None else t_total + tt
                k = k * scale[:, None]
            k = k.astype(self.dtype)
            c0 += cin
            if self.pack > 1:
                assert p.ndim == 4 and self.kernel_size[0] == 1
                yi = _conv_packed(p.astype(self.dtype), k[0], self.pack)
            elif p.ndim == 4:
                assert self.kernel_size[0] == 1, "2.5D mode requires depth-1 kernels."
                if (pk := _use_s2d(p, k[0], self.padding[1:])) > 1:
                    yi = _conv2d_wp(p.astype(self.dtype), k[0], pk)
                else:
                    yi = jax.lax.conv_general_dilated(
                        p.astype(self.dtype), k[0], (1, 1), list(self.padding[1:]),
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                        preferred_element_type=self.dtype,
                    )
            else:
                yi = _conv3d_decomposed(p.astype(self.dtype), k, self.padding)
            y = yi if y is None else y + yi
        b = jnp.tile(bias, self.pack) if self.pack > 1 else bias
        y = _bias_add(y, b.astype(self.dtype))
        if t_total is not None:
            if y.ndim == 5:
                specs = (_fold_specs_3d(y) if fold_z
                         else _fold_specs_2d(y, 1, self.features, axis0=2))
            else:
                specs = _fold_specs_2d(y, self.pack, self.features)
            y = _fold_bias_apply(y, t_total, specs, self.pack)
        return y


def _conv_padding(kernel_size, padding, dim):
    ks = _to_tuple(kernel_size, dim)
    pd = _to_tuple(padding, dim)
    return ks, [(p, p) for p in pd]


class ConvBlock(nn.Module):
    """Two [norm -> conv -> ReLU] stages (reference ConvBlock, unet.py:409).

    For 3D data the convs use the 2D-decomposed lowering (see
    ``_conv3d_decomposed``) unless ``fast_conv`` is disabled.
    """

    out_channels: int
    dim: int
    kernel_size: Union[int, Sequence[int]] = 3
    padding: Union[int, Sequence[int]] = 1
    norm: Optional[str] = "InstanceNorm"
    fast_conv: bool = True
    stat_groups: Optional[int] = None  # 2.5D mode: norm-stat groups
    dtype: Any = jnp.float32

    def _packed_ok(self, parts, packs, ks, pad):
        """Whole-block width-packed execution: both convs run in the packed
        (B, H, W/p, p*C) representation and the pack/unpack reshapes happen
        once per block instead of once per conv. Requires 3x3/pad-1 spatial
        kernels, few output channels and an InstanceNorm/no-norm block.
        Returns the pack factor (1 = unpacked execution)."""
        pk = _pack_factor(self.out_channels) if W4_PACKING else 1
        if pk == 1:
            return 1
        if not (self.fast_conv and all(p.ndim == 4 for p in parts)):
            return 1
        if self.norm not in (None, "InstanceNorm"):
            return 1
        if tuple(ks[-2:]) != (3, 3) or tuple(pad[-1]) != (1, 1) or tuple(pad[-2]) != (1, 1):
            return 1
        if self.dim == 3 and ks[0] != 1:
            return 1
        x = parts[0]
        w_unpacked = x.shape[-2] * packs[0]
        if w_unpacked % pk == 0 and x.shape[-3] >= 64 and w_unpacked >= 64:
            return pk
        return 1

    def _phase_ok(self, parts, packs, ks, pad):
        """Shifted-phase execution applies when the W-pack factor would be 4,
        the spatial kernel is 3x3/pad-1 and the norm is per-channel-exact.
        Inputs must either already live in the phase layout (skips, the
        phase-emitting upsampler) or be cheap to pack (the few-channel
        network input) — the phase layout is never produced by relayouting a
        large activation."""
        if not (PHASE_PACKING and W4_PACKING):
            return False
        if not (self.fast_conv and all(p.ndim == 4 for p in parts)):
            return False
        if self.norm not in (None, "InstanceNorm"):
            return False
        if tuple(ks[-2:]) != (3, 3) or tuple(pad[-1]) != (1, 1) or tuple(pad[-2]) != (1, 1):
            return False
        if self.dim == 3 and ks[0] != 1:
            return False
        if _pack_factor(self.out_channels) != 4:
            return False
        for p, q in zip(parts, packs):
            if _is_phase(q):
                continue
            if q != 1:
                return False  # W-packed entry would need a large relayout
            if (p.shape[1] % 2 or p.shape[2] % 2
                    or p.shape[1] < 64 or p.shape[2] < 64 or p.shape[-1] > 8):
                return False
        return True

    def _fold_ok(self, parts):
        """Norm-fold eligibility: parameter-free InstanceNorm with a SINGLE
        statistics group (see NORM_FOLD). Per-group folded weights would be
        needed otherwise, which a shared-weight conv cannot express."""
        if not (NORM_FOLD and self.norm == "InstanceNorm"):
            return False
        g = self.stat_groups if self.stat_groups is not None else parts[0].shape[0]
        return g == 1

    def _phase_call(self, parts, packs, keep_packed):
        """Both convs as phase-transition 2x2 convs: conv0 ALIGNED->SHIFTED,
        conv1 SHIFTED->ALIGNED; 1.78x nominal executed FLOPs (vs dense3's
        4x) with zero shift data movement (the grids alternate)."""
        parts = tuple(p if _is_phase(q) else _s2d_phase(_unpack_w(p, q))
                      for p, q in zip(parts, packs))
        c_out = self.out_channels
        # PHASE_WPAD: pad the shifted grid's W to a multiple of 8 with dead
        # zero columns so it keeps the (8-sublane) tiling of the aligned grid
        e = (-(parts[0].shape[2] + 1)) % 8 if PHASE_WPAD else 0
        fold = self._fold_ok(parts)
        folds0 = None
        if self.norm == "InstanceNorm":
            if fold:
                folds0 = tuple(_fold_stats(p, 4) for p in parts)
            else:
                parts = tuple(_instance_norm_packed(p, 4, stat_groups=self.stat_groups)
                              for p in parts)
        ks, _ = _conv_padding(self.kernel_size, self.padding, self.dim)
        x = _ConvPhase(c_out, to_shifted=True, kernel_size=tuple(ks),
                       dtype=self.dtype, wpad=e, name="conv0")(parts, fold=folds0)
        x = _mask_shifted(x, c_out, e)
        x = _relu_o(x)
        folds1 = None
        if self.norm == "InstanceNorm":
            # exact statistics over the real pixels: zeroed out-of-image
            # slots keep the sums intact, count_scale fixes the divisor
            sh, sw = x.shape[1], x.shape[2]
            cs = (sh * sw) / float((sh - 1) * (sw - 1 - e))
            if fold:
                # folded conv1 consumes the un-normalized x whose dead slots
                # are already zero — the virtual zero padding stays exact
                # without the second _mask_shifted
                folds1 = (_fold_stats(x, 4, count_scale=cs),)
            else:
                x = _instance_norm_packed(x, 4, stat_groups=self.stat_groups,
                                          count_scale=cs)
                x = _mask_shifted(x, c_out, e)
        x = _ConvPhase(c_out, to_shifted=False, kernel_size=tuple(ks),
                       dtype=self.dtype, wpad=e, name="conv1")(x, fold=folds1)
        x = _relu_o(x)
        if keep_packed:
            return x, PHASE
        return _d2s_phase(x)

    @nn.compact
    def __call__(self, x, train: bool = False, in_pack=None, keep_packed: bool = False):
        """``x`` may be a tuple of tensors = a virtual channel concatenation
        (decoder skip connections). Per-channel norms and channel-sliced convs
        make the split exact while never materializing the concat; for
        parameterized norms or the nn.Conv fallback the parts are simply
        concatenated.

        ``in_pack`` gives the width-pack factor of each input part (see
        ``_pack_factor``; None = unpacked; ``PHASE`` = aligned phase layout);
        repacking between W-pack factors is a free reshape. With
        ``keep_packed`` the block returns ``(out, pack)`` and leaves the
        output in its packed representation so pools/skips can consume it
        without a round-trip through (B, H, W, C)."""
        ks, pad = _conv_padding(self.kernel_size, self.padding, self.dim)
        use_fast = self.fast_conv and self.dim == 3
        parts = x if isinstance(x, (tuple, list)) else (x,)
        packs = tuple(in_pack) if in_pack is not None else (1,) * len(parts)
        if self._phase_ok(parts, packs, ks, pad):
            return self._phase_call(parts, packs, keep_packed)
        if any(_is_phase(q) for q in packs):
            # phase entries the phase path cannot take: fall back to spatial
            parts = tuple(_d2s_phase(p) if _is_phase(q) else p
                          for p, q in zip(parts, packs))
            packs = tuple(1 if _is_phase(q) else q for q in packs)
        if len(parts) > 1 and (
            self.norm not in (None, "InstanceNorm") or not self.fast_conv
        ):
            parts = tuple(_unpack_w(p, q) for p, q in zip(parts, packs))
            parts = (jnp.concatenate(parts, axis=-1),)
            packs = (1,)
        pk = self._packed_ok(parts, packs, ks, pad)
        if pk > 1:
            parts = tuple(_repack_w(p, q, pk) for p, q in zip(parts, packs))
        else:
            parts = tuple(_unpack_w(p, q) for p, q in zip(parts, packs))
        # norm-fold eligibility for the non-phase fast paths: each conv axis
        # must be a 3-tap pad-1 (folded border axis) or 1-tap pad-0 axis
        fold = (self._fold_ok(parts)
                and (use_fast or (self.fast_conv and self.dim == 2))
                and all((k3 == 3 and tuple(pp) == (1, 1)) or
                        (k3 == 1 and tuple(pp) == (0, 0))
                        for k3, pp in zip(ks, pad)))
        x = None
        for i in range(2):
            if i == 1:
                parts = (x,)
            if pk > 1:
                folds = None
                if self.norm == "InstanceNorm":
                    if fold:
                        folds = tuple(_fold_stats(p, pk) for p in parts)
                    else:
                        parts = tuple(
                            _instance_norm_packed(p, pk, stat_groups=self.stat_groups)
                            for p in parts
                        )
                conv_cls = _Conv3dFast if self.dim == 3 else _Conv2dFast
                x = conv_cls(self.out_channels, tuple(ks), pad, pack=pk,
                             dtype=self.dtype, name=f"conv{i}")(parts, fold=folds)
                x = _relu_o(x)
                continue
            folds = None
            if self.norm == "InstanceNorm":
                if fold:
                    folds = tuple(_fold_stats(p, 1) for p in parts)
                else:
                    # parameter-free: apply per part (per-channel stats make
                    # the split exact)
                    parts = tuple(
                        _instance_norm(p, stat_groups=self.stat_groups) for p in parts
                    )
            elif self.norm is not None:
                parts = (_NormLayer(self.norm, stat_groups=self.stat_groups,
                                    dtype=self.dtype, name=f"norm{i}")(
                    parts[0], train=train),)
            if use_fast:
                x = _Conv3dFast(self.out_channels, tuple(ks), pad, dtype=self.dtype,
                                name=f"conv{i}")(parts, fold=folds)
            elif self.fast_conv and self.dim == 2:
                x = _Conv2dFast(self.out_channels, tuple(ks), pad, dtype=self.dtype,
                                name=f"conv{i}")(parts, fold=folds)
            else:
                fan_in = parts[0].shape[-1] * int(np.prod(ks))
                x = nn.Conv(self.out_channels, ks, padding=pad, dtype=self.dtype,
                            kernel_init=_torch_conv_kernel_init,
                            bias_init=_torch_conv_bias_init(fan_in),
                            name=f"conv{i}")(parts[0])
            x = _relu_o(x)
        if keep_packed:
            return x, pk
        if pk > 1:
            x = _unpack_w(x, pk)
        return x


ConvBlock2d = partial(ConvBlock, dim=2)
ConvBlock3d = partial(ConvBlock, dim=3)


def _upsample2x_linear_axis(x, axis):
    """Exact 2x linear upsampling along one axis (half-pixel centers, i.e.
    torch interpolate align_corners=False): out[2i] = .75 in[i] + .25 in[i-1],
    out[2i+1] = .75 in[i] + .25 in[i+1], with edge clamping. Pure VPU ops —
    much cheaper than the gather-based jax.image.resize on TPU."""
    z = jnp.repeat(x, 2, axis=axis)
    n = z.shape[axis]

    def shift(arr, offset):
        # edge-clamped roll along `axis`
        pad = [(0, 0)] * arr.ndim
        if offset > 0:
            pad[axis] = (offset, 0)
            sl = [slice(None)] * arr.ndim
            sl[axis] = slice(0, n)
        else:
            pad[axis] = (0, -offset)
            sl = [slice(None)] * arr.ndim
            sl[axis] = slice(-offset, n - offset)
        return jnp.pad(arr, pad, mode="edge")[tuple(sl)]

    prev = shift(z, 1)   # prev[j] = z[j-1]
    nxt = shift(z, -1)   # nxt[j] = z[j+1]
    parity = jnp.arange(n) % 2 == 0
    shape = [1] * z.ndim
    shape[axis] = n
    parity = parity.reshape(shape)
    neighbor = jnp.where(parity, prev, nxt)
    return (0.75 * z + 0.25 * neighbor).astype(x.dtype)


def _downsample2x_transpose_axis(g, axis):
    """Transpose of the 2x-linear upsample along ``axis``:
    gx[i] = 0.75*(g[2i] + g[2i+1]) + 0.25*(g[2i-1] + g[2i+2]) with the
    edge-clamp extras gx[0] += 0.25*g[0] and gx[-1] += 0.25*g[-1]."""
    sl = [slice(None)] * g.ndim

    def take(s):
        sli = list(sl)
        sli[axis] = s
        return g[tuple(sli)]

    ge = take(slice(0, None, 2))   # g[2i]
    go = take(slice(1, None, 2))   # g[2i+1]
    core = 0.75 * (ge + go)

    pad_lead = [(0, 0)] * g.ndim
    pad_lead[axis] = (1, 0)
    pad_trail = [(0, 0)] * g.ndim
    pad_trail[axis] = (0, 1)
    n = ge.shape[axis]
    sli = list(sl)
    sli[axis] = slice(0, n)
    # g[2i-1] = go[i-1] (0 for i=0) + edge extra 0.25*g[0] folded as go[-1]->ge[0]
    prev_go = jnp.pad(go, pad_lead)[tuple(sli)]
    sli2 = list(sl)
    sli2[axis] = slice(1, n + 1)
    # g[2i+2] = ge[i+1] (0 for i=n-1) + edge extra folded below
    next_ge = jnp.pad(ge, pad_trail)[tuple(sli2)]
    out = core + 0.25 * (prev_go + next_ge)

    # edge extras: first even output re-hits x[0]; last odd output re-hits x[-1]
    first = [slice(None)] * g.ndim
    first[axis] = slice(0, 1)
    last = [slice(None)] * g.ndim
    last[axis] = slice(n - 1, n)
    glast = [slice(None)] * g.ndim
    glast[axis] = slice(g.shape[axis] - 1, g.shape[axis])
    pad_first = [(0, 0)] * g.ndim
    pad_first[axis] = (0, n - 1)
    pad_last = [(0, 0)] * g.ndim
    pad_last[axis] = (n - 1, 0)
    out = out + jnp.pad(0.25 * ge[tuple(first)], pad_first) \
              + jnp.pad(0.25 * g[tuple(glast)], pad_last)
    return out.astype(g.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _resize2x_linear(x, factor):
    """2x/1x per-axis linear upsampling of (N, *spatial, C).

    Forward = jax.image.resize (lowers to efficient dot_generals); backward =
    the hand-written transpose above — XLA's AD of resize emits the transposed
    interpolation matmul at ~44 TF/s plus layout transposes (~1 ms/step on the
    CREMI bench), while the transpose is a pure-bandwidth pairwise blend.
    """
    new_spatial = tuple(int(s * f) for s, f in zip(x.shape[1:-1], factor))
    return jax.image.resize(x, (x.shape[0],) + new_spatial + (x.shape[-1],), method="linear")


def _resize2x_fwd(x, factor):
    return _resize2x_linear(x, factor), None


def _resize2x_bwd(factor, _, g):
    for ax, f in enumerate(factor):
        if f == 2:
            g = _downsample2x_transpose_axis(g, ax + 1)
    return (g,)


_resize2x_linear.defvjp(_resize2x_fwd, _resize2x_bwd)


def _upsample(x, factor, mode):
    """Spatial upsampling of (N, *spatial, C) by per-axis integer factors.

    jax.image.resize lowers 2x-linear to per-axis dot_generals that profile
    ~20ms/step faster than the manual repeat+blend formulation
    (_upsample2x_linear_axis) on the CREMI UNet3d step, so it is the default.
    The hand-written backward in _resize2x_linear was also measured SLOWER in
    context (53.4 vs 49.5 ms/step): its strided-slice/pad chains lower worse
    than the AD-derived transposed interpolation matmuls, so AD stays.
    """
    new_spatial = tuple(int(s * f) for s, f in zip(x.shape[1:-1], factor))
    return jax.image.resize(x, (x.shape[0],) + new_spatial + (x.shape[-1],), method=mode)


class Upsampler(nn.Module):
    """Interpolation + 1x1 conv upsampling (reference Upsampler, unet.py:444).

    Factor-2 axes use the exact 2x linear kernel above; other factors fall
    back to jax.image.resize.
    """

    out_channels: int
    scale_factor: Union[int, Sequence[int]]
    dim: int
    mode: str = "linear"
    phase_out: bool = False  # emit the ALIGNED phase layout (2x2 only)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # In the 2.5D mode x may have fewer spatial dims than self.dim; the
        # leading scale factors (which are 1 then) are dropped accordingly.
        factor = _to_tuple(self.scale_factor, self.dim)
        spatial_ndim = x.ndim - 2
        if spatial_ndim < self.dim:
            dropped = factor[: self.dim - spatial_ndim]
            assert all(f == 1 for f in dropped), "2.5D mode requires unit depth scaling."
            factor = factor[self.dim - spatial_ndim:]
        # pointwise conv as a Dense over the channel axis: rep-independent
        # parameters (I, O) and a pure matmul on the MXU. The conv runs BEFORE
        # the interpolation: linear interpolation commutes with the channel
        # mixing (and preserves the constant bias), so the result is identical
        # while the matmul touches prod(factor)-times fewer pixels and the
        # interpolation runs on out_channels instead of in_channels.
        x = nn.Dense(self.out_channels, dtype=self.dtype, name="conv",
                     kernel_init=_torch_conv_kernel_init,
                     bias_init=_torch_conv_bias_init(x.shape[-1]))(x)
        if self.phase_out and tuple(factor) == (2, 2) and self.mode == "linear":
            # identical values to _upsample, emitted without ever
            # materializing the full-resolution spatial layout
            return _upsample2x_to_phase(x)
        x = _upsample(x, factor, self.mode)
        return x


Upsampler2d = partial(Upsampler, dim=2)
Upsampler3d = partial(Upsampler, dim=3)


def _update_conv_kwargs(kernel_size, padding, scale_factor):
    """Anisotropic kernels: 1/0 on axes with scale factor 1 (unet.py:256-272)."""
    sf = scale_factor if isinstance(scale_factor, (list, tuple)) else [scale_factor]
    if isinstance(scale_factor, int) or list(sf).count(sf[0]) == len(sf):
        return kernel_size, padding
    if not (isinstance(kernel_size, int) and isinstance(padding, int)):
        return kernel_size, padding
    ks = tuple(1 if factor == 1 else kernel_size for factor in sf)
    pd = tuple(0 if factor == 1 else padding for factor in sf)
    return ks, pd


class UNetModule(nn.Module):
    """The pure U-Net computation (encoder/base/decoder, channels-last inside).

    Public call signature: x is channel-first (N, C, *spatial); returns
    channel-first output(s). With ``return_side_outputs`` a list is returned
    with the full-resolution output first (reference unet.py:211-226).
    """

    dim: int
    features_encoder: Tuple[int, ...]   # excluding in_channels
    scale_factors: Tuple[Any, ...]      # one entry per level
    in_channels: int
    out_channels: Any                   # int | tuple | None
    return_side_outputs: bool = False
    final_activation: Optional[str] = None
    postprocessing: Optional[str] = None
    norm: Optional[str] = "InstanceNorm"
    kernel_size: Union[int, Sequence[int]] = 3
    padding: Union[int, Sequence[int]] = 1
    anisotropic_kernel: bool = False
    check_shape: bool = True
    gain: int = 2
    dtype: Any = jnp.float32

    def _check_input_shape(self, x):
        spatial_shape = tuple(x.shape)[2:]
        sfs = [_to_tuple(sf, self.dim) for sf in self.scale_factors]
        factor = [int(np.prod([sf[i] for sf in sfs])) for i in range(self.dim)]
        if len(spatial_shape) != len(factor):
            raise ValueError(
                f"Invalid shape for U-Net: dimensions don't agree {len(spatial_shape)} != {len(factor)}"
            )
        if any(sh % fac != 0 for sh, fac in zip(spatial_shape, factor)):
            raise ValueError(f"Invalid shape for U-Net: {spatial_shape} is not divisible by {factor}")

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.check_shape:
            self._check_input_shape(x)

        depth = len(self.scale_factors)
        feats = list(self.features_encoder)
        assert len(feats) == depth
        n_batch = x.shape[0]

        # channel-first -> channels-last
        perm = (0,) + tuple(range(2, x.ndim)) + (1,)
        h = jnp.transpose(x, perm).astype(self.dtype)

        def block_kwargs(level_sf):
            ks, pd = (self.kernel_size, self.padding)
            if self.anisotropic_kernel:
                ks, pd = _update_conv_kwargs(ks, pd, level_sf)
            return dict(kernel_size=ks, padding=pd, norm=self.norm, dtype=self.dtype)

        # --- 2.5D execution mode (3D models only) --------------------------
        # Levels whose conv kernels have depth 1 and whose pooling does not
        # touch the depth axis run with D folded into the batch: the per-op
        # 5D<->4D layout copies XLA otherwise inserts around the decomposed
        # 2D convs dominate HBM traffic at the full-resolution levels.
        use_25d = self.dim == 3 and self.norm in (None, "InstanceNorm")

        def level_is_2d(level_sf):
            if not use_25d:
                return False
            sf = _to_tuple(level_sf, self.dim)
            ks = block_kwargs(level_sf)["kernel_size"]
            ks = _to_tuple(ks, self.dim)
            return sf[0] == 1 and ks[0] == 1

        def to2d(arr):  # (N, D, *rest) -> (N*D, *rest)
            return arr.reshape((arr.shape[0] * arr.shape[1],) + arr.shape[2:])

        def to3d(arr, d):  # (N*D, *rest) -> (N, D, *rest)
            return arr.reshape((arr.shape[0] // d, d) + arr.shape[1:])

        def set_rep(arr, rep2d, want2d, d, pack):
            if want2d and not rep2d:
                return to2d(arr), True, pack
            if not want2d and rep2d:
                return to3d(_unpack_any(arr, pack), d), False, 1
            return arr, rep2d, pack

        def conv_block(name, f, sf, arr, rep2d, in_pack):
            # 4D representations (2D model or 2.5D mode) flow width-packed
            # between blocks, pools and skips; 5D levels stay unpacked
            kw = block_kwargs(sf)
            keep = self.dim == 2 or rep2d
            out = ConvBlock(
                f, dim=self.dim, name=name,
                stat_groups=n_batch if rep2d else None, **kw,
            )(arr, train=train, in_pack=in_pack, keep_packed=keep)
            return out if keep else (out, 1)

        cur_d = x.shape[2] if self.dim == 3 else None
        rep2d = False
        h_pack = 1

        # encoder
        skips = []
        for level, (f, sf) in enumerate(zip(feats, self.scale_factors)):
            want2d = level_is_2d(sf)
            h, rep2d, h_pack = set_rep(h, rep2d, want2d, cur_d, h_pack)
            h, h_pack = conv_block(f"encoder{level}", f, sf, h, rep2d, (h_pack,))
            skips.append((h, rep2d, cur_d, h_pack))
            window = _to_tuple(sf, self.dim)
            pool_window = window[1:] if h.ndim == 4 and self.dim == 3 else window
            if h.ndim == 4:
                h, h_pack = _max_pool_2d(h, pool_window, h_pack)
            elif all(s % w == 0 for s, w in zip(h.shape[1:-1], pool_window)):
                h = _max_pool_reshape(h, pool_window)
            else:
                h = nn.max_pool(h, window_shape=pool_window, strides=pool_window)
            if not rep2d and self.dim == 3:
                cur_d = cur_d // window[0]

        # base
        base_sf = self.scale_factors[-1]
        want2d = level_is_2d(base_sf)
        h, rep2d, h_pack = set_rep(h, rep2d, want2d, cur_d, h_pack)
        h, h_pack = conv_block("base", feats[-1] * self.gain, base_sf, h, rep2d, (h_pack,))

        # decoder (mirror features, upsample + concat-crop + block)
        decoder_feats = feats[::-1]
        decoder_sfs = list(self.scale_factors)[::-1]
        side_outputs = []
        for level, (f, sf, skip_entry) in enumerate(zip(decoder_feats, decoder_sfs, skips[::-1])):
            skip, skip_rep2d, skip_d, skip_pack = skip_entry
            window = _to_tuple(sf, self.dim)
            if skip_rep2d:
                # depth unchanged across this level (sf[0] == 1): upsample in 2D
                h, rep2d, h_pack = set_rep(h, rep2d, True, cur_d, h_pack)
            else:
                h, rep2d, h_pack = set_rep(h, rep2d, False, cur_d, h_pack)
            if h.ndim == 4:
                h = _unpack_any(h, h_pack)
                h_pack = 1
            # emit the upsampled tensor directly in the phase layout when the
            # decoder block at this level runs phase-packed (its skip is
            # phase) — avoids a full-resolution relayout
            up_phase = (h.ndim == 4 and _is_phase(skip_pack)
                        and tuple(window[-2:]) == (2, 2)
                        and all(wf == 1 for wf in window[:-2]))
            h = Upsampler(f, scale_factor=sf, dim=self.dim, mode="linear",
                          phase_out=up_phase, dtype=self.dtype,
                          name=f"sampler{level}")(h, train=train)
            if up_phase:
                h_pack = PHASE
            if not rep2d and self.dim == 3:
                cur_d = cur_d * window[0]

            # center-crop the skip if needed (no-op with SAME padding);
            # compare/crop in the unpacked representation
            def unpacked_spatial(arr, pack):
                sp = list(arr.shape[1:-1])
                if arr.ndim == 4:
                    if _is_phase(pack):
                        sp = [s * 2 for s in sp]
                    else:
                        sp[-1] *= pack
                return sp
            skip_spatial = unpacked_spatial(skip, skip_pack)
            h_spatial = unpacked_spatial(h, h_pack)
            if tuple(skip_spatial) != tuple(h_spatial):
                skip = _unpack_any(skip, skip_pack) if skip.ndim == 4 else skip
                skip_pack = 1
                if h.ndim == 4 and h_pack != 1:
                    h = _unpack_any(h, h_pack)
                    h_pack = 1
                diff = [(ssh - hsh) // 2 for ssh, hsh in zip(skip.shape[1:-1], h.shape[1:-1])]
                crop = (slice(None),) + tuple(
                    slice(dd, dd + hsh) for dd, hsh in zip(diff, h.shape[1:-1])
                ) + (slice(None),)
                skip = skip[crop]
            # virtual concat: ConvBlock slices its kernel across the parts
            # instead of materializing the channel concatenation
            h, h_pack = conv_block(
                f"decoder{level}", f, sf, (h, skip), rep2d, (h_pack, skip_pack))
            side_outputs.append((h, rep2d, cur_d, h_pack))

        activation = get_activation(self.final_activation)
        postprocessing = _get_postprocessing(self.postprocessing)

        def finalize(out_entry, out_channels, conv_name):
            out, out_rep2d, out_d, out_pack = out_entry
            if out.ndim == 4 and _is_phase(out_pack):
                if out_channels is not None:
                    # block-diagonal pointwise conv in the phase layout (same
                    # (I, O) params as nn.Dense), then the cheap tiny-channel
                    # depth-to-space — the big activation never relayouts
                    out = _DensePhase(out_channels, dtype=self.dtype,
                                      name=conv_name)(out)
                out = _d2s_phase(out)
            else:
                if out.ndim == 4:
                    out = _unpack_w(out, out_pack)
                if out_channels is not None:
                    # pointwise conv as Dense: rep-independent (I, O) parameters
                    out = nn.Dense(out_channels, dtype=self.dtype, name=conv_name,
                                   kernel_init=_torch_conv_kernel_init,
                                   bias_init=_torch_conv_bias_init(out.shape[-1]))(out)
            if out_rep2d:
                out = to3d(out, out_d)
            inv_perm = (0, out.ndim - 1) + tuple(range(1, out.ndim - 1))
            out = jnp.transpose(out.astype(jnp.float32), inv_perm)
            if activation is not None:
                out = activation(out)
            if postprocessing is not None:
                out = postprocessing(out)
            return out

        if self.return_side_outputs:
            ocs = self.out_channels
            if isinstance(ocs, int) or ocs is None:
                ocs = [ocs] * depth
            outs = [
                finalize(o, oc, f"out_conv{i}") for i, (o, oc) in enumerate(zip(side_outputs, ocs))
            ]
            return outs[::-1]  # full-resolution output first
        return finalize(side_outputs[-1], self.out_channels, "out_conv")


def _build_unet(dim, in_channels, out_channels, scale_factors, initial_features, gain,
                final_activation, return_side_outputs, anisotropic_kernel, postprocessing,
                check_shape, init_kwargs, factory, dtype=jnp.float32, seed: int = 0,
                **conv_block_kwargs):
    depth = len(scale_factors)
    feats = tuple(initial_features * gain ** i for i in range(depth))
    module = UNetModule(
        dim=dim,
        features_encoder=feats,
        scale_factors=tuple(tuple(sf) if isinstance(sf, (list, tuple)) else sf for sf in scale_factors),
        in_channels=in_channels,
        out_channels=tuple(out_channels) if isinstance(out_channels, (list, tuple)) else out_channels,
        return_side_outputs=return_side_outputs,
        final_activation=final_activation if isinstance(final_activation, str) else None,
        postprocessing=postprocessing if isinstance(postprocessing, str) else None,
        norm=conv_block_kwargs.pop("norm", "InstanceNorm"),
        kernel_size=conv_block_kwargs.pop("kernel_size", 3),
        padding=conv_block_kwargs.pop("padding", 1),
        anisotropic_kernel=anisotropic_kernel,
        check_shape=check_shape,
        gain=gain,
        dtype=dtype,
    )
    # minimal divisible example input for eager init
    sfs = [(sf,) * dim if isinstance(sf, int) else tuple(sf) for sf in scale_factors]
    min_spatial = tuple(int(np.prod([sf[i] for sf in sfs])) for i in range(dim))
    example_shape = (1, in_channels) + min_spatial
    model = Model(
        module,
        init_kwargs=init_kwargs,
        example_input_shape=example_shape,
        in_channels=in_channels,
        out_channels=out_channels,
        seed=seed,
    )
    model.factory = factory
    return model


def UNet2d(
    in_channels: int,
    out_channels: Optional[int],
    depth: int = 4,
    initial_features: int = 32,
    gain: int = 2,
    final_activation: Optional[Union[str, Callable]] = None,
    return_side_outputs: bool = False,
    postprocessing: Optional[str] = None,
    check_shape: bool = True,
    dtype=jnp.float32,
    seed: int = 0,
    **conv_block_kwargs,
) -> Model:
    """2D U-Net (reference model/unet.py:481)."""
    init_kwargs = {
        "in_channels": in_channels, "out_channels": out_channels, "depth": depth,
        "initial_features": initial_features, "gain": gain, "final_activation": final_activation,
        "return_side_outputs": return_side_outputs, "postprocessing": postprocessing,
        "check_shape": check_shape, **conv_block_kwargs,
    }
    return _build_unet(
        2, in_channels, out_channels, [2] * depth, initial_features, gain, final_activation,
        return_side_outputs, False, postprocessing, check_shape, init_kwargs,
        factory="torch_em_tpu.models.unet.UNet2d", dtype=dtype, seed=seed, **conv_block_kwargs,
    )


def AnisotropicUNet(
    in_channels: int,
    out_channels: Optional[int],
    scale_factors: List[List[int]],
    initial_features: int = 32,
    gain: int = 2,
    final_activation: Optional[Union[str, Callable]] = None,
    return_side_outputs: bool = False,
    anisotropic_kernel: bool = False,
    postprocessing: Optional[str] = None,
    check_shape: bool = True,
    dtype=jnp.float32,
    seed: int = 0,
    **conv_block_kwargs,
) -> Model:
    """3D U-Net with per-level (possibly anisotropic) scale factors
    (reference model/unet.py:584)."""
    init_kwargs = {
        "in_channels": in_channels, "out_channels": out_channels, "scale_factors": scale_factors,
        "initial_features": initial_features, "gain": gain, "final_activation": final_activation,
        "return_side_outputs": return_side_outputs, "anisotropic_kernel": anisotropic_kernel,
        "postprocessing": postprocessing, "check_shape": check_shape, **conv_block_kwargs,
    }
    return _build_unet(
        3, in_channels, out_channels, scale_factors, initial_features, gain, final_activation,
        return_side_outputs, anisotropic_kernel, postprocessing, check_shape, init_kwargs,
        factory="torch_em_tpu.models.unet.AnisotropicUNet", dtype=dtype, seed=seed,
        **conv_block_kwargs,
    )


def UNet3d(
    in_channels: int,
    out_channels: Optional[int],
    depth: int = 4,
    initial_features: int = 32,
    gain: int = 2,
    final_activation: Optional[Union[str, Callable]] = None,
    return_side_outputs: bool = False,
    postprocessing: Optional[str] = None,
    check_shape: bool = True,
    dtype=jnp.float32,
    seed: int = 0,
    **conv_block_kwargs,
) -> Model:
    """3D U-Net with isotropic scaling (reference model/unet.py:683)."""
    init_kwargs = {
        "in_channels": in_channels, "out_channels": out_channels, "depth": depth,
        "initial_features": initial_features, "gain": gain, "final_activation": final_activation,
        "return_side_outputs": return_side_outputs, "postprocessing": postprocessing,
        "check_shape": check_shape, **conv_block_kwargs,
    }
    model = _build_unet(
        3, in_channels, out_channels, [2] * depth, initial_features, gain, final_activation,
        return_side_outputs, False, postprocessing, check_shape, init_kwargs,
        factory="torch_em_tpu.models.unet.UNet3d", dtype=dtype, seed=seed, **conv_block_kwargs,
    )
    return model
