"""Spatially-sharded inference with halo exchange — the framework's
"sequence parallelism" (SURVEY.md §5.7).

The reference scales volume size by halo-blocked tiling through a thread pool
(torch_em/util/prediction.py:142). On a TPU mesh the same structure becomes a
``shard_map``: the volume is sharded along one spatial axis, each device
exchanges halo slabs with its mesh neighbors via ``jax.lax.ppermute`` over
ICI, runs the network on its slab + halo, and crops the halo off — one fused
XLA program, no host round-trips.

Production behavior (round 2):
- ``halo=None`` derives the halo from the model's receptive field
  (scale factors + 3x3 double-conv blocks), so the sharded result matches the
  unsharded forward exactly away from the volume border.
- mesh-boundary devices see *reflect*-padded halos, matching the tiled
  inference path's border handling (utils/prediction.py).
- ``halo_sharded_predict_large`` streams outer chunks through the mesh for
  volumes whose sharded slabs would not fit in HBM.

Norm semantics: the exactness guarantee above holds for norm-free models and
per-pixel norms. With spatial norms — InstanceNorm, the UNet default — each
device computes its statistics over its slab + halo, NOT over the full
volume, so the sharded forward deviates from the unsharded one by the
slab-vs-global statistics difference. This is the same semantics as the
blocked ``predict_with_halo`` path (and as the reference's, whose torch
model also only ever sees block + halo, reference prediction.py:142):
``halo_sharded_predict`` with slab-shaped blocks and equal halo is
bit-matched against ``predict_with_halo`` in
tests/test_parallel.py::TestHaloInstanceNorm. The same applies to
``spatial_sharded_train_step``: with InstanceNorm the model trains on
per-shard statistics (as reference training on crops does).
"""

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map as _shard_map_mod  # jax >= 0.6 style

    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

__all__ = ["halo_sharded_predict", "halo_sharded_predict_large", "receptive_field_halo",
           "spatial_sharded_train_step"]


def _axis_scale_factors(model, spatial_axis: int) -> Sequence[int]:
    """Per-level downscale factors of ``spatial_axis`` from the model's
    init_kwargs (AnisotropicUNet per-axis lists; UNet2d/3d scalar 2s)."""
    kwargs = getattr(model, "init_kwargs", {}) or {}
    sf = kwargs.get("scale_factors")
    if sf is not None:
        factors = []
        for level in sf:
            if isinstance(level, (list, tuple)):
                factors.append(int(level[spatial_axis]))
            else:
                factors.append(int(level))
        return factors
    depth = int(kwargs.get("depth", 4))
    return [2] * depth


def receptive_field_halo(model, spatial_axis: int = 0) -> int:
    """One-sided receptive field of the UNet along ``spatial_axis``.

    Each level contributes two 3x3 convs (1 pixel each side) at its stride,
    on both the encoder and the decoder path, plus one coarse-pixel tap per
    decoder linear upsampler (the interpolation reads one neighboring coarse
    pixel), plus the two base convs at the full downscale — the standard
    U-Net receptive-field recursion. The result is rounded up to the total
    downscale factor so that slab+2*halo keeps the divisibility constraint
    satisfiable.
    """
    factors = _axis_scale_factors(model, spatial_axis)
    stride, rf = 1, 0
    for f in factors:
        rf += 4 * stride          # 2 convs encoder + 2 convs decoder
        stride *= max(int(f), 1)
        if int(f) > 1:
            rf += stride          # decoder upsample interpolation tap
    rf += 2 * stride              # base block
    total = stride
    return int(int(np.ceil(rf / total)) * total)


def total_downscale(model, spatial_axis: int = 0) -> int:
    """Product of the model's per-level downscale factors along an axis —
    the divisibility constraint on input extents."""
    return int(np.prod([max(int(f), 1) for f in _axis_scale_factors(model, spatial_axis)]))


def _reflect(slab, halo, from_top):
    """Reflected halo slab from a device's own border region."""
    if from_top:
        return slab[:, 1:halo + 1][:, ::-1]
    return slab[:, -halo - 1:-1][:, ::-1]


def halo_sharded_predict(
    model,
    volume: np.ndarray,
    mesh: Mesh,
    halo: Optional[int] = None,
    axis_name: str = "space",
    variables=None,
) -> np.ndarray:
    """Predict a (C, S0, *rest) volume sharded along S0 across ``mesh[axis_name]``.

    ``halo=None`` derives the halo from the model's receptive field, making
    the sharded prediction exact (interior-identical to the unsharded
    forward). Mesh-boundary devices see reflect-padded halos, matching the
    tiled path's border handling.
    """
    n = mesh.shape[axis_name]
    s0 = volume.shape[1]
    assert s0 % n == 0, f"Spatial axis {s0} must divide the mesh axis {n}."
    if halo is None:
        halo = receptive_field_halo(model, spatial_axis=0)
    assert s0 // n > halo, (
        f"Per-device slab {s0 // n} must exceed the halo {halo} (reflection at the "
        "mesh border sources from the device's own slab); use fewer devices or "
        "halo_sharded_predict_large.")
    variables = model.variables if variables is None else variables
    module = model.module

    def local_fn(vars_, local):
        # local: (C, s0/n, *rest)
        idx = jax.lax.axis_index(axis_name)
        top = local[:, :halo]
        bottom = local[:, -halo:]
        # receive the bottom slab of the previous device and top of the next
        from_prev = jax.lax.ppermute(bottom, axis_name, [(i, i + 1) for i in range(n - 1)])
        from_next = jax.lax.ppermute(top, axis_name, [(i + 1, i) for i in range(n - 1)])
        # mesh borders: reflect the device's own data (tiled-path semantics)
        from_prev = jnp.where(idx == 0, _reflect(local, halo, from_top=True), from_prev)
        from_next = jnp.where(idx == n - 1, _reflect(local, halo, from_top=False), from_next)
        extended = jnp.concatenate([from_prev, local, from_next], axis=1)
        pred = module.apply(vars_, extended[None], train=False)
        if isinstance(pred, (list, tuple)):
            pred = pred[0]
        pred = pred[0]
        return pred[:, halo:-halo]

    spec_in = P(None, axis_name, *([None] * (volume.ndim - 2)))
    fn = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), spec_in),
        out_specs=P(None, axis_name, *([None] * (volume.ndim - 2))),
    )
    vol = jax.device_put(jnp.asarray(volume, dtype=jnp.float32), NamedSharding(mesh, spec_in))
    reps = jax.device_put(variables, NamedSharding(mesh, P()))
    return np.asarray(jax.jit(fn)(reps, vol))


def halo_sharded_predict_large(
    model,
    volume: np.ndarray,
    mesh: Mesh,
    chunk: int,
    halo: Optional[int] = None,
    axis_name: str = "space",
    variables=None,
) -> np.ndarray:
    """Sharded prediction of volumes too large for one mesh pass: outer
    chunks of ``chunk`` planes along S0 stream through the mesh, each
    extended by the halo on the host (reflect at the volume border) so chunk
    seams are exact.

    ``chunk`` must be divisible by the mesh size and >= mesh_size * halo.
    """
    n = mesh.shape[axis_name]
    if halo is None:
        halo = receptive_field_halo(model, spatial_axis=0)
    s0 = volume.shape[1]
    assert chunk % n == 0, f"chunk {chunk} must divide the mesh axis {n}"

    out = None
    for a in range(0, s0, chunk):
        b = min(a + chunk, s0)
        # host-side halo extension, reflect-padded at the volume border
        lo, hi = a - halo, b + halo
        pad_lo, pad_hi = max(0, -lo), max(0, hi - s0)
        ext = volume[:, max(0, lo):min(s0, hi)]
        if pad_lo or pad_hi:
            ext = np.pad(ext, [(0, 0), (pad_lo, pad_hi)] + [(0, 0)] * (volume.ndim - 2),
                         mode="reflect")
        # pad the extended chunk so it divides the mesh evenly AND each
        # device's slab keeps the model's downscale divisibility
        quantum = n * total_downscale(model, spatial_axis=0)
        n_ext = ext.shape[1]
        target = int(np.ceil(n_ext / quantum) * quantum)
        tail = target - n_ext
        if tail:
            ext = np.pad(ext, [(0, 0), (0, tail)] + [(0, 0)] * (volume.ndim - 2),
                         mode="reflect")
        pred = halo_sharded_predict(model, ext, mesh, halo=halo,
                                    axis_name=axis_name, variables=variables)
        pred = pred[:, halo:halo + (b - a)]
        if out is None:
            out = np.empty((pred.shape[0], s0) + pred.shape[2:], dtype=pred.dtype)
        out[:, a:b] = pred
    return out


def spatial_sharded_train_step(model, loss_obj, tx, mesh, halo: Optional[int] = None,
                               axis_name: str = "space", batch_axis: Optional[str] = None):
    """Training-time spatial sharding: build a jitted train step whose batch
    is sharded along one *spatial* axis of the input across the mesh, with
    halo exchange before the forward — for 3D volumes whose activations do
    not fit one chip's HBM.

    x, y: (B, C, S0, *rest) with S0 sharded. Each device runs the network on
    its slab + exchanged halo, crops the halo, computes the local loss, and
    the per-shard losses are pmean'd; AD through shard_map all-reduces the
    gradients. Parameters are replicated.

    Loss semantics: losses that implement the shard-decomposition protocol
    (``shard_parts(pred, y) -> pytree`` of sum-decomposable statistics +
    ``loss_from_parts(parts)``, e.g. the Dice family's per-channel
    numerator/denominator sums) are psum'd across shards and the GLOBAL loss
    is formed exactly — gradients match the unsharded step up to halo/border
    effects. Losses without the protocol fall back to the *mean of per-shard
    losses*, which equals the global loss only for mean-decomposable
    objectives (per-pixel means such as BCE/MSE over equal-size shards).

    ``batch_axis`` names a second mesh axis to shard the BATCH dimension over
    (combined DP + spatial sharding, e.g. ``get_mesh((2, 4), ("data",
    "space"))``): halo exchange still runs along ``axis_name`` only, while
    loss statistics / per-shard losses reduce over both axes, so the step is
    the 2D-sharded equivalent of the unsharded one.

    Returns ``(step, shard_batch)``: ``step(variables, opt_state, x, y)`` and
    a helper placing host batches with the right shardings.
    """
    n = mesh.shape[axis_name]
    if halo is None:
        halo = receptive_field_halo(model, spatial_axis=0)
    module = model.module
    reduce_axes = (axis_name,) if batch_axis is None else (axis_name, batch_axis)

    def local_forward(vars_, local):
        # local: (B, C, s, *rest) — exchange halo along the spatial axis (2)
        idx = jax.lax.axis_index(axis_name)
        top = local[:, :, :halo]
        bottom = local[:, :, -halo:]
        from_prev = jax.lax.ppermute(bottom, axis_name, [(i, i + 1) for i in range(n - 1)])
        from_next = jax.lax.ppermute(top, axis_name, [(i + 1, i) for i in range(n - 1)])
        from_prev = jnp.where(idx == 0, local[:, :, 1:halo + 1][:, :, ::-1], from_prev)
        from_next = jnp.where(idx == n - 1, local[:, :, -halo - 1:-1][:, :, ::-1], from_next)
        extended = jnp.concatenate([from_prev, local, from_next], axis=2)
        pred = module.apply(vars_, extended, train=True)
        if isinstance(pred, (list, tuple)):
            pred = pred[0]
        return pred[:, :, halo:-halo]

    spec_x = P(batch_axis, None, axis_name)

    decomposable = hasattr(loss_obj, "shard_parts") and hasattr(loss_obj, "loss_from_parts")

    def sharded_loss(params, x, y):
        def local_fn(p, xl, yl):
            pred = local_forward({"params": p}, xl)
            if decomposable:
                # psum the loss's sufficient statistics -> exact global loss
                parts = loss_obj.shard_parts(pred, yl)
                parts = jax.tree_util.tree_map(
                    lambda t: jax.lax.psum(t, reduce_axes), parts)
                return loss_obj.loss_from_parts(parts)
            local = loss_obj(pred, yl)
            # average the per-shard losses (equal-size shards)
            return jax.lax.pmean(local, reduce_axes)

        # check_vma=False: the pmean makes the loss replicated, but the
        # static varying-mesh-axes analysis cannot see through the custom-VJP
        # ops on the backward path (bias-grad dot_general, norm core) and
        # rejects the transposed map otherwise.
        fn = shard_map(local_fn, mesh=mesh, in_specs=(P(), spec_x, spec_x),
                       out_specs=P(), check_vma=False)
        return fn(params, x, y)

    def train_step(variables, opt_state, x, y):
        loss, grads = jax.value_and_grad(sharded_loss)(variables["params"], x, y)
        updates, opt_state = tx.update(grads, opt_state, variables["params"])
        params = jax.tree_util.tree_map(lambda p, u: p + u, variables["params"], updates)
        return {"params": params}, opt_state, loss

    step = jax.jit(train_step, donate_argnums=(0, 1))

    def shard_batch(x, y):
        sh = NamedSharding(mesh, spec_x)
        return jax.device_put(jnp.asarray(x), sh), jax.device_put(jnp.asarray(y), sh)

    return step, shard_batch
