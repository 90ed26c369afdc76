"""Spatially-sharded inference with halo exchange — the framework's
"sequence parallelism" (SURVEY.md §5.7).

The reference scales volume size by halo-blocked tiling through a thread pool
(torch_em/util/prediction.py:142). On a TPU mesh the same structure becomes a
``shard_map``: the volume is sharded along one spatial axis, each device
exchanges halo slabs with its mesh neighbors via ``jax.lax.ppermute`` over
ICI, runs the network on its slab + halo, and crops the halo off — one fused
XLA program, no host round-trips.
"""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map as _shard_map_mod  # jax >= 0.6 style

    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

__all__ = ["halo_sharded_predict"]


def halo_sharded_predict(
    model,
    volume: np.ndarray,
    mesh: Mesh,
    halo: int = 16,
    axis_name: str = "space",
    variables=None,
) -> np.ndarray:
    """Predict a (C, S0, *rest) volume sharded along S0 across ``mesh[axis_name]``.

    The slab size per device plus 2*halo must satisfy the model's divisibility
    constraint. Mesh-boundary devices see zero-padded halos (matching the
    zero-context behavior of block borders in the reference's tiled path).
    """
    n = mesh.shape[axis_name]
    c, s0 = volume.shape[0], volume.shape[1]
    assert s0 % n == 0, f"Spatial axis {s0} must divide the mesh axis {n}."
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
        from_prev = jnp.where(idx == 0, jnp.zeros_like(from_prev), from_prev)
        from_next = jnp.where(idx == n - 1, jnp.zeros_like(from_next), from_next)
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
