"""Device-mesh helpers.

The reference's only training parallelism is single-node DDP over NCCL
(torch_em/multi_gpu_training.py). The TPU-native equivalent (SURVEY.md §5.8)
is a 1-D data mesh over ICI: parameters replicated, batches sharded on the
'data' axis; with GSPMD the gradient all-reduce is inserted by XLA
automatically. A second 'space' axis backs spatially-sharded (halo-exchange)
inference — the framework's sequence-parallel analog (SURVEY.md §5.7).
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["get_mesh", "replicate", "shard_batch", "P", "NamedSharding", "Mesh"]


def get_mesh(n_devices: Optional[int] = None, axis_names: Sequence[str] = ("data",),
             shape: Optional[Sequence[int]] = None) -> Mesh:
    """Build a device mesh. Defaults to a 1-D data mesh over all local devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names=tuple(axis_names))


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (e.g. params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Shard the leading (batch) axis of each array across the mesh axis."""
    def _shard(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(_shard, batch)
