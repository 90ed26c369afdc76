"""Data-parallel training over a device mesh.

Rebuild of torch_em/multi_gpu_training.py:107 (``train_multi_gpu``): the
reference forks one process per GPU and wraps the model in DDP with NCCL
allreduce; here a single process drives all local devices — parameters are
replicated (NamedSharding P()), batches sharded on the 'data' mesh axis, and
the gradient all-reduce is inserted by XLA/GSPMD (the loss reduction over the
sharded batch axis IS the allreduce). Per-host data sharding uses
``DistributedIndexSampler`` (DistributedSampler parity); only process 0
writes checkpoints (rank plumbed through the trainer).

For multi-host (DCN) training call ``jax.distributed.initialize()`` before
building the trainer; the same code then runs with a global mesh.
"""

from typing import Any, Callable, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.loader import DataLoader, DistributedIndexSampler
from ..trainer.default_trainer import DefaultTrainer
from .mesh import get_mesh

__all__ = ["DataParallelTrainer", "train_multi_gpu", "train_multi_device"]


class DataParallelTrainer(DefaultTrainer):
    """DefaultTrainer with parameters replicated and batches sharded over a mesh.

    The jitted train step is unchanged — GSPMD turns the batch-sharded loss
    reduction into cross-device collectives over ICI.
    """

    def __init__(self, *args, mesh: Optional[Mesh] = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.mesh = mesh if mesh is not None else get_mesh()
        self._replicated = NamedSharding(self.mesh, P())
        self._kwargs = getattr(self, "_kwargs", {})

    @property
    def n_devices(self):
        return self.mesh.devices.size

    def _initialize(self, iterations, load_from_checkpoint, epochs=None):
        best_metric = super()._initialize(iterations, load_from_checkpoint, epochs)
        # replicate model + optimizer state across the mesh
        self.variables = jax.device_put(self.variables, self._replicated)
        self.opt_state = jax.device_put(self.opt_state, self._replicated)
        return best_metric

    def _to_device(self, batch):
        batch = np.asarray(batch)
        if batch.shape[0] % self.n_devices != 0:
            # pad the batch so it divides the data axis (losses are means, so
            # repeated samples only reweight slightly on ragged final batches)
            pad = self.n_devices - batch.shape[0] % self.n_devices
            batch = np.concatenate([batch, batch[:pad]], axis=0)
        spec = P("data", *([None] * (batch.ndim - 1)))
        return jax.device_put(batch, NamedSharding(self.mesh, spec))


def train_multi_device(
    model_callable: Callable,
    model_kwargs: Dict[str, Any],
    train_loader_callable: Callable,
    train_loader_kwargs: Dict[str, Any],
    val_loader_callable: Callable,
    val_loader_kwargs: Dict[str, Any],
    iterations: int,
    trainer_callable: Optional[Callable] = None,
    mesh: Optional[Mesh] = None,
    **trainer_kwargs,
):
    """Run data-parallel training over all local devices
    (reference train_multi_gpu, multi_gpu_training.py:107).

    Everything is passed as callable + kwargs for API parity with the
    reference (where datasets must be constructed inside each worker
    process); here a single process drives the mesh so the callables are
    simply invoked once.
    """
    from ..segmentation import default_segmentation_trainer

    mesh = mesh if mesh is not None else get_mesh()
    model = model_callable(**model_kwargs)
    train_loader = train_loader_callable(**train_loader_kwargs)
    val_loader = val_loader_callable(**val_loader_kwargs)

    # per-process data sharding across hosts (DistributedSampler parity)
    n_procs = jax.process_count()
    if n_procs > 1:
        train_loader.sampler = DistributedIndexSampler(
            len(train_loader.dataset), num_replicas=n_procs, rank=jax.process_index()
        )

    if trainer_callable is None:
        trainer_callable = default_segmentation_trainer

    trainer = trainer_callable(
        model=model, train_loader=train_loader, val_loader=val_loader,
        trainer_class=lambda **kw: DataParallelTrainer(mesh=mesh, **kw),
        rank=jax.process_index() if n_procs > 1 else None,
        **trainer_kwargs,
    )
    trainer.fit(iterations)
    return trainer


# API-parity alias for the reference name
train_multi_gpu = train_multi_device
