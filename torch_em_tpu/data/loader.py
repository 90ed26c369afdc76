"""Host data loader: prefetching batch assembly for the device.

Replaces the torch DataLoader worker-process machinery (reference trainer hot
loop, SURVEY.md §3.2). Two worker modes:

- ``worker_mode="thread"`` (default): a thread pool assembles batches —
  h5py/zarr chunk reads and most numpy transforms release the GIL.
- ``worker_mode="process"``: a persistent spawn-based process pool, for
  GIL-bound label transforms (PerObjectDistanceTransform, EDT — SURVEY hard
  part #2: heavy per-sample Python must not starve the device). The dataset
  is pickled once per worker (datasets reopen file handles after unpickling,
  matching the reference's pickling contract, segmentation_dataset.py:252).

Both run with bounded prefetch so the host pipeline stays ahead of the
device. Conversion to device arrays (``jax.device_put``) happens in the
trainer so the loader itself stays framework-free.

Also provides ``DistributedIndexSampler``, the per-process data sharding
equivalent of torch's DistributedSampler (reference multi_gpu_training.py:34).
"""

import multiprocessing
import queue
import threading
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor
from typing import Callable, Optional, Sequence

import numpy as np

__all__ = ["DataLoader", "default_collate", "DistributedIndexSampler"]

# per-worker-process dataset/collate state (set by _process_worker_init)
_WORKER_STATE: dict = {}


def _process_worker_init(dataset, collate_fn):
    _WORKER_STATE["dataset"] = dataset
    _WORKER_STATE["collate"] = collate_fn


def _process_load_batch(batch_indices):
    ds = _WORKER_STATE["dataset"]
    return _WORKER_STATE["collate"]([ds[int(i)] for i in batch_indices])


def default_collate(samples):
    """Stack per-sample numpy arrays (or tuples of arrays) into batches."""
    first = samples[0]
    if isinstance(first, (tuple, list)):
        return tuple(np.stack([np.asarray(s[i]) for s in samples]) for i in range(len(first)))
    return np.stack([np.asarray(s) for s in samples])


class DistributedIndexSampler:
    """Shards dataset indices across processes (DistributedSampler parity)."""

    def __init__(self, n: int, num_replicas: int, rank: int, shuffle: bool = True, seed: int = 0):
        self.n = n
        self.num_replicas = num_replicas
        self.rank = rank
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0
        self.num_samples = int(np.ceil(n / num_replicas))

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def indices(self) -> np.ndarray:
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            order = rng.permutation(self.n)
        else:
            order = np.arange(self.n)
        # pad so that every replica sees the same number of samples
        total = self.num_samples * self.num_replicas
        if total > self.n:
            order = np.concatenate([order, order[: total - self.n]])
        return order[self.rank: total: self.num_replicas]


class _EpochIterator:
    def __init__(self, loader, indices):
        self.loader = loader
        self.batches = [
            indices[i: i + loader.batch_size] for i in range(0, len(indices), loader.batch_size)
        ]
        if loader.drop_last:
            self.batches = [b for b in self.batches if len(b) == loader.batch_size]
        self._iter = iter(self._run())

    def _load_batch(self, batch_indices):
        ds = self.loader.dataset
        return self.loader.collate_fn([ds[int(i)] for i in batch_indices])

    def _run(self):
        loader = self.loader
        if loader.num_workers <= 0:
            for b in self.batches:
                yield self._load_batch(b)
            return
        if loader.worker_mode == "process":
            yield from self._run_pool(loader._process_pool(), _process_load_batch)
            return
        # bounded look-ahead: keep `prefetch` batches in flight
        with ThreadPoolExecutor(max_workers=loader.num_workers) as pool:
            yield from self._run_pool(pool, self._load_batch)

    def _run_pool(self, pool, load_fn):
        depth = max(self.loader.prefetch_factor, 1) * max(self.loader.num_workers, 1)
        futures = []
        it = iter(self.batches)
        try:
            for _ in range(depth):
                futures.append(pool.submit(load_fn, next(it)))
        except StopIteration:
            pass
        while futures:
            fut = futures.pop(0)
            try:
                futures.append(pool.submit(load_fn, next(it)))
            except StopIteration:
                pass
            yield fut.result()

    def __iter__(self):
        return self._iter

    def __next__(self):
        return next(self._iter)


class DataLoader:
    """Batched, shuffling, prefetching loader over a map-style dataset.

    API mirrors the torch DataLoader subset torch-em relies on:
    ``batch_size``, ``shuffle`` (mutable attribute — the reference factory
    monkey-patches it, segmentation.py:457), ``num_workers``, ``drop_last``,
    ``len()`` = number of batches, iteration yields collated numpy batches.
    """

    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        shuffle: bool = False,
        num_workers: int = 0,
        drop_last: bool = False,
        collate_fn: Optional[Callable] = None,
        prefetch_factor: int = 2,
        seed: Optional[int] = None,
        sampler: Optional[DistributedIndexSampler] = None,
        worker_mode: str = "thread",
        **unused_torch_kwargs,
    ):
        if worker_mode not in ("thread", "process"):
            raise ValueError(f"worker_mode must be 'thread' or 'process', got {worker_mode!r}")
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.drop_last = drop_last
        self.collate_fn = collate_fn or default_collate
        self.prefetch_factor = prefetch_factor
        self.sampler = sampler
        self.worker_mode = worker_mode
        self._pool = None
        self._rng = np.random.default_rng(seed)
        self._epoch = 0

        self.init_kwargs = {
            "batch_size": batch_size, "shuffle": shuffle, "num_workers": num_workers,
            "drop_last": drop_last, "prefetch_factor": prefetch_factor,
            "worker_mode": worker_mode,
        }

    def _process_pool(self):
        """Persistent spawn-based worker pool (created lazily, reused across
        epochs). Spawn — not fork — so each worker unpickles the dataset and
        reopens its file handles.

        Snapshot semantics (mirrors torch's ``persistent_workers`` caveat):
        the dataset and collate_fn are pickled ONCE at pool creation; later
        host-side mutations of either are invisible to the workers. Call
        :meth:`shutdown` (or assign a new loader) after mutating the dataset
        so the next epoch recreates the pool from the new state."""
        if self._pool is None:
            ctx = multiprocessing.get_context("spawn")
            self._pool = ProcessPoolExecutor(
                max_workers=self.num_workers, mp_context=ctx,
                initializer=_process_worker_init, initargs=(self.dataset, self.collate_fn),
            )
        return self._pool

    def shutdown(self):
        """Stop the persistent worker pool (process mode)."""
        if self._pool is not None:
            self._pool.shutdown(wait=False, cancel_futures=True)
            self._pool = None

    def __del__(self):
        try:
            self.shutdown()
        except Exception:
            pass

    def set_epoch(self, epoch: int):
        self._epoch = epoch
        if self.sampler is not None:
            self.sampler.set_epoch(epoch)

    def _indices(self):
        if self.sampler is not None:
            return self.sampler.indices()
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            idx = self._rng.permutation(idx)
        return idx

    def __len__(self):
        if self.sampler is not None:
            n = self.sampler.num_samples
        else:
            n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return int(np.ceil(n / self.batch_size))

    def __iter__(self):
        return iter(_EpochIterator(self, self._indices()))
