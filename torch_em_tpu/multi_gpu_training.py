"""API-parity module for the reference's ``torch_em.multi_gpu_training``.

The reference runs single-node DDP over NCCL with one process per GPU
(multi_gpu_training.py:107). The TPU-native implementation lives in
:mod:`torch_em_tpu.parallel`: a single process drives all local devices over
a data mesh, with XLA/GSPMD inserting the gradient all-reduce over ICI; for
multi-host training call ``jax.distributed.initialize()`` first.
"""

from .parallel.data_parallel import DataParallelTrainer, train_multi_device, train_multi_gpu

__all__ = ["train_multi_gpu", "train_multi_device", "DataParallelTrainer"]
