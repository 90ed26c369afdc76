"""Multi-device training and inference over jax device meshes."""

from .data_parallel import DataParallelTrainer, train_multi_gpu, train_multi_device
from .mesh import get_mesh, replicate, shard_batch
from .halo import halo_sharded_predict
from .checkpoint import save_sharded_checkpoint, restore_sharded_checkpoint
