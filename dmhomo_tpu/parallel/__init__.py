"""Device-mesh parallelism: the TPU-native replacement for accelerate/DDP."""

from dmhomo_tpu.parallel.distributed import maybe_initialize_distributed
from dmhomo_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    stacked_batch_sharding,
    shard_stacked_batch,
    host_shard_info,
)
from dmhomo_tpu.parallel.tp import channel_shardings

__all__ = [
    "maybe_initialize_distributed",
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "stacked_batch_sharding",
    "shard_stacked_batch",
    "host_shard_info",
    "channel_shardings",
]
