"""Device-mesh parallelism: the TPU-native replacement for accelerate/DDP."""

from dmhomo_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    host_shard_info,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "host_shard_info",
]
