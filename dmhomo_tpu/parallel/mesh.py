"""Mesh + sharding helpers.

The reference's only parallelism is NCCL data-parallel through HF accelerate
(SURVEY.md 2.11).  The TPU-native equivalent: a `jax.sharding.Mesh` with a
``data`` axis (and an optional ``model`` axis for tensor-sharding attention
heads / wide channels), batches sharded over ``data``, parameters replicated
(or sharded over ``model``), and XLA inserting the gradient all-reduce over
ICI automatically because the loss is a mean over the *global* batch.

No DDP knobs survive the port: no find_unused_parameters, no NCCL timeouts,
no explicit barriers - the collectives are statically scheduled by XLA.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence] = None,
    data: Optional[int] = None,
    model: int = 1,
) -> Mesh:
    """('data', 'model') mesh over the given (default: all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % model == 0, (n, model)
        data = n // model
    assert data * model == n, f"{data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis batch sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device-put a pytree of host arrays with batch-axis sharding."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def stacked_batch_sharding(mesh: Mesh) -> NamedSharding:
    """(K, B, ...) stacks of K batches: shard the batch axis (axis 1) over
    'data', keep the step axis (axis 0) whole - each scan iteration of a
    fused multi-step program sees an ordinarily-sharded batch."""
    return NamedSharding(mesh, P(None, "data"))


def shard_stacked_batch(batch, mesh: Mesh):
    """Device-put a pytree of (K, B, ...) host arrays (see above)."""
    sh = stacked_batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def host_shard_info():
    """(process_index, process_count) - the per-host data slice coordinates."""
    return jax.process_index(), jax.process_count()
