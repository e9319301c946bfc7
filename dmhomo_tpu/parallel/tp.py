"""Parameter sharding over the mesh's 'model' axis (GSPMD-style).

The reference has no tensor parallelism (its models are 2-38M params), but
the mesh carries a 'model' axis for scaling headroom.  `channel_shardings`
makes that axis real: every weight whose trailing (output-channel) dim
divides the axis size is sharded over it - parameters, Adam moments and the
EMA copy all shrink by the axis size per device, and XLA GSPMD inserts the
all-gathers/reduce-scatters around the matmuls/convs automatically.  This
is weight/optimizer-state sharding (ZeRO-3-flavored, channel-wise); at
DMHomo's scale it exists for memory headroom and as the pattern a wider
UNet would extend to activation sharding.

Used by DGMTrainer(shard_params=True) and exercised by the multi-chip
dryrun on the ('data', 'model') mesh.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def channel_shardings(tree, mesh: Mesh, axis: str = "model", min_channels: int = 2):
    """Per-leaf NamedShardings: shard the last dim over `axis` when it
    divides evenly (and is big enough to be worth it); replicate otherwise.

    Works on any params-shaped pytree - optimizer moments and EMA copies
    pick up the same layout because the rule is purely shape-based.
    """
    size = mesh.shape[axis]

    def rule(x):
        shape = getattr(x, "shape", ())
        if (
            len(shape) >= 1
            and size > 1
            and shape[-1] % size == 0
            and shape[-1] // size >= min_channels
        ):
            return NamedSharding(mesh, P(*([None] * (len(shape) - 1)), axis))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, tree)
