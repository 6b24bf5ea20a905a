"""Device-mesh construction and sharding helpers.

TPU-native replacement for the reference's Lightning ``DDPStrategy``/NCCL
data parallelism (``/root/reference/src/scripts/train/mixermdm.py:25,333``):
a 1-D ``jax.sharding.Mesh`` over the ``data`` axis, params replicated,
batches sharded — XLA SPMD inserts the gradient ``psum`` over ICI where DDP
would all-reduce over NCCL.  Multi-host extends the same mesh over DCN via
``jax.distributed.initialize`` (no code changes in the train step).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def shard_batch(batch: dict, mesh: Mesh, axis: str = "data") -> dict:
    """Place every leaf with a leading batch dim on the data axis."""
    sh = data_sharded(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, replicated(mesh)), tree)
