from .mesh import (
    data_sharded,
    make_mesh,
    make_mesh_2d,
    replicate,
    replicated,
    shard_batch,
    tp_shard_params,
    tp_spec,
)

__all__ = [
    "data_sharded",
    "make_mesh",
    "make_mesh_2d",
    "replicate",
    "replicated",
    "shard_batch",
    "tp_shard_params",
    "tp_spec",
]
