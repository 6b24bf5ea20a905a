from .mesh import (
    data_sharded,
    fsdp_shard_params,
    fsdp_spec,
    make_mesh,
    make_mesh_2d,
    replicate,
    replicated,
    shard_batch,
    tp_shard_params,
    tp_spec,
)
from .pipeline import pipeline_context, pipeline_scan, pipeline_scope

__all__ = [
    "data_sharded",
    "fsdp_shard_params",
    "fsdp_spec",
    "make_mesh",
    "make_mesh_2d",
    "pipeline_context",
    "pipeline_scan",
    "pipeline_scope",
    "replicate",
    "replicated",
    "shard_batch",
    "tp_shard_params",
    "tp_spec",
]
