"""Parallelism layer: mesh construction and sharding rules (a green-field
capability — the reference has no distributed runtime, SURVEY.md §2.3)."""

from ast_tpu.parallel.distributed import (
    assemble_global_array,
    initialize_distributed,
    local_batch_slice,
    process_info,
)
from ast_tpu.parallel.pipeline import (
    pipelined_decoder_forward,
    stack_layer_params,
)
from ast_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    param_sharding,
    replicated,
    shard_tree,
    shard_variables,
)

__all__ = [
    "assemble_global_array", "initialize_distributed", "local_batch_slice",
    "process_info",
    "DATA_AXIS", "MODEL_AXIS", "batch_sharding", "make_mesh",
    "param_sharding", "replicated", "shard_tree", "shard_variables",
    "pipelined_decoder_forward", "stack_layer_params",
]
