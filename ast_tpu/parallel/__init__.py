"""Parallelism layer: mesh construction and sharding rules (a green-field
capability — the reference has no distributed runtime, SURVEY.md §2.3)."""

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
    "DATA_AXIS", "MODEL_AXIS", "batch_sharding", "make_mesh",
    "param_sharding", "replicated", "shard_tree", "shard_variables",
]
