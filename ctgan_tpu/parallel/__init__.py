"""Mesh construction and sharding rules for pjit training."""

from .mesh import (
    DEFAULT_RULES,
    data_sharding,
    make_mesh,
    param_spec,
    replicated,
    shard_batch,
    shard_params,
)

__all__ = [
    "DEFAULT_RULES", "data_sharding", "make_mesh", "param_spec",
    "replicated", "shard_batch", "shard_params",
]
