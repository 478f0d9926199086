"""Mesh construction, sharding rules, and manual-SPMD (shard_map) training."""

from .mesh import (
    DEFAULT_RULES,
    data_sharding,
    effective_param_specs,
    make_mesh,
    param_spec,
    replicated,
    shard_batch,
    shard_params,
)
from .spmd import SpmdHooks, fetch_full_params, make_spmd_trainer

__all__ = [
    "DEFAULT_RULES", "data_sharding", "effective_param_specs", "make_mesh",
    "param_spec", "replicated", "shard_batch", "shard_params",
    "SpmdHooks", "fetch_full_params", "make_spmd_trainer",
]
