"""Core runtime: functional param store, RNG streams, precision policy."""

from . import rng, store
from .compileopts import tuned_compiler_options
from .precision import compute_dtype, default_tpu_policy, precision_policy
from .rng import fold_seed, has_rng, next_key, rng_context
from .store import (
    alias_params,
    apply_context,
    current_context,
    format_param_table,
    in_init,
    init_context,
    name_scope,
    param,
    param_count,
    params_with_name,
    print_model_settings,
    split_params,
    state,
)

__all__ = [
    "rng", "store", "compute_dtype", "default_tpu_policy", "precision_policy",
    "tuned_compiler_options",
    "fold_seed", "has_rng", "next_key", "rng_context", "alias_params",
    "apply_context", "current_context", "format_param_table", "in_init",
    "init_context", "name_scope", "param", "param_count", "params_with_name",
    "print_model_settings", "split_params", "state",
]
