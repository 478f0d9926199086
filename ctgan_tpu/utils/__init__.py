"""Utilities: metric logging, image grids, atomic checkpointing, debug
probes, profiling, random search."""

from .checkpoint import latest_checkpoint, load_checkpoint, save_checkpoint
from .compile_cache import enable_compilation_cache
from .debug import assert_finite, check_grads_exist, print_stats, stats
from .experiments import (
    AttributeDict, BestParamSaver, filter_funcs_prefix, load_exp_params,
    load_log, prepare_dir, save_exp_params, short_format,
)
from .images import make_grid, save_images
from .logging import MetricLogger
from .profiler import StepTimer, profile_step
from .random_search import random_search

__all__ = [
    "latest_checkpoint", "load_checkpoint", "save_checkpoint",
    "enable_compilation_cache",
    "assert_finite", "check_grads_exist", "print_stats", "stats",
    "AttributeDict", "BestParamSaver", "filter_funcs_prefix",
    "load_exp_params", "load_log", "prepare_dir", "save_exp_params",
    "short_format",
    "make_grid", "save_images", "MetricLogger", "StepTimer", "profile_step",
    "random_search",
]
