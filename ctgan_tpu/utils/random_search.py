"""Hyperparameter random search (rebuild of
``LSUN_bedrooms/tflib/random_search.py:4-14``): shuffled cartesian product of
config options with n-way sharding for parallel sweeps."""

from __future__ import annotations

import itertools
import random as _random

__all__ = ["random_search"]


def random_search(grid: dict, n_splits: int = 1, split: int = 0, seed: int = 0):
    """grid: name -> list of options.  Returns this split's shuffled configs."""
    names = sorted(grid)
    combos = list(itertools.product(*[grid[n] for n in names]))
    rng = _random.Random(seed)
    rng.shuffle(combos)
    configs = [dict(zip(names, c)) for c in combos]
    return configs[split::n_splits]
