"""Experiment-management helpers (rebuild of Theano_classifier/utils.py).

The reference's module is a set of ``blocks``-framework extensions
(Theano_classifier/utils.py:30-165): attribute-style config dicts, numbered
results directories, best-metric parameter snapshots saved after training /
on interrupt, experiment-parameter + training-log persistence to dataframes,
and a compact per-iteration channel printer.  Nothing in the released
scripts imports it (the ``blocks`` dependency was dropped upstream), but a
user migrating from it should find the same capabilities here, re-homed on
this framework's primitives: checkpoints are the atomic ``save_checkpoint``
.npz format, logs are MetricLogger's ndjson, and persistence is
dependency-free (json/ndjson instead of pandas HDF5+blosc).
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Mapping

import numpy as np

from .checkpoint import save_checkpoint

__all__ = [
    "AttributeDict", "prepare_dir", "BestParamSaver", "save_exp_params",
    "load_exp_params", "load_log", "short_format", "filter_funcs_prefix",
]


class AttributeDict(dict):
    """dict with attribute access (Theano_classifier/utils.py:23-27)."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name) from None

    def __setattr__(self, name, value):
        self[name] = value


def prepare_dir(save_to: str, results_dir: str = "results") -> str:
    """Allocate the next numbered experiment directory, race-safely.

    ``results/<save_to>0``, ``results/<save_to>1``, ... — the reference's
    auto-increment loop (utils.py:141-153) with the same semantics; the
    bare ``except`` that also swallowed permission errors is narrowed to
    FileExistsError.
    """
    base = os.path.join(results_dir, save_to)
    i = 0
    while True:
        name = f"{base}{i}"
        try:
            os.makedirs(name)
            return name
        except FileExistsError:
            i += 1


class BestParamSaver:
    """Track a scalar channel and keep the best parameter snapshot
    (utils.py:86-114 ``SaveParams``).

    ``update(value, params)`` after each evaluation; ``save()`` writes the
    best snapshot (or the latest, when constructed without a trigger) as an
    atomic checkpoint.  Call ``save()`` from a ``finally:`` block to match
    the reference's after_training + on_interrupt conditions.
    """

    def __init__(self, save_path: str, *, minimize: bool = True,
                 track: bool = True):
        self.save_path = save_path
        self.minimize = minimize
        self.track = track  # track=False: always save the latest params
        self.best_value: float | None = None
        self._snapshot: Mapping[str, Any] | None = None

    def update(self, value: float | None, params: Mapping[str, Any]) -> bool:
        """Record an evaluation; returns True if this is a new best."""
        if not self.track:
            self._snapshot = {k: np.asarray(v) for k, v in params.items()}
            return False
        if value is None:
            # tracked mode with a skipped evaluation: keep the current BEST
            # snapshot (overwriting it with the latest params would save
            # non-best params labeled as best)
            return False
        value = float(value)
        better = (
            self.best_value is None
            or (value < self.best_value if self.minimize
                else value > self.best_value)
        )
        if better:
            self.best_value = value
            self._snapshot = {k: np.asarray(v) for k, v in params.items()}
        return better

    def save(self) -> str | None:
        if self._snapshot is None:
            return None
        path = os.path.join(self.save_path, "trained_params.npz")
        return save_checkpoint(path, dict(self._snapshot))


def save_exp_params(out_dir: str, params: Mapping[str, Any]) -> str:
    """Persist the experiment configuration (utils.py:117-126), as json."""
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "params.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({k: _jsonable(v) for k, v in params.items()}, f,
                  indent=2, sort_keys=True)
    os.replace(tmp, path)
    return path


def load_exp_params(out_dir: str) -> AttributeDict:
    with open(os.path.join(out_dir, "params.json")) as f:
        return AttributeDict(json.load(f))


def _jsonable(v):
    if isinstance(v, (np.integer, np.floating)):
        return v.item()
    if isinstance(v, np.ndarray):
        return v.tolist()
    return v


def load_log(out_dir: str, filename: str = "log.ndjson") -> dict[str, list]:
    """Load a MetricLogger ndjson log as columns (utils.py:156-159
    ``load_df`` — a dict of lists instead of a DataFrame; rows missing a
    channel contribute NaN so columns stay aligned)."""
    rows = []
    with open(os.path.join(out_dir, filename)) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    keys = sorted({k for r in rows for k in r})
    return {k: [r.get(k, float("nan")) for r in rows] for k in keys}


def short_format(epoch: int, iteration: int,
                 row: Mapping[str, float],
                 to_print: Mapping[str, str | list[str]]) -> str:
    """Compact channel printing (utils.py:42-84 ``ShortPrinting``):
    ``to_print`` maps short display names to a log channel (or list of
    channels); channels absent from ``row`` are skipped silently, exactly
    like the reference's try/except-continue."""
    items = []
    for short, chans in to_print.items():
        if chans is None:
            continue
        if not isinstance(chans, (list, tuple)):
            chans = [chans]
        vals = [row[c] for c in chans if c in row]
        if vals:
            items.append(short + " " + " ".join(f"{v:.3g}" for v in vals))
    return f"e {epoch}, i {iteration}: " + ", ".join(items)


def filter_funcs_prefix(d: Mapping[str, Any],
                        pfx: str = "cmd_") -> dict[str, Any]:
    """Strip a name prefix and keep only matching entries (utils.py:162-165;
    the reference ignores its argument and hardcodes ``cmd_`` — here the
    argument works)."""
    out = {}
    for name, v in d.items():
        i = name.find(pfx)
        if i >= 0:
            out[name[i + len(pfx):]] = v
    return out
