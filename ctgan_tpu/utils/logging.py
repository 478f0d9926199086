"""Metric logging (rebuild of ``tflib/plot.py`` and the ndjson log of
``train_loop_2.py:169-194``).

``MetricLogger`` keeps the reference's exact usage pattern — ``plot(name,
value)`` buffered per iteration, ``tick()`` to advance, ``flush()`` to emit —
and extends it with structured ndjson output and optional per-metric curve
images (matplotlib Agg, like tflib/plot.py:29-37).
"""

from __future__ import annotations

import collections
import json
import os
import pickle
import time

import numpy as np

__all__ = ["MetricLogger"]


class MetricLogger:
    def __init__(
        self,
        out_dir: str | None = None,
        *,
        save_curves: bool = False,
        print_std: bool = False,
    ):
        self.out_dir = out_dir
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
        self.save_curves = save_curves
        self.print_std = print_std  # LSUN fork prints ±std (plot.py:26-33)
        self._iter = 0
        self._since_flush: dict[str, list] = collections.defaultdict(list)
        self._history: dict[str, dict[int, float]] = collections.defaultdict(dict)
        # Resume-safety: log.pkl is rewritten from _history on every flush,
        # so a resumed run that starts with an empty history would erase the
        # pre-resume curve (this bit the round-2 flagship evidence — its
        # pre-15k IS points survived only in log.ndjson).  Reload any
        # existing pickle; a fresh run in a reused dir overwrites entries
        # at the same iteration numbers naturally.
        if out_dir:
            pkl = os.path.join(out_dir, "log.pkl")
            if os.path.exists(pkl):
                try:
                    with open(pkl, "rb") as f:
                        for name, series in pickle.load(f).items():
                            self._history[name].update(series)
                except Exception:
                    pass  # unreadable/corrupt old pickle: start clean
            self._backfill_ndjson()

    def _backfill_ndjson(self) -> None:
        """Rebuild ``log.ndjson`` from the pickle history when it is missing
        or behind.

        ``log.ndjson`` is the pandas-facing artifact but only ``log.pkl`` is
        git-tracked; a round-boundary clean can delete the ndjson while the
        pickle survives (round-4 TE incident: the ndjson held only the last
        leg's 69 rows while the pickle held the full mixed history).  When the
        pickle proves more iterations than the ndjson records, rewrite the
        ndjson from history — backfilled rows carry ``"backfilled": true``
        and no ``wall_time`` (wall clocks are not reconstructible)."""
        if not self._history:
            return
        hist_max = max(max(s) for s in self._history.values() if s)
        path = os.path.join(self.out_dir, "log.ndjson")
        nd_max = -1
        if os.path.exists(path):
            try:
                with open(path) as f:
                    for line in f:
                        line = line.strip()
                        if line:
                            nd_max = max(nd_max, int(json.loads(line)["iteration"]))
            except Exception:
                nd_max = -1  # corrupt ndjson: rebuild it
        if nd_max >= hist_max:
            return
        iters = sorted({i for s in self._history.values() for i in s})
        with open(path, "w") as f:
            for it in iters:
                row: dict = {"iteration": it, "backfilled": True}
                for name, series in sorted(self._history.items()):
                    if it in series:
                        row[name] = series[it]
                f.write(json.dumps(row) + "\n")
        print(f"backfilled {path} from log.pkl ({len(iters)} rows to "
              f"iteration {hist_max}; ndjson had {nd_max})")

    # -- reference API (tflib/plot.py:15-41) ------------------------------
    def plot(self, name: str, value) -> None:
        self._since_flush[name].append(float(np.asarray(value)))

    def tick(self) -> None:
        self._iter += 1

    def set_iteration(self, iteration: int) -> None:
        """Fast-forward the iteration counter on checkpoint resume so log
        lines continue from the true training iteration."""
        self._iter = int(iteration)

    def flush(self) -> dict:
        """Print per-metric means since last flush; append ndjson; optionally
        save curve images and a log pickle.  Returns the flushed record."""
        prints = []
        # "wall_time": the step timer already emits a metric named "time";
        # a colliding key silently destroyed the wall-clock column
        record: dict = {"iteration": self._iter, "wall_time": time.time()}
        for name, vals in sorted(self._since_flush.items()):
            mean = float(np.mean(vals))
            record[name] = mean
            if self.print_std and len(vals) > 1:
                prints.append(f"{name}\t{mean:.5f}±{float(np.std(vals)):.5f}")
            else:
                prints.append(f"{name}\t{mean:.5f}")
            self._history[name][self._iter] = mean
        print(f"iter {self._iter}\t" + "\t".join(prints), flush=True)
        self._since_flush.clear()

        if self.out_dir:
            with open(os.path.join(self.out_dir, "log.ndjson"), "a") as f:
                f.write(json.dumps(record) + "\n")
            # atomic replace: log.pkl is the resume scheme's source of truth
            # (utils/resume.py::logged_progress) AND is snapshotted by the
            # durability committer mid-run — a truncate-then-write here could
            # be banked half-written and read back as "no progress"
            pkl_path = os.path.join(self.out_dir, "log.pkl")
            tmp_path = pkl_path + ".tmp"
            with open(tmp_path, "wb") as f:
                pickle.dump(dict(self._history), f)
            os.replace(tmp_path, pkl_path)
            if self.save_curves:
                self._save_curves()
        return record

    def _save_curves(self) -> None:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        for name, series in self._history.items():
            xs = sorted(series)
            plt.figure(figsize=(6, 4))
            plt.plot(xs, [series[x] for x in xs])
            plt.xlabel("iteration")
            plt.ylabel(name)
            safe = name.replace(" ", "_").replace("/", "_")
            plt.savefig(os.path.join(self.out_dir, f"{safe}.jpg"))
            plt.close()

    @property
    def iteration(self) -> int:
        return self._iter

    def history(self, name: str) -> dict[int, float]:
        return dict(self._history.get(name, {}))
