"""Resume durability: fresh-start guards, approximate resume, tmp reaping.

Closes the round-4 incident class: a run directory's heavyweight resume
state (``ssl_state.npz``, ``ckpt/ckpt_N.npz``) was deleted at a round
boundary (it was gitignored) while the lightweight artifacts (``log.pkl``,
``disc/gen_params.npz``) survived — and the next leg silently restarted
from epoch 0, overwriting ~500 epochs of progress.  The reference's resume
(train_loop_2.py:123-143) had the same hole; its own comments warn about
exactly this corruption window (train_loop_2.py:172-175).

Three defenses, layered:

1. **Fresh-start guard** (`guard_fresh_start`): before training from a
   state at iteration/epoch S in a directory whose ``log.pkl`` proves
   progress P, refuse loudly when P exceeds S beyond the save cadence —
   unless ``--allow_fresh_start`` (or ``$CTGAN_ALLOW_FRESH_START=1``).
2. **Approximate resume** (`resolve_ssl_resume` for the SSL apps;
   ``train_loop``'s ``params_latest.npz`` path for the GAN apps): when the
   full state is gone but the small, git-tracked params + ``log.pkl``
   survive, reconstruct — params restored exactly, epoch/iteration counter
   from the log, optimizer moments re-warmed from zero (an Adam transient
   of ~1/(1-beta2) steps), EMA/ensemble buffers re-accumulated.  Loses
   warmth, never epochs.
3. **Stale tmp reaping** (`reap_stale_tmps`): ``save_checkpoint``'s atomic
   writer cannot unlink its tempfile on SIGKILL; every app reaps
   ``*.npz.tmp`` in its out_dir at startup.
"""

from __future__ import annotations

import glob
import os
import pickle

__all__ = [
    "logged_progress",
    "reap_stale_tmps",
    "guard_fresh_start",
    "resolve_ssl_resume",
]


def _allow_fresh_env() -> bool:
    return os.environ.get("CTGAN_ALLOW_FRESH_START", "").strip().lower() in (
        "1", "true", "yes",
    )


def logged_progress(out_dir: str) -> int:
    """Highest iteration/epoch recorded in ``out_dir/log.pkl`` (0 if none).

    ``log.pkl`` maps metric name -> {iteration: value}; MetricLogger labels
    a flush *after* tick(), so the max key equals the number of completed
    epochs in the SSL apps and the last flushed iteration in train_loop.
    """
    path = os.path.join(out_dir, "log.pkl")
    if not os.path.exists(path):
        return 0
    try:
        with open(path, "rb") as f:
            history = pickle.load(f)
    except Exception:
        return 0
    best = 0
    for series in history.values():
        if series:
            best = max(best, max(series))
    return int(best)


def reap_stale_tmps(out_dir: str) -> list[str]:
    """Delete atomic-writer leftovers (``*.npz.tmp``) in ``out_dir``.

    A SIGKILL mid-save leaks the (possibly large) tempfile; reaping at app
    startup bounds the leak to one file per crash."""
    reaped = []
    for path in glob.glob(os.path.join(out_dir, "*.npz.tmp")):
        try:
            os.unlink(path)
            reaped.append(path)
        except OSError:
            pass
    if reaped:
        print(f"reaped {len(reaped)} stale checkpoint tmp file(s): "
              + ", ".join(reaped))
    return reaped


def guard_fresh_start(
    out_dir: str,
    start_iteration: int,
    *,
    allow_fresh_start: bool = False,
    tolerance: int = 0,
    unit: str = "iteration",
) -> None:
    """Refuse to train from ``start_iteration`` when ``out_dir``'s own log
    proves more progress than that (plus ``tolerance``, the save cadence —
    logs flush more often than checkpoints, so a legitimate resume can lag
    the log by up to one save interval)."""
    if allow_fresh_start or _allow_fresh_env():
        return
    prior = logged_progress(out_dir)
    if prior > start_iteration + tolerance:
        raise SystemExit(
            f"REFUSING to train from {unit} {start_iteration}: "
            f"{out_dir}/log.pkl records progress to {unit} {prior}. "
            f"The resume state this directory once had is gone or stale — "
            f"starting now would silently overwrite {prior - start_iteration} "
            f"{unit}s of work (this exact failure lost ~500 epochs in "
            f"round 4). Restore the checkpoint, point --out_dir elsewhere, "
            f"or pass --allow_fresh_start true (env CTGAN_ALLOW_FRESH_START=1) "
            f"to proceed deliberately."
        )


def resolve_ssl_resume(
    out_dir: str,
    ckpt_path: str,
    *,
    allow_fresh_start: bool = False,
    tolerance: int = 5,
):
    """Pick the best resume source for the SSL apps.

    Returns ``(mode, start_epoch, blob)`` where mode is:

    * ``"exact"``  — ``ssl_state.npz`` is present and current; ``blob`` is
      its loaded contents (full state + ensemble buffers).
    * ``"approx"`` — the full state is missing or stale, but the tracked
      ``disc_params.npz``/``gen_params.npz`` + ``log.pkl`` prove more
      progress; ``blob`` is ``(disc_params_path, gen_params_path)``.
      Caller restores params exactly, re-warms optimizer/EMA/ensembles.
    * ``"fresh"``  — nothing to resume (guarded: raises instead when the
      log shows progress and fresh start wasn't explicitly allowed).
    """
    from .checkpoint import load_checkpoint

    prior = logged_progress(out_dir)
    exact_blob, exact_start = None, -1
    if os.path.exists(ckpt_path):
        try:
            exact_blob = load_checkpoint(ckpt_path)
            exact_start = int(exact_blob["epoch"]) + 1
        except Exception as e:  # truncated/corrupt state file
            print(f"WARNING: unreadable resume state {ckpt_path}: {e}")

    disc_path = os.path.join(out_dir, "disc_params.npz")
    gen_path = os.path.join(out_dir, "gen_params.npz")
    params_ok = os.path.exists(disc_path) and os.path.exists(gen_path)

    if exact_blob is not None and exact_start + tolerance >= prior:
        return "exact", exact_start, exact_blob

    if params_ok and prior > max(exact_start, 0):
        if exact_blob is not None:
            print(
                f"WARNING: {ckpt_path} is STALE (epoch {exact_start} vs "
                f"logged {prior}) — resuming approximately from tracked "
                f"params at epoch {prior} instead."
            )
        return "approx", prior, (disc_path, gen_path)

    if exact_blob is not None:
        # log is missing/behind but the state itself is fine
        return "exact", exact_start, exact_blob

    guard_fresh_start(
        out_dir, 0, allow_fresh_start=allow_fresh_start,
        tolerance=0, unit="epoch",
    )
    return "fresh", 0, None
