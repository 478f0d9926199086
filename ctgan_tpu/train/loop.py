"""Generic training loop with checkpoint/resume and scheduled callbacks.

Rebuild of ``LSUN_bedrooms/tflib/train_loop.py`` (v1: param printout,
profiling at a fixed iteration, iter/second-based scheduling) and
``train_loop_2.py`` (v2: checkpoint/resume with data-iterator state, ndjson
logging, gradnorm metric) — on top of the fused jitted step functions.

Differences by design:
* Resume restores ``(state, logger iteration, data-iterator state)`` from one
  atomic checkpoint (utils.checkpoint) — no generator fast-forward replay
  (train_loop_2.py:131-139) and no corrupt-checkpoint window
  (train_loop_2.py:172-175).
* Time-based scheduling (``print_every_secs``/``save_every_secs``) mirrors
  v1's ``*_every_secs`` knobs (train_loop.py:137-204) alongside the
  iteration-based cadence.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.checkpoint import latest_checkpoint, load_checkpoint, save_checkpoint
from ..utils.logging import MetricLogger
from ..utils.profiler import StepTimer, profile_step
from ..utils.watchdog import StepWatchdog

__all__ = ["LoopConfig", "train_loop"]


def _prune_checkpoints(ckpt_dir: str, keep: int, prefix: str = "ckpt") -> None:
    """Delete all but the newest ``keep`` checkpoints (by step number).

    Files whose step does not parse (e.g. a manually kept ``ckpt_best.npz``)
    are left alone; legacy ``.json`` sidecars are pruned with their ``.npz``.
    """

    def step_of(f):
        try:
            return int(f[len(prefix) + 1 : -4])
        except ValueError:
            return None

    cands = [
        f
        for f in os.listdir(ckpt_dir)
        if f.startswith(prefix) and f.endswith(".npz") and step_of(f) is not None
    ]
    for f in sorted(cands, key=step_of)[:-keep]:
        for path in (os.path.join(ckpt_dir, f), os.path.join(ckpt_dir, f) + ".json"):
            try:
                os.unlink(path)
            except OSError:
                pass


@dataclass
class LoopConfig:
    iters: int = 1000
    print_every: int = 100           # flush cadence (CT_gan_cifar.py:233)
    print_first: int = 5             # also flush the first N iters (:233)
    test_every: int | None = None
    save_every: int | None = None
    ckpt_dir: str | None = None
    resume: bool = True
    profile_iter: int | None = None  # Chrome-trace at iter N (train_loop.py:69-83)
    profile_dir: str = "/tmp/ctgan_trace"
    nan_check_every: int | None = 100  # failure detection: halt on non-finite
                                       # metrics (analogue of debug-mode NaN
                                       # checks, SURVEY §5)
    print_every_secs: float | None = None  # v1-style wall-clock cadence
    save_every_secs: float | None = None
    keep_checkpoints: int | None = None    # prune to the newest N (None = all)
    allow_fresh_start: bool = False  # train from scratch in an out_dir whose
                                     # log.pkl shows prior progress (guarded
                                     # otherwise; utils/resume.py)
    jit_step: bool = True            # False when step_fn is already composed
                                     # of jitted substeps (TP-safe unfused
                                     # mode, train.make_unfused_step) — re-
                                     # jitting would fuse them back into one
                                     # miscompiled program


def train_loop(
    state: Any,
    step_fn: Callable,                 # (state, batch..., key) -> (state, metrics)
    next_batch: Callable[[], tuple],   # () -> tuple of step_fn batch args
    key: jax.Array,
    cfg: LoopConfig,
    *,
    logger: MetricLogger | None = None,
    test_fn: Callable[[Any, int], dict] | None = None,
    callback: Callable[[Any, int], None] | None = None,
    data_state: Callable[[], dict] | None = None,
    set_data_state: Callable[[dict], None] | None = None,
) -> Any:
    logger = logger or MetricLogger()
    restore_cls = type(state)
    from ctgan_tpu.core import tuned_compiler_options

    jit_step = (
        jax.jit(step_fn, donate_argnums=0,
                compiler_options=tuned_compiler_options())
        if cfg.jit_step else step_fn
    )

    from ..utils.resume import guard_fresh_start, reap_stale_tmps

    out_dir = logger.out_dir
    if out_dir:
        reap_stale_tmps(out_dir)
    if cfg.ckpt_dir:
        os.makedirs(cfg.ckpt_dir, exist_ok=True)
        reap_stale_tmps(cfg.ckpt_dir)

    start_iter = 0
    if cfg.resume and cfg.ckpt_dir:
        path = latest_checkpoint(cfg.ckpt_dir)
        if path:
            blob = load_checkpoint(path)
            state = restore_cls(**blob["state"])
            start_iter = int(blob["loop"]["iteration"])
            if set_data_state and blob.get("data_state"):
                set_data_state(blob["data_state"])
            print(f"resumed from {path} at iteration {start_iter}")

    # Durable fallback: the full ckpt_N.npz files are big and may not
    # survive a round boundary, but the small params_latest.npz written
    # alongside them into out_dir does (it is git-trackable).  Restore
    # params exactly and the iteration counter from it; optimizer moments
    # re-warm from zero (an Adam transient of ~1/(1-beta2) steps) and the
    # LR schedule continues from the true step (utils/resume.py).
    params_path = os.path.join(out_dir, "params_latest.npz") if out_dir else None
    if (
        cfg.resume and start_iter == 0 and params_path
        and os.path.exists(params_path) and hasattr(state, "_fields")
    ):
        blob = load_checkpoint(params_path)
        it = int(blob["iteration"])
        fields = {
            k: jax.tree.map(jnp.asarray, v)
            for k, v in blob["params"].items()
            if k in state._fields
        }
        state = state._replace(**fields)
        if "step" in state._fields:
            state = state._replace(step=jnp.asarray(it, state.step.dtype))
        start_iter = it
        print(
            f"resumed (approximate) from {params_path} at iteration {it}: "
            f"params exact, optimizer re-warmed"
        )

    if out_dir and cfg.ckpt_dir:
        # logs flush more often than checkpoints, so a legitimate resume can
        # trail the log by up to one save interval
        guard_fresh_start(
            out_dir, start_iter,
            allow_fresh_start=cfg.allow_fresh_start,
            tolerance=cfg.save_every or 1000,
        )

    logger.set_iteration(start_iter)
    timer = StepTimer()
    # Device metrics are buffered as ONE stacked device array per iteration
    # (async dispatch, no sync) and fetched with a single device->host
    # transfer per flush window.  Converting each metric scalar eagerly
    # costs one readback round trip per metric per step — measured 0.25
    # s/iter of pure tunnel latency on v5e (step itself: 0.03s).
    pending: list = []  # (iteration, names, [M] device array)

    def drain() -> None:
        if not pending:
            return
        stacked = np.asarray(jnp.stack([row for _, _, row in pending]))
        for (it, names, _), vals in zip(pending, stacked):
            for name, val in zip(names, vals):
                logger.plot(name, float(val))
        pending.clear()

    # Hang detection: the tunneled runtime can wedge inside a blocking call
    # (device fetch, checkpoint pull) with no Python-visible error.  The
    # watchdog turns that into a clean exit-and-retry; the queue resumes
    # from the last checkpoint.  $CTGAN_STEP_TIMEOUT=0 disables.
    watchdog = StepWatchdog.start_from_env(name="train_loop")
    state_box = [state]
    try:
        _train_iterations(
            state_box, jit_step, next_batch, key, cfg, logger,
            timer, start_iter, pending, drain, watchdog,
            test_fn=test_fn, callback=callback, data_state=data_state,
        )
        state = state_box[0]
    finally:
        watchdog.stop()

    drain()
    # Final flush: without it, up to print_every-1 iterations of metrics
    # buffered since the last cadence flush vanish at every clean exit or
    # budget cut (observed: a 12-iteration run logged only iters 0-4).
    if logger._since_flush:
        logger.set_iteration(logger._iter - 1)  # label = last included iter,
        logger.flush()                          # matching the cadence flushes
    return state


def _train_iterations(
    state_box, jit_step, next_batch, key, cfg, logger, timer, start_iter,
    pending, drain, watchdog, *, test_fn, callback, data_state,
):
    state = state_box[0]
    last_print = time.time()
    last_save = time.time()
    for iteration in range(start_iter, cfg.iters):
        with timer.data():
            batch = next_batch()
        if cfg.profile_iter is not None and iteration == cfg.profile_iter:
            with profile_step(cfg.profile_dir):
                state, metrics = jit_step(state, *batch, key)
                jax.block_until_ready(metrics)
        else:
            state, metrics = jit_step(state, *batch, key)

        names = sorted(metrics)
        pending.append((iteration, names, jnp.stack([metrics[k] for k in names])))
        if cfg.nan_check_every and iteration % cfg.nan_check_every == 0:
            from ..utils.debug import assert_finite

            drain()
            assert_finite(metrics, f"metrics at iteration {iteration}")
        total, data_t = timer.lap()
        logger.plot("time", total)
        logger.plot("data time", data_t)

        if test_fn and cfg.test_every and iteration % cfg.test_every == cfg.test_every - 1:
            for name, val in test_fn(state, iteration).items():
                logger.plot(name, val)

        if callback and cfg.test_every and iteration % cfg.test_every == cfg.test_every - 1:
            callback(state, iteration)

        save_now = bool(
            cfg.save_every and iteration % cfg.save_every == cfg.save_every - 1
        )
        if cfg.save_every_secs and time.time() - last_save >= cfg.save_every_secs:
            save_now = True
        if cfg.ckpt_dir and save_now:
            last_save = time.time()
            blob = {
                "state": state._asdict() if hasattr(state, "_asdict") else state,
                "loop": {"iteration": iteration + 1},
                "data_state": data_state() if data_state else None,
            }
            save_checkpoint(os.path.join(cfg.ckpt_dir, f"ckpt_{iteration + 1}.npz"), blob)
            if cfg.keep_checkpoints:
                _prune_checkpoints(cfg.ckpt_dir, cfg.keep_checkpoints)
            # small durable params snapshot in out_dir (git-trackable) — the
            # approximate-resume source when the full ckpt dir is lost
            if logger.out_dir and hasattr(state, "_fields"):
                save_checkpoint(
                    os.path.join(logger.out_dir, "params_latest.npz"),
                    {
                        "params": {
                            k: getattr(state, k)
                            for k in state._fields if k.endswith("_params")
                        },
                        "iteration": iteration + 1,
                    },
                )

        print_now = (
            iteration < cfg.print_first
            or iteration % cfg.print_every == cfg.print_every - 1
        )
        if cfg.print_every_secs and time.time() - last_print >= cfg.print_every_secs:
            print_now = True
        if print_now:
            last_print = time.time()
            drain()
            logger.flush()
        logger.tick()
        # The step dispatch above is async; the blocking points a wedged
        # runtime actually hangs at are drain()/checkpoint fetches inside
        # this body — so per-iteration beats stop exactly when one wedges.
        watchdog.beat()
        state_box[0] = state
