"""Train-loop extras: NaN tripwire, time-based scheduling, checkpoints."""

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctgan_tpu.train.loop import LoopConfig, train_loop
from ctgan_tpu.utils import MetricLogger


class ToyState(NamedTuple):
    x: jax.Array
    step: jax.Array


def _toy_step(state, batch, key):
    new_x = state.x + jnp.mean(batch)
    return ToyState(new_x, state.step + 1), {"cost": new_x}


def _nan_step(state, batch, key):
    bad = jnp.where(state.step >= 2, jnp.nan, 1.0)
    return ToyState(state.x, state.step + 1), {"cost": bad}


def _batches():
    return (jnp.ones((4, 2)),)


def test_nan_tripwire_halts():
    state = ToyState(jnp.zeros(()), jnp.zeros((), jnp.int32))
    cfg = LoopConfig(iters=10, print_every=100, nan_check_every=1)
    with pytest.raises(FloatingPointError, match="cost"):
        train_loop(state, _nan_step, _batches, jax.random.PRNGKey(0), cfg)


def test_loop_runs_and_checkpoints(tmp_path):
    state = ToyState(jnp.zeros(()), jnp.zeros((), jnp.int32))
    cfg = LoopConfig(iters=6, print_every=3, save_every=2, ckpt_dir=str(tmp_path))
    out = train_loop(state, _toy_step, _batches, jax.random.PRNGKey(0), cfg,
                     logger=MetricLogger())
    assert int(out.step) == 6
    saved = sorted(os.listdir(tmp_path))
    assert any(f.startswith("ckpt_") and f.endswith(".npz") for f in saved)
    # resume from the checkpoint continues at the right iteration
    cfg2 = LoopConfig(iters=8, print_every=3, save_every=100, ckpt_dir=str(tmp_path))
    out2 = train_loop(state, _toy_step, _batches, jax.random.PRNGKey(0), cfg2)
    assert int(out2.step) == 8


def test_final_partial_window_is_flushed(tmp_path):
    """Metrics buffered since the last cadence flush must be emitted when
    the loop exits (12-iter run with print_every=100 used to log only
    iters 0-4, dropping 5-11)."""
    import json

    state = ToyState(jnp.zeros(()), jnp.zeros((), jnp.int32))
    cfg = LoopConfig(iters=12, print_every=100, print_first=5,
                     nan_check_every=None)
    logger = MetricLogger(out_dir=str(tmp_path))
    train_loop(state, _toy_step, _batches, jax.random.PRNGKey(0), cfg,
               logger=logger)
    rows = [json.loads(l) for l in open(tmp_path / "log.ndjson")]
    assert rows[-1]["iteration"] == 11  # labeled by the last included iter
    # the tail window's mean covers iters 5..11: cost = x after each step
    np.testing.assert_allclose(rows[-1]["cost"], np.mean(np.arange(6, 13)))
    assert not logger._since_flush


def test_time_based_print(tmp_path, capsys):
    state = ToyState(jnp.zeros(()), jnp.zeros((), jnp.int32))
    # print_every huge, but every-0-seconds forces a flush per iteration
    cfg = LoopConfig(iters=3, print_every=10**9, print_first=0,
                     print_every_secs=0.0001, nan_check_every=None)
    train_loop(state, _toy_step, _batches, jax.random.PRNGKey(0), cfg)
    out = capsys.readouterr().out
    assert out.count("cost") >= 2


def test_prune_checkpoints_skips_unparseable_and_sidecars(tmp_path):
    """ADVICE r2: a manually kept ckpt_best.npz must survive pruning, and a
    pruned checkpoint's legacy .json sidecar goes with it."""
    from ctgan_tpu.train.loop import _prune_checkpoints

    d = str(tmp_path)
    for step in (100, 200, 300, 400):
        open(os.path.join(d, f"ckpt_{step}.npz"), "w").close()
    open(os.path.join(d, "ckpt_100.npz.json"), "w").close()
    open(os.path.join(d, "ckpt_best.npz"), "w").close()
    _prune_checkpoints(d, keep=2)
    left = sorted(os.listdir(d))
    assert left == ["ckpt_300.npz", "ckpt_400.npz", "ckpt_best.npz"]


def test_metric_logger_resume_preserves_history(tmp_path):
    """log.pkl is rewritten from in-memory history on every flush, so a
    resumed process must reload the existing pickle or the pre-resume
    curve is erased (this lost the round-2 flagship's pre-15k IS points;
    they survived only in log.ndjson)."""
    import pickle

    from ctgan_tpu.utils import MetricLogger

    d = str(tmp_path)
    lg = MetricLogger(d)
    for i in range(3):
        lg.plot("loss", float(i))
        lg.tick()
        lg.flush()

    # simulate a crash + resume: fresh process, same out_dir
    lg2 = MetricLogger(d)
    lg2.set_iteration(3)
    lg2.plot("loss", 99.0)
    lg2.tick()
    lg2.flush()

    with open(tmp_path / "log.pkl", "rb") as f:
        hist = pickle.load(f)
    assert sorted(hist["loss"]) == [1, 2, 3, 4]  # old iters 1-3 survive
    assert hist["loss"][4] == 99.0
