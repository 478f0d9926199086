"""Determinism/resume guarantees across the data and logging stack."""

import json
import os
import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from ctgan_tpu.data import DeviceSampler, EpochIterator
from ctgan_tpu.utils import MetricLogger

_TESTS_DIR = os.path.dirname(os.path.abspath(__file__))

_REPLAY_SNIPPET = """
import sys
sys.path.insert(0, sys.argv[1])
from tiny_ssl import apply_small_cifar, apply_tiny_ssl_models
apply_small_cifar()
apply_tiny_ssl_models()
from ctgan_tpu.apps.ct_cifar_ssl import Config, main
main(cfg=Config(epochs=2, batch_size=50, count=10, temporal_ensembling=True,
                epoch_scan=True, out_dir=sys.argv[2]))
"""


@pytest.mark.slow
def test_ssl_replay_is_bit_identical_across_processes(tmp_path):
    """Two fresh interpreter processes running the same TE config must
    produce bit-identical metric streams and final parameters — the
    process-level determinism the chip showed when the r5 TE leg replayed
    the r4 leg exactly for 122 epochs (VALIDATION.md round 4). Guards the
    whole chain: synthetic data gen, store init order, (seed, epoch) perm
    derivation, per-step key derivation, and the jit epoch-scan program."""
    outs = []
    for name in ("a", "b"):
        out = tmp_path / name
        subprocess.run(
            [sys.executable, "-c", _REPLAY_SNIPPET, _TESTS_DIR, str(out)],
            check=True, timeout=1500,
        )
        outs.append(out)

    a_log, b_log = (
        [json.loads(line) for line in open(out / "log.ndjson")] for out in outs
    )
    assert len(a_log) == len(b_log) == 2
    for ra, rb in zip(a_log, b_log):
        ra.pop("wall_time"), rb.pop("wall_time")
        assert ra == rb  # bit-identical metrics, epoch by epoch

    for fname in ("disc_params.npz", "gen_params.npz"):
        za = np.load(outs[0] / fname)
        zb = np.load(outs[1] / fname)
        assert sorted(za.files) == sorted(zb.files)
        for k in za.files:
            np.testing.assert_array_equal(za[k], zb[k], err_msg=k)


def test_device_sampler_step_determinism():
    """Same step index -> same batch, regardless of call order (the property
    that makes checkpoint-resume exact with in-step sampling)."""
    data = np.arange(128, dtype="float32").reshape(128, 1)
    s = DeviceSampler([data], batch_size=8, critic_iters=2, seed=5)
    b10_first = np.asarray(s.sample(jnp.asarray(10)))
    _ = s.sample(jnp.asarray(3))
    b10_again = np.asarray(s.sample(jnp.asarray(10)))
    np.testing.assert_array_equal(b10_first, b10_again)
    # a second sampler with the same seed agrees
    s2 = DeviceSampler([data], batch_size=8, critic_iters=2, seed=5)
    np.testing.assert_array_equal(np.asarray(s2.sample(jnp.asarray(10))), b10_first)


def test_epoch_iterator_multi_array_alignment():
    x = np.arange(50).reshape(50, 1)
    y = np.arange(50) * 10
    it = EpochIterator([x, y], 10, seed=1)
    for _ in range(10):
        bx, by = next(it)
        np.testing.assert_array_equal(bx.ravel() * 10, by)


def test_metric_logger_std_mode(tmp_path, capsys):
    log = MetricLogger(str(tmp_path), print_std=True)
    log.plot("x", 1.0)
    log.plot("x", 3.0)
    log.flush()
    out = capsys.readouterr().out
    assert "±" in out


def test_metric_logger_curves(tmp_path):
    import os

    log = MetricLogger(str(tmp_path), save_curves=True)
    for i in range(3):
        log.plot("loss curve", float(i))
        log.tick()
        log.flush()
    assert os.path.exists(tmp_path / "loss_curve.jpg")
