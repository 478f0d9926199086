"""Determinism/resume guarantees across the data and logging stack."""

import jax.numpy as jnp
import numpy as np

from ctgan_tpu.data import DeviceSampler, EpochIterator
from ctgan_tpu.utils import MetricLogger


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
