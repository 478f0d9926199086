"""Optimizer update rules vs NumPy reimplementations."""

import jax.numpy as jnp
import numpy as np

from ctgan_tpu.train import optim


def _steps(opt, p0, g, n):
    p = {"w": jnp.asarray(p0)}
    s = opt.init(p)
    for _ in range(n):
        p, s = opt.update({"w": jnp.asarray(g)}, s, p, 0)
    return np.asarray(p["w"])


def test_rmsprop_matches_numpy():
    lr, rho, eps = 5e-5, 0.9, 1e-10
    p = np.array([1.0]); ms = np.zeros(1); g = np.array([2.0])
    for _ in range(3):
        ms = rho * ms + (1 - rho) * g**2
        p = p - lr * g / np.sqrt(ms + eps)
    np.testing.assert_allclose(_steps(optim.rmsprop(lr), [1.0], [2.0], 3), p, rtol=1e-5)


def test_adamax_matches_numpy():
    lr, b1, b2, eps = 2e-3, 0.9, 0.999, 1e-8
    p = np.array([1.0]); m = np.zeros(1); u = np.zeros(1); g = np.array([0.5])
    for t in range(1, 4):
        m = b1 * m + (1 - b1) * g
        u = np.maximum(b2 * u, np.abs(g))
        p = p - (lr / (1 - b1**t)) * m / (u + eps)
    np.testing.assert_allclose(_steps(optim.adamax(lr), [1.0], [0.5], 3), p, rtol=1e-5)


def test_nadam_matches_numpy():
    lr, b1, b2, eps = 1e-3, 0.9, 0.999, 1e-8
    p = np.array([1.0]); m = np.zeros(1); v = np.zeros(1); g = np.array([0.3])
    for t in range(1, 4):
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g**2
        m_hat = m / (1 - b1 ** (t + 1))
        g_hat = g / (1 - b1**t)
        v_hat = v / (1 - b2**t)
        p = p - lr * (b1 * m_hat + (1 - b1) * g_hat) / (np.sqrt(v_hat) + eps)
    np.testing.assert_allclose(_steps(optim.nadam(lr), [1.0], [0.3], 3), p, rtol=1e-5)


def test_momentum_and_nesterov():
    lr, mu = 0.1, 0.9
    # plain momentum
    p = np.array([1.0]); mom = np.zeros(1); g = np.array([1.0])
    for _ in range(3):
        mom = mu * mom + g
        p = p - lr * mom
    np.testing.assert_allclose(_steps(optim.momentum(lr, mu), [1.0], [1.0], 3), p, rtol=1e-6)
    # nesterov
    p = np.array([1.0]); mom = np.zeros(1)
    for _ in range(3):
        mom = mu * mom + g
        p = p - lr * (g + mu * mom)
    np.testing.assert_allclose(
        _steps(optim.momentum(lr, mu, nesterov=True), [1.0], [1.0], 3), p, rtol=1e-6
    )


def test_sgd():
    np.testing.assert_allclose(_steps(optim.sgd(0.5), [1.0], [1.0], 2), [0.0], atol=1e-7)


def test_clip_params():
    p = {"w": jnp.asarray([0.5, -0.5, 0.005])}
    c = optim.clip_params_by_value(p, 0.01)
    np.testing.assert_allclose(np.asarray(c["w"]), [0.01, -0.01, 0.005])
