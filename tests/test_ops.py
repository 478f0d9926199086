"""Op library vs. tiny NumPy goldens + init distribution checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctgan_tpu.core import apply_context, init_context, rng_context
from ctgan_tpu.ops import (
    batchnorm,
    cond_batchnorm,
    conv2d,
    deconv2d,
    depth_to_space,
    dropout,
    gaussian_noise,
    global_mean_pool,
    gru,
    layernorm,
    linear,
    log_sum_exp,
    mean_pool,
    minibatch_discrimination,
    mlp,
    rnn,
    upsample_nearest,
    wn_conv2d,
    wn_deconv2d,
    wn_dense,
)
from ctgan_tpu.ops.init import WeightsStdevOverride, linear_initializer


def _np_conv2d_same(x, f, stride=1):
    """Direct NHWC SAME conv in NumPy (golden)."""
    n, h, w, cin = x.shape
    fh, fw, _, cout = f.shape
    oh = -(-h // stride)
    ow = -(-w // stride)
    pad_h = max((oh - 1) * stride + fh - h, 0)
    pad_w = max((ow - 1) * stride + fw - w, 0)
    top, left = pad_h // 2, pad_w // 2
    xp = np.pad(x, ((0, 0), (top, pad_h - top), (left, pad_w - left), (0, 0)))
    out = np.zeros((n, oh, ow, cout), dtype=np.float64)
    for i in range(oh):
        for j in range(ow):
            patch = xp[:, i * stride : i * stride + fh, j * stride : j * stride + fw, :]
            out[:, i, j, :] = np.tensordot(patch, f, axes=([1, 2, 3], [0, 1, 2]))
    return out


def _np_deconv2d(x, f_hwoi, stride=2):
    """NumPy golden for TF-style conv2d_transpose SAME, out = stride * in."""
    n, h, w, cin = x.shape
    fh, fw, cout, _ = f_hwoi.shape
    oh, ow = h * stride, w * stride
    out = np.zeros((n, oh + fh, ow + fw, cout), dtype=np.float64)
    # scatter-add each input pixel times the filter
    pad_h = max((h - 1) * stride + fh - oh, 0)
    pad_w = max((w - 1) * stride + fw - ow, 0)
    top, left = pad_h // 2, pad_w // 2
    for i in range(h):
        for j in range(w):
            contrib = np.einsum("nc,hwoc->nhwo", x[:, i, j, :], f_hwoi)
            out[:, i * stride : i * stride + fh, j * stride : j * stride + fw, :] += contrib
    return out[:, top : top + oh, left : left + ow, :]


def test_linear_matches_numpy():
    x = np.random.default_rng(1).normal(size=(5, 7)).astype("float32")
    with init_context(seed=0) as ctx:
        y = linear("L", 7, 3, jnp.asarray(x))
    w = np.asarray(ctx.params["L.W"])
    b = np.asarray(ctx.params["L.b"])
    np.testing.assert_allclose(np.asarray(y), x @ w + b, rtol=1e-5, atol=1e-5)


def test_linear_3d_input():
    x = np.random.default_rng(1).normal(size=(2, 4, 7)).astype("float32")
    with init_context(seed=0) as ctx:
        y = linear("L", 7, 3, jnp.asarray(x))
    w = np.asarray(ctx.params["L.W"])
    b = np.asarray(ctx.params["L.b"])
    np.testing.assert_allclose(np.asarray(y), x @ w + b, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("scheme,var", [
    ("lecun", 1.0 / 7), ("glorot", 2.0 / 10), ("he", 2.0 / 7), ("glorot_he", 4.0 / 10),
])
def test_init_distributions(scheme, var):
    rng = np.random.default_rng(0)
    w = linear_initializer(rng, 7, 3, scheme)
    lim = np.sqrt(var) * np.sqrt(3)
    assert w.shape == (7, 3)
    assert np.abs(w).max() <= lim + 1e-6
    # many draws: empirical variance close to target
    big = linear_initializer(rng, 1000, 200, scheme) if scheme in ("lecun", "he") else w
    if scheme == "lecun":
        assert np.isclose(big.var(), 1.0 / 1000, rtol=0.1)


def test_orthogonal_init():
    rng = np.random.default_rng(0)
    w = linear_initializer(rng, 64, 64, "orthogonal")
    np.testing.assert_allclose(w.T @ w, np.eye(64), atol=1e-4)


def test_weights_stdev_override():
    rng = np.random.default_rng(0)
    with WeightsStdevOverride(0.02):
        w = linear_initializer(rng, 100, 100, "he")
    assert np.abs(w).max() <= 0.02 * np.sqrt(3) + 1e-7
    assert np.isclose(w.std(), 0.02, rtol=0.1)


def test_conv2d_matches_numpy():
    x = np.random.default_rng(2).normal(size=(2, 8, 8, 3)).astype("float32")
    with init_context(seed=0) as ctx:
        y = conv2d("C", 3, 5, 3, jnp.asarray(x), stride=1, biases=True)
    f = np.asarray(ctx.params["C.Filters"])
    b = np.asarray(ctx.params["C.Biases"])
    gold = _np_conv2d_same(x, f) + b
    np.testing.assert_allclose(np.asarray(y), gold, rtol=1e-4, atol=1e-4)


def test_conv2d_stride2():
    x = np.random.default_rng(2).normal(size=(2, 8, 8, 3)).astype("float32")
    with init_context(seed=0) as ctx:
        y = conv2d("C", 3, 4, 5, jnp.asarray(x), stride=2)
    f = np.asarray(ctx.params["C.Filters"])
    b = np.asarray(ctx.params["C.Biases"])
    gold = _np_conv2d_same(x, f, stride=2) + b
    assert y.shape == (2, 4, 4, 4)
    np.testing.assert_allclose(np.asarray(y), gold, rtol=1e-4, atol=1e-4)


def test_deconv2d_matches_numpy():
    x = np.random.default_rng(3).normal(size=(2, 4, 4, 3)).astype("float32")
    with init_context(seed=0) as ctx:
        y = deconv2d("D", 3, 5, 5, jnp.asarray(x))
    f = np.asarray(ctx.params["D.Filters"])  # HWOI
    b = np.asarray(ctx.params["D.Biases"])
    gold = _np_deconv2d(x, f) + b
    assert y.shape == (2, 8, 8, 5)
    np.testing.assert_allclose(np.asarray(y), gold, rtol=1e-4, atol=1e-4)


def test_conv_masked_a_excludes_center():
    x = np.zeros((1, 5, 5, 2), dtype="float32")
    x[0, 2, 2, :] = 1.0  # only center pixel set
    with init_context(seed=0):
        y = conv2d("C", 2, 2, 3, jnp.asarray(x), mask_type=("a", 1), biases=False)
    # mask 'a' zeroes the center tap -> output at center ignores center input
    assert np.allclose(np.asarray(y)[0, 2, 2, :], 0.0, atol=1e-6)


def test_batchnorm_batch_mode():
    x = np.random.default_rng(4).normal(2.0, 3.0, size=(16, 4, 4, 8)).astype("float32")
    with init_context(seed=0):
        y = np.asarray(batchnorm("BN", jnp.asarray(x)))
    assert np.allclose(y.mean(axis=(0, 1, 2)), 0.0, atol=1e-3)
    assert np.allclose(y.std(axis=(0, 1, 2)), 1.0, atol=1e-2)


def test_batchnorm_moving_mode_uses_state():
    x = np.random.default_rng(4).normal(size=(8, 2, 2, 3)).astype("float32")
    with init_context(seed=0) as ctx:
        batchnorm("BN", jnp.asarray(x), update_stats=True)
    state = ctx.state
    assert float(state["BN.stats_iter"]) == 1.0
    with apply_context(ctx.params, mutable_state=dict(state)):
        y = np.asarray(batchnorm("BN", jnp.asarray(x), mode="moving"))
    mm = np.asarray(state["BN.moving_mean"])
    mv = np.asarray(state["BN.moving_variance"])
    gold = (x - mm) / np.sqrt(mv + 1e-5)
    np.testing.assert_allclose(y, gold, rtol=1e-4, atol=1e-4)


def test_cond_batchnorm_per_label_params():
    x = np.random.default_rng(5).normal(size=(6, 2, 2, 4)).astype("float32")
    labels = jnp.asarray([0, 1, 2, 0, 1, 2])
    with init_context(seed=0) as ctx:
        y = cond_batchnorm("CBN", jnp.asarray(x), labels, n_labels=10)
    assert ctx.params["CBN.offset"].shape == (10, 4)
    assert y.shape == x.shape


def test_layernorm_normalizes_per_example():
    x = np.random.default_rng(6).normal(3.0, 2.0, size=(4, 3, 3, 5)).astype("float32")
    with init_context(seed=0):
        y = np.asarray(layernorm("LN", jnp.asarray(x)))
    flat = y.reshape(4, -1)
    assert np.allclose(flat.mean(axis=1), 0.0, atol=1e-3)
    assert np.allclose(flat.std(axis=1), 1.0, atol=1e-2)


def test_dropout_scaling_and_determinism():
    x = jnp.ones((4, 10000))
    key = jax.random.PRNGKey(7)
    with rng_context({"dropout": key}):
        y = np.asarray(dropout(x, 0.5))
    kept = y > 0
    assert np.isclose(kept.mean(), 0.5, atol=0.02)
    assert np.allclose(y[kept], 2.0)
    # keep_prob=1 is identity
    with rng_context({"dropout": key}):
        np.testing.assert_array_equal(np.asarray(dropout(x, 1.0)), np.asarray(x))


def test_mean_pool_and_upsample():
    x = np.arange(16, dtype="float32").reshape(1, 4, 4, 1)
    y = np.asarray(mean_pool(jnp.asarray(x)))
    assert y.shape == (1, 2, 2, 1)
    assert np.isclose(y[0, 0, 0, 0], (0 + 1 + 4 + 5) / 4)
    up = np.asarray(upsample_nearest(jnp.asarray(y)))
    assert up.shape == (1, 4, 4, 1)
    assert np.allclose(up[0, :2, :2, 0], y[0, 0, 0, 0])


def test_depth_to_space_matches_tf_layout():
    x = np.arange(8, dtype="float32").reshape(1, 1, 1, 8)
    y = np.asarray(depth_to_space(jnp.asarray(x), 2))
    assert y.shape == (1, 2, 2, 2)
    # TF NHWC depth_to_space: output (i,j) picks channels block-row-major
    np.testing.assert_allclose(y[0, 0, 0], [0, 1])
    np.testing.assert_allclose(y[0, 0, 1], [2, 3])
    np.testing.assert_allclose(y[0, 1, 0], [4, 5])
    np.testing.assert_allclose(y[0, 1, 1], [6, 7])


def test_global_mean_pool():
    x = np.random.default_rng(8).normal(size=(3, 4, 4, 6)).astype("float32")
    y = np.asarray(global_mean_pool(jnp.asarray(x)))
    np.testing.assert_allclose(y, x.mean(axis=(1, 2)), rtol=1e-5)


def test_log_sum_exp_stable():
    x = jnp.asarray([[1000.0, 1000.0], [0.0, 0.0]])
    y = np.asarray(log_sum_exp(x))
    np.testing.assert_allclose(y, [1000.0 + np.log(2), np.log(2)], rtol=1e-6)


def test_wn_dense_data_dependent_init():
    x = np.random.default_rng(9).normal(5.0, 4.0, size=(64, 12)).astype("float32")
    with init_context(seed=0) as ctx:
        wn_dense("W1", 12, 8, jnp.asarray(x), nonlinearity=None)
    params = dict(ctx.params)
    with apply_context(params) as actx:
        out = wn_dense("W1", 12, 8, jnp.asarray(x), nonlinearity=None, dd_init=True)
        updates = dict(actx.init_updates)
    # init pass output must be standardized
    o = np.asarray(out)
    assert np.allclose(o.mean(axis=0), 0.0, atol=1e-3)
    assert np.allclose(o.std(axis=0), 1.0, atol=1e-2)
    # applying the recorded updates reproduces the standardized output
    params.update(updates)
    with apply_context(params):
        out2 = wn_dense("W1", 12, 8, jnp.asarray(x), nonlinearity=None)
    np.testing.assert_allclose(np.asarray(out2), o, rtol=1e-3, atol=1e-3)


def test_wn_conv2d_dd_init_roundtrip():
    x = np.random.default_rng(10).normal(1.0, 2.0, size=(16, 6, 6, 3)).astype("float32")
    with init_context(seed=0) as ctx:
        wn_conv2d("WC", 3, 5, 3, jnp.asarray(x), nonlinearity=None)
    params = dict(ctx.params)
    with apply_context(params) as actx:
        out = wn_conv2d("WC", 3, 5, 3, jnp.asarray(x), nonlinearity=None, dd_init=True)
        params.update(actx.init_updates)
    with apply_context(params):
        out2 = wn_conv2d("WC", 3, 5, 3, jnp.asarray(x), nonlinearity=None)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out), rtol=1e-3, atol=1e-3)


def test_wn_deconv2d_shapes():
    x = np.random.default_rng(11).normal(size=(2, 4, 4, 6)).astype("float32")
    with init_context(seed=0):
        y = wn_deconv2d("WD", 6, 3, 5, jnp.asarray(x), nonlinearity=None)
    assert y.shape == (2, 8, 8, 3)


def test_gaussian_noise():
    x = jnp.zeros((4, 1000))
    with rng_context(jax.random.PRNGKey(0)):
        y = np.asarray(gaussian_noise(x, sigma=0.5))
    assert np.isclose(y.std(), 0.5, rtol=0.1)
    assert np.array_equal(np.asarray(gaussian_noise(x, 0.5, deterministic=True)), np.asarray(x))


def test_minibatch_discrimination_shape():
    x = np.random.default_rng(12).normal(size=(8, 16)).astype("float32")
    with init_context(seed=0):
        y = minibatch_discrimination("MB", 16, 10, jnp.asarray(x))
    assert y.shape == (8, 26)


def test_gru_rnn_shapes_and_scan():
    x = np.random.default_rng(13).normal(size=(3, 7, 5)).astype("float32")
    with init_context(seed=0) as ctx:
        h = gru("G", 5, 6, jnp.asarray(x))
        r = rnn("R", 5, 6, jnp.asarray(x))
    assert h.shape == (3, 7, 6)
    assert r.shape == (3, 7, 6)


def test_mlp():
    x = np.random.default_rng(14).normal(size=(4, 10)).astype("float32")
    with init_context(seed=0):
        y = mlp("M", 10, 32, 3, 4, jnp.asarray(x))
    assert y.shape == (4, 3)
