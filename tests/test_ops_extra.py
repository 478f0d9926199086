"""Additional op coverage: conv1d, separable conv, TF-style weightnorm flag,
embedding, KL utils, batchnorm blend mode."""

import jax
import jax.numpy as jnp
import numpy as np

from ctgan_tpu.core import apply_context, init_context
from ctgan_tpu.ops import (
    batchnorm,
    conv1d,
    conv2d,
    deconv2d,
    embedding,
    kl_gaussian_gaussian,
    kl_unit_gaussian,
    linear,
    separable_conv2d,
)


def test_conv1d_matches_numpy():
    x = np.random.default_rng(0).normal(size=(2, 9, 3)).astype("f4")
    with init_context(seed=0) as ctx:
        y = conv1d("C", 3, 4, 3, jnp.asarray(x))
    f = np.asarray(ctx.params["C.Filters"])  # [W, I, O]
    b = np.asarray(ctx.params["C.Biases"])
    xp = np.pad(x, ((0, 0), (1, 1), (0, 0)))
    gold = np.zeros((2, 9, 4))
    for t in range(9):
        patch = xp[:, t : t + 3, :]
        gold[:, t, :] = np.tensordot(patch, f, axes=([1, 2], [0, 1]))
    np.testing.assert_allclose(np.asarray(y), gold + b, rtol=1e-4, atol=1e-4)


def test_conv1d_masked_causal():
    """Mask 'a' must not see the current or future positions."""
    x = np.zeros((1, 7, 1), dtype="f4")
    x[0, 3, 0] = 1.0
    with init_context(seed=0):
        y = conv1d("C", 1, 1, 3, jnp.asarray(x), mask_type=("a", 1), biases=False)
    out = np.asarray(y)[0, :, 0]
    assert out[3] == 0.0  # center masked
    assert np.allclose(out[:3], 0.0)  # nothing before the impulse
    assert out[4] != 0.0  # position after sees it


def test_separable_conv2d_equals_composed():
    x = np.random.default_rng(1).normal(size=(2, 6, 6, 3)).astype("f4")
    with init_context(seed=0) as ctx:
        y = separable_conv2d("S", 3, 5, 3, jnp.asarray(x))
    dw = np.asarray(ctx.params["S.DepthwiseFilters"])  # [3,3,3,1]
    pw = np.asarray(ctx.params["S.PointwiseFilters"])  # [1,1,3,5]
    b = np.asarray(ctx.params["S.Biases"])
    # depthwise golden
    xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    mid = np.zeros((2, 6, 6, 3))
    for i in range(6):
        for j in range(6):
            patch = xp[:, i : i + 3, j : j + 3, :]
            mid[:, i, j, :] = np.einsum("nhwc,hwc->nc", patch, dw[:, :, :, 0])
    gold = mid @ pw[0, 0] + b
    np.testing.assert_allclose(np.asarray(y), gold, rtol=1e-4, atol=1e-4)


def test_linear_weightnorm_flag():
    """TF-style weightnorm: effective W has column norms == g."""
    x = jnp.eye(6)
    with init_context(seed=0) as ctx:
        y = linear("L", 6, 4, x, weightnorm=True, biases=False)
    w_eff = np.asarray(y)  # identity input -> rows are W_eff rows
    g = np.asarray(ctx.params["L.g"])
    np.testing.assert_allclose(np.sqrt((w_eff**2).sum(0)), g, rtol=1e-5)
    # doubling W leaves the effective weight unchanged (reparameterization)
    params2 = dict(ctx.params)
    params2["L.W"] = params2["L.W"] * 2.0
    with apply_context(params2):
        y2 = linear("L", 6, 4, x, weightnorm=True, biases=False)
    np.testing.assert_allclose(np.asarray(y2), w_eff, rtol=1e-5)


def test_conv2d_weightnorm_flag():
    x = np.random.default_rng(2).normal(size=(1, 4, 4, 2)).astype("f4")
    with init_context(seed=0) as ctx:
        y1 = conv2d("C", 2, 3, 3, jnp.asarray(x), weightnorm=True, biases=False)
    params2 = dict(ctx.params)
    params2["C.Filters"] = params2["C.Filters"] * 3.0
    with apply_context(params2):
        y2 = conv2d("C", 2, 3, 3, jnp.asarray(x), weightnorm=True, biases=False)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1), rtol=1e-4)


def test_deconv2d_weightnorm_flag():
    x = np.random.default_rng(3).normal(size=(1, 4, 4, 2)).astype("f4")
    with init_context(seed=0) as ctx:
        y1 = deconv2d("D", 2, 3, 5, jnp.asarray(x), weightnorm=True, biases=False)
    params2 = dict(ctx.params)
    params2["D.Filters"] = params2["D.Filters"] * 0.5
    with apply_context(params2):
        y2 = deconv2d("D", 2, 3, 5, jnp.asarray(x), weightnorm=True, biases=False)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1), rtol=1e-4)


def test_embedding_lookup():
    idx = jnp.asarray([0, 2, 2])
    with init_context(seed=0) as ctx:
        e = embedding("E", 5, 8, idx)
    table = np.asarray(ctx.params["E.EmbeddingMatrix"])
    np.testing.assert_allclose(np.asarray(e), table[[0, 2, 2]])


def test_kl_utils():
    # KL(N(0,1)||N(0,1)) = 0
    z = jnp.zeros(4)
    np.testing.assert_allclose(np.asarray(kl_gaussian_gaussian(z, z, z, z)), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(kl_unit_gaussian(z, z)), 0.0, atol=1e-7)
    # KL(N(1,1)||N(0,1)) = 0.5
    np.testing.assert_allclose(
        np.asarray(kl_unit_gaussian(jnp.ones(1), jnp.zeros(1))), 0.5, rtol=1e-6
    )


def test_batchnorm_blend_mode_runs():
    x = np.random.default_rng(4).normal(size=(8, 4, 4, 3)).astype("f4")
    with init_context(seed=0) as ctx:
        batchnorm("BN", jnp.asarray(x), update_stats=True)
    with apply_context(ctx.params, mutable_state=dict(ctx.state)):
        y = batchnorm("BN", jnp.asarray(x), mode="blend")
    assert np.isfinite(np.asarray(y)).all()
