"""Additional op coverage: conv1d, separable conv, TF-style weightnorm flag,
embedding, KL utils, batchnorm blend mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


class TestUpsampleConvFused:
    """ops.upsample_conv2d must be EXACTLY conv2d(upsample_nearest(x))
    computed on the small grid (parity-collapse rewrite) — same params,
    same values, same gradients."""

    def _pair(self, k, h, w, cin, cout, bias, gain, seed):
        import jax
        import jax.numpy as jnp
        from ctgan_tpu.core import apply_context, init_context, rng_context
        from ctgan_tpu.ops import conv2d, upsample_conv2d
        from ctgan_tpu.ops.pool import upsample_nearest

        x = jnp.asarray(
            np.random.default_rng(seed).normal(size=(2, h, w, cin)).astype("f4")
        )
        with init_context(seed=seed) as ctx:
            with rng_context(jax.random.PRNGKey(0)):
                upsample_conv2d("U", cin, cout, k, x, biases=bias, gain=gain)
        params = dict(ctx.params)

        def fused(p, x):
            with apply_context(p):
                return upsample_conv2d("U", cin, cout, k, x, biases=bias, gain=gain)

        def naive(p, x):
            with apply_context(p):
                return conv2d("U", cin, cout, k, upsample_nearest(x), biases=bias, gain=gain)

        return params, x, fused, naive

    @pytest.mark.parametrize("k", [1, 3, 5])
    @pytest.mark.parametrize("hw", [(4, 4), (5, 7)])
    def test_values_match(self, k, hw):
        params, x, fused, naive = self._pair(k, *hw, 3, 6, True, 1.0, seed=k)
        a = np.asarray(fused(params, x))
        b = np.asarray(naive(params, x))
        assert a.shape == b.shape == (2, 2 * hw[0], 2 * hw[1], 6)
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)

    def test_gain_and_no_bias(self):
        params, x, fused, naive = self._pair(3, 6, 6, 4, 4, False, 0.5, seed=9)
        np.testing.assert_allclose(
            np.asarray(fused(params, x)), np.asarray(naive(params, x)),
            rtol=1e-5, atol=1e-5,
        )

    def test_gradients_match(self):
        import jax

        params, x, fused, naive = self._pair(3, 4, 4, 3, 5, True, 1.0, seed=3)

        def loss(fn):
            def f(p, x):
                return (fn(p, x) ** 2).sum()
            return jax.grad(f, argnums=(0, 1))(params, x)

        ga, gxa = loss(fused)
        gb, gxb = loss(naive)
        np.testing.assert_allclose(np.asarray(gxa), np.asarray(gxb), rtol=1e-4, atol=1e-4)
        for name in ga:
            np.testing.assert_allclose(
                np.asarray(ga[name]), np.asarray(gb[name]), rtol=1e-4, atol=1e-4,
                err_msg=name,
            )

    def test_blocks_use_fused_path_same_params(self):
        """blocks.upsample_conv with fuse on/off builds identical param
        trees and outputs."""
        import jax
        import jax.numpy as jnp
        from ctgan_tpu.core import apply_context, init_context, rng_context
        from ctgan_tpu.models import blocks

        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(2, 4, 4, 8)).astype("f4")
        )
        outs, ptrees = [], []
        for fuse in (True, False):
            old = blocks.FUSE_UPSAMPLE_CONV
            blocks.FUSE_UPSAMPLE_CONV = fuse
            try:
                with init_context(seed=5) as ctx:
                    with rng_context(jax.random.PRNGKey(0)):
                        out = blocks.upsample_conv("G.Up", 8, 4, 3, x)
                outs.append(np.asarray(out))
                ptrees.append({k: np.asarray(v) for k, v in ctx.params.items()})
            finally:
                blocks.FUSE_UPSAMPLE_CONV = old
        assert sorted(ptrees[0]) == sorted(ptrees[1])
        for k in ptrees[0]:
            np.testing.assert_array_equal(ptrees[0][k], ptrees[1][k])
        np.testing.assert_allclose(outs[0], outs[1], rtol=1e-5, atol=1e-5)


def test_upsample_conv2d_rejects_even_filter():
    """ADVICE r2: the parity-collapse map is only exact for odd K (symmetric
    SAME padding); an even K must raise, not silently mismatch."""
    import pytest

    from ctgan_tpu.core import init_context, rng_context
    from ctgan_tpu.ops import upsample_conv2d

    x = jnp.ones((1, 4, 4, 2))
    with init_context(seed=0):
        with rng_context(jax.random.PRNGKey(0)):
            with pytest.raises(ValueError, match="odd filter_size"):
                upsample_conv2d("U", 2, 2, 4, x)


class TestMeanPoolConvFusionEquivalence:
    """ops.conv_mean_pool2d / mean_pool_conv2d must be EXACTLY the unfused
    conv2d + mean_pool pair (stride-2 kernel-transform rewrite) — same
    params, same values, same gradients."""

    def _pair(self, order, k, h, w, cin, cout, bias, gain, seed):
        import jax
        import jax.numpy as jnp
        from ctgan_tpu.core import apply_context, init_context, rng_context
        from ctgan_tpu.ops import conv2d, conv_mean_pool2d, mean_pool_conv2d
        from ctgan_tpu.ops.pool import mean_pool

        x = jnp.asarray(
            np.random.default_rng(seed).normal(size=(2, h, w, cin)).astype("f4")
        )
        fused_op = conv_mean_pool2d if order == "conv_first" else mean_pool_conv2d
        with init_context(seed=seed) as ctx:
            with rng_context(jax.random.PRNGKey(0)):
                fused_op("M", cin, cout, k, x, biases=bias, gain=gain)
        params = dict(ctx.params)

        def fused(p, x):
            with apply_context(p):
                return fused_op("M", cin, cout, k, x, biases=bias, gain=gain)

        def naive(p, x):
            with apply_context(p):
                if order == "conv_first":
                    return mean_pool(
                        conv2d("M", cin, cout, k, x, biases=bias, gain=gain)
                    )
                return conv2d("M", cin, cout, k, mean_pool(x), biases=bias, gain=gain)

        return params, x, fused, naive

    @pytest.mark.parametrize("order", ["conv_first", "pool_first"])
    @pytest.mark.parametrize("k", [1, 3, 5])
    @pytest.mark.parametrize("hw", [(4, 4), (6, 10)])
    def test_values_match(self, order, k, hw):
        params, x, fused, naive = self._pair(order, k, *hw, 3, 6, True, 1.0, seed=k)
        a = np.asarray(fused(params, x))
        b = np.asarray(naive(params, x))
        assert a.shape == b.shape == (2, hw[0] // 2, hw[1] // 2, 6)
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("order", ["conv_first", "pool_first"])
    def test_gain_and_no_bias(self, order):
        params, x, fused, naive = self._pair(order, 3, 6, 6, 4, 4, False, 0.5, seed=9)
        np.testing.assert_allclose(
            np.asarray(fused(params, x)), np.asarray(naive(params, x)),
            rtol=1e-5, atol=1e-5,
        )

    @pytest.mark.parametrize("order", ["conv_first", "pool_first"])
    def test_gradients_match(self, order):
        import jax

        params, x, fused, naive = self._pair(order, 3, 4, 4, 3, 5, True, 1.0, seed=3)

        def loss(fn):
            def f(p, x):
                return (fn(p, x) ** 2).sum()
            return jax.grad(f, argnums=(0, 1))(params, x)

        ga, gxa = loss(fused)
        gb, gxb = loss(naive)
        np.testing.assert_allclose(np.asarray(gxa), np.asarray(gxb), rtol=1e-4, atol=1e-4)
        for name in ga:
            np.testing.assert_allclose(
                np.asarray(ga[name]), np.asarray(gb[name]), rtol=1e-4, atol=1e-4,
                err_msg=name,
            )

    def test_blocks_use_fused_path_same_params(self):
        """blocks.conv_mean_pool / mean_pool_conv with fuse on/off build
        identical param trees and matching outputs."""
        import jax
        import jax.numpy as jnp
        from ctgan_tpu.core import init_context, rng_context
        from ctgan_tpu.models import blocks

        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(2, 8, 8, 3)).astype("f4")
        )
        outs, ptrees = [], []
        for fuse in (True, False):
            old = blocks.FUSE_MEANPOOL_CONV
            blocks.FUSE_MEANPOOL_CONV = fuse
            try:
                with init_context(seed=5) as ctx:
                    with rng_context(jax.random.PRNGKey(0)):
                        out = blocks.optimized_res_block_disc1(x, 16, name="D.1")
                outs.append(np.asarray(out))
                ptrees.append({k: np.asarray(v) for k, v in ctx.params.items()})
            finally:
                blocks.FUSE_MEANPOOL_CONV = old
        assert sorted(ptrees[0]) == sorted(ptrees[1])
        for k in ptrees[0]:
            np.testing.assert_array_equal(ptrees[0][k], ptrees[1][k])
        np.testing.assert_allclose(outs[0], outs[1], rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("order", ["conv_first", "pool_first"])
    def test_rejects_even_filter_and_odd_hw(self, order):
        import jax
        import pytest
        from ctgan_tpu.core import init_context, rng_context
        from ctgan_tpu.ops import conv_mean_pool2d, mean_pool_conv2d

        op = conv_mean_pool2d if order == "conv_first" else mean_pool_conv2d
        with init_context(seed=0):
            with rng_context(jax.random.PRNGKey(0)):
                with pytest.raises(ValueError, match="odd filter_size"):
                    op("M", 2, 2, 4, jnp.ones((1, 4, 4, 2)))
                with pytest.raises(ValueError, match="even spatial"):
                    op("M", 2, 2, 3, jnp.ones((1, 5, 4, 2)))
