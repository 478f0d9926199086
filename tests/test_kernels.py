"""Pallas kernel tests.

The on-core PRNG (`pltpu.prng_random_bits`) has no CPU lowering and the HLO
interpreter stubs it to zeros, so statistical checks are TPU-gated (they were
validated on hardware: keep fraction 0.501 at keep_prob=0.5, per-seed
determinism, per-block independence).  CPU tests cover shapes, autodiff
structure, and the ops-layer integration switch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctgan_tpu.kernels.dropout import dropout_mask, pallas_dropout

ON_TPU = jax.devices()[0].platform not in ("cpu",)
tpu_only = pytest.mark.skipif(not ON_TPU, reason="needs TPU PRNG")


def test_mask_shape_and_dtype_cpu_interpret():
    mask = dropout_mask(jnp.asarray(7, jnp.int32), (3, 7, 11), 0.8, interpret=True)
    assert mask.shape == (3, 7, 11)
    assert mask.dtype == jnp.float32


def test_mask_native_dtype_matches_fp32_cast():
    """dtype= emits the SAME values as the fp32 mask cast after the fact
    (what the multiply consumed before) — the half-width storage is a pure
    HBM-traffic cut, not a numerics change."""
    seed = jnp.asarray(13, jnp.int32)
    f32 = dropout_mask(seed, (5, 33), 0.8, interpret=True)
    bf16 = dropout_mask(seed, (5, 33), 0.8, interpret=True, dtype=jnp.bfloat16)
    assert bf16.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(f32.astype(jnp.bfloat16)), np.asarray(bf16)
    )


def test_pallas_dropout_bf16_output_dtype():
    """bf16 activations keep their dtype through pallas_dropout, and the
    kept values are exactly x * (1/kp rounded to bf16)."""
    x = jnp.full((4, 64), 3.0, jnp.bfloat16)
    y = pallas_dropout(x, jnp.asarray(5, jnp.int32), 0.5, interpret=True)
    assert y.dtype == jnp.bfloat16
    vals = set(np.unique(np.asarray(y, dtype=np.float32)))
    assert vals.issubset({0.0, 6.0})


def test_keep_prob_one_identity():
    x = jnp.ones((4, 4))
    y = pallas_dropout(x, jnp.asarray(0, jnp.int32), 1.0, interpret=True)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_grad_and_grad_of_grad_structure():
    """First/second-order autodiff must treat the mask as a constant (the GP
    double-backward requirement) — verified structurally on CPU interpret."""
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 256)).astype("f4"))
    seed = jnp.asarray(11, jnp.int32)

    def f(x):
        y = pallas_dropout(x, seed, 0.5, interpret=True)
        return jnp.sum(jnp.tanh(y) ** 2)

    g = jax.grad(f)(x)
    assert np.isfinite(np.asarray(g)).all()
    h = jax.grad(lambda x: jnp.sum(jax.grad(f)(x) ** 2))(x)
    assert np.isfinite(np.asarray(h)).all()


def test_ops_dropout_pallas_switch_falls_back_when_traced():
    """enable_pallas_dropout must not break traced keep-probs (ResNet's
    per-pass kp args) — they take the jax.random path."""
    from ctgan_tpu.core import rng_context
    from ctgan_tpu.ops import dropout
    from ctgan_tpu.ops.dropout import enable_pallas_dropout

    x = jnp.ones((4, 64))
    enable_pallas_dropout(True)
    try:
        with rng_context(jax.random.PRNGKey(0)):
            out = jax.jit(
                lambda x, kp: dropout(x, kp, key=jax.random.PRNGKey(1))
            )(x, jnp.asarray(0.5))
        assert out.shape == x.shape
    finally:
        enable_pallas_dropout(False)


@tpu_only
def test_mask_statistics_tpu():
    m = np.asarray(dropout_mask(jnp.asarray(7, jnp.int32), (64, 1000), 0.5))
    assert set(np.round(np.unique(m), 4)).issubset({0.0, 2.0})
    assert np.isclose((m > 0).mean(), 0.5, atol=0.02)


@tpu_only
def test_mask_determinism_tpu():
    a = np.asarray(dropout_mask(jnp.asarray(3, jnp.int32), (8, 128), 0.5))
    b = np.asarray(dropout_mask(jnp.asarray(3, jnp.int32), (8, 128), 0.5))
    c = np.asarray(dropout_mask(jnp.asarray(4, jnp.int32), (8, 128), 0.5))
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


@tpu_only
def test_blocks_independent_tpu():
    big = np.asarray(dropout_mask(jnp.asarray(1, jnp.int32), (1024, 1024), 0.5))
    assert not np.array_equal(big[:256], big[256:512])
