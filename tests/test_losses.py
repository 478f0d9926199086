"""Loss-engine property tests: CT semantics, GP double-backward correctness."""

import jax
import jax.numpy as jnp
import numpy as np

from ctgan_tpu.core import apply_context, init_context, rng_context
from ctgan_tpu.losses import (
    acgan_accuracy,
    acgan_loss,
    consistency_term,
    ct_cifar_unlabeled_loss,
    ct_mnist_unlabeled_loss,
    dcgan_losses,
    ema_targets_update,
    feature_matching_abs,
    feature_matching_sq,
    gradient_penalty,
    input_slopes,
    labeled_loss,
    lsgan_losses,
    wgan_losses,
)
from ctgan_tpu.models import dcgan
from ctgan_tpu.ops import linear


def test_wgan_losses():
    d_real = jnp.asarray([1.0, 3.0])
    d_fake = jnp.asarray([0.0, 2.0])
    g, d = wgan_losses(d_real, d_fake)
    assert np.isclose(float(g), -1.0)
    assert np.isclose(float(d), 1.0 - 2.0)


def test_consistency_term_zero_when_passes_identical():
    d = jnp.asarray([1.0, 2.0])
    f = jnp.ones((2, 8))
    assert float(consistency_term(d, d, f, f)) == 0.0


def test_consistency_term_matches_formula():
    d1 = jnp.asarray([1.0, 2.0])
    d2 = jnp.asarray([1.5, 1.0])
    f1 = jnp.zeros((2, 4))
    f2 = jnp.ones((2, 4))
    # CT_i = 2*(d1-d2)^2 + 2*0.1*mean((f1-f2)^2) = 2*(0.25,1.0) + 0.2
    gold = np.mean(np.maximum(np.array([0.5 + 0.2, 2.0 + 0.2]) - 0.0, 0.0))
    got = float(consistency_term(d1, d2, f1, f2, lambda_2=2.0, factor_m=0.0))
    assert np.isclose(got, gold)
    # with factor M large enough, CT clips to zero
    assert float(consistency_term(d1, d2, f1, f2, factor_m=10.0)) == 0.0


def test_gradient_penalty_zero_for_unit_linear_disc():
    """D(x) = w·x with ‖w‖=1 is exactly 1-Lipschitz -> GP = 0."""
    w = np.zeros(16, dtype="float32")
    w[0] = 1.0

    def disc(x):
        return x @ jnp.asarray(w), x

    real = jnp.asarray(np.random.default_rng(0).normal(size=(8, 16)).astype("f4"))
    fake = jnp.asarray(np.random.default_rng(1).normal(size=(8, 16)).astype("f4"))
    gp, slopes = gradient_penalty(disc, real, fake, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(slopes), 1.0, rtol=1e-5)
    assert float(gp) < 1e-9


def test_gradient_penalty_matches_finite_difference():
    """Double-backward check: d(GP)/d(disc params) vs central differences."""
    rng = np.random.default_rng(3)
    real = jnp.asarray(rng.normal(size=(4, 6)).astype("f4"))
    fake = jnp.asarray(rng.normal(size=(4, 6)).astype("f4"))
    key = jax.random.PRNGKey(1)

    with init_context(seed=0) as ctx:
        linear("D.L1", 6, 5, real)
        linear("D.Out", 5, 1, jnp.zeros((1, 5)))
    params = ctx.params

    def gp_of_params(p):
        def disc(x):
            with apply_context(p):
                h = jnp.tanh(linear("D.L1", 6, 5, x))
                return linear("D.Out", 5, 1, h).reshape(-1), h

        return gradient_penalty(disc, real, fake, key)[0]

    grads = jax.grad(gp_of_params)(params)
    # finite differences on a few random coordinates of D.L1.W
    w = np.asarray(params["D.L1.W"], dtype="float64")
    for idx in [(0, 0), (3, 2), (5, 4)]:
        eps = 1e-3
        p_plus = dict(params)
        wp = w.copy(); wp[idx] += eps
        p_plus["D.L1.W"] = jnp.asarray(wp, jnp.float32)
        p_minus = dict(params)
        wm = w.copy(); wm[idx] -= eps
        p_minus["D.L1.W"] = jnp.asarray(wm, jnp.float32)
        fd = (float(gp_of_params(p_plus)) - float(gp_of_params(p_minus))) / (2 * eps)
        ad = float(np.asarray(grads["D.L1.W"])[idx])
        assert np.isclose(fd, ad, rtol=5e-2, atol=1e-4), (idx, fd, ad)


def test_gp_through_dropout_uses_constant_mask():
    """The dropout mask inside the GP pass must be constant w.r.t. x —
    gradients must exist and be finite through the full MNIST D."""
    with init_context(seed=0) as ctx:
        with rng_context(jax.random.PRNGKey(0)):
            real = jnp.asarray(
                np.random.default_rng(0).uniform(size=(4, 784)).astype("f4")
            )
            fake = dcgan.mnist_generator(4, dim=8)
            gp, slopes = gradient_penalty(
                lambda x: dcgan.mnist_discriminator(x, dim=8),
                real, fake, jax.random.PRNGKey(2),
            )
    assert np.isfinite(float(gp))
    assert np.isfinite(np.asarray(slopes)).all()


def test_input_slopes_monitor():
    def disc(x):
        return 2.0 * jnp.sum(x, axis=1), x

    x = jnp.ones((3, 4))
    s = np.asarray(input_slopes(disc, x))
    np.testing.assert_allclose(s, 2.0 * np.sqrt(4), rtol=1e-5)


def test_dcgan_losses_match_sigmoid_ce():
    logits = jnp.asarray([0.5, -1.0])
    g, d = dcgan_losses(logits, logits)
    sig = 1 / (1 + np.exp(-np.asarray(logits)))
    gold_g = np.mean(-np.log(sig))
    assert np.isclose(float(g), gold_g, rtol=1e-5)


def test_lsgan_losses():
    g, d = lsgan_losses(jnp.asarray([1.0]), jnp.asarray([0.0]))
    assert float(g) == 1.0 and float(d) == 0.0


def test_acgan_loss_and_acc():
    logits = jnp.asarray([[10.0, 0.0], [0.0, 10.0]])
    labels = jnp.asarray([0, 1])
    assert float(acgan_loss(logits, labels)) < 1e-3
    assert float(acgan_accuracy(logits, labels)) == 1.0
    assert float(acgan_accuracy(logits, jnp.asarray([1, 0]))) == 0.0


def test_labeled_loss_is_softmax_ce():
    logits = jnp.asarray(np.random.default_rng(0).normal(size=(5, 10)).astype("f4"))
    labels = jnp.asarray([0, 3, 7, 1, 9])
    gold = -np.mean(
        np.asarray(jax.nn.log_softmax(logits))[np.arange(5), np.asarray(labels)]
    )
    assert np.isclose(float(labeled_loss(logits, labels)), gold, rtol=1e-5)


def test_mnist_unlabeled_loss_components():
    logits = jnp.zeros((4, 10))
    feats = jnp.zeros((4, 250))
    loss, ct = ct_mnist_unlabeled_loss(logits, logits, feats, feats, logits)
    assert float(ct) == 0.0
    # LSE(0-logits) = log(10); softplus terms and -mean cancel structure
    lse = np.log(10.0)
    gold = 0.5 * (-lse + 2 * np.log1p(np.exp(lse)))
    assert np.isclose(float(loss), gold, rtol=1e-5)


def test_cifar_unlabeled_loss_finite():
    rng = np.random.default_rng(1)
    l1 = jnp.asarray(rng.normal(size=(4, 10)).astype("f4"))
    l2 = jnp.asarray(rng.normal(size=(4, 10)).astype("f4"))
    f1 = jnp.asarray(rng.normal(size=(4, 128)).astype("f4"))
    f2 = jnp.asarray(rng.normal(size=(4, 128)).astype("f4"))
    loss = ct_cifar_unlabeled_loss(l1, l2, f1, f2, l1)
    assert np.isfinite(float(loss))


def test_feature_matching():
    f1 = jnp.ones((4, 8))
    f2 = jnp.zeros((4, 8))
    assert float(feature_matching_sq(f1, f2)) == 1.0
    assert float(feature_matching_abs(f1, f2)) == 1.0
    assert float(feature_matching_sq(f1, f1)) == 0.0


def test_ema_targets_bias_correction():
    ens = jnp.zeros((3, 10))
    preds = jnp.ones((3, 10))
    new_ens, targets = ema_targets_update(ens, preds, 0, decay=0.6)
    # epoch 0: ens = 0.4*preds; correction 1-0.6 = 0.4 -> targets == preds
    np.testing.assert_allclose(np.asarray(targets), 1.0, rtol=1e-6)
    new_ens2, targets2 = ema_targets_update(new_ens, preds, 1, decay=0.6)
    np.testing.assert_allclose(np.asarray(targets2), 1.0, rtol=1e-6)
