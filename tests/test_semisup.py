"""Semi-supervised trainer: dd-init, EMA averaging, training smoke test."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ctgan_tpu.core import init_context, rng_context, split_params
from ctgan_tpu.data.synthetic import synthetic_mnist
from ctgan_tpu.models import classifiers
from ctgan_tpu.train import SslConfig, data_dependent_init, make_ssl_trainer


def _init_mnist_ssl(seed=0):
    with init_context(seed=seed) as ctx:
        with rng_context(jax.random.PRNGKey(0)):
            x = jnp.zeros((2, 784))
            classifiers.mnist_ssl_classifier(x)
            classifiers.mnist_ssl_generator(2)
    disc, gen, rest = split_params(ctx.params, "Classifier", "Generator")
    assert not rest
    return disc, gen


def test_data_dependent_init_standardizes():
    disc, gen = _init_mnist_ssl()
    (tr_x, _), _, _ = synthetic_mnist(n_train=512, n_valid=1, n_test=1)
    x = jnp.asarray(tr_x[:256])

    def init_pass():
        classifiers.mnist_ssl_classifier(x, dd_init=True)

    new_disc = data_dependent_init({**disc, **gen}, init_pass, jax.random.PRNGKey(1))
    # g and b of the WN layers changed
    assert not np.allclose(
        np.asarray(new_disc["Classifier.D1.g"]), np.asarray(disc["Classifier.D1.g"])
    )
    # logits after init have ~unit scale pre-noise; just check finiteness + shape
    assert np.isfinite(np.asarray(new_disc["Classifier.Output.b"])).all()


def test_ssl_training_reduces_error():
    """Short-horizon smoke test: labeled error on the synthetic set drops."""
    disc, gen = _init_mnist_ssl()
    (tr_x, tr_y), _, _ = synthetic_mnist(n_train=600, n_valid=1, n_test=1)

    cfg = SslConfig(variant="mnist", lr=0.003)
    init_state, step_fn, test_fn, multi_step_fn = make_ssl_trainer(
        classifiers.mnist_ssl_classifier,
        classifiers.mnist_ssl_generator,
        cfg,
    )
    # dd-init before training, as the reference does (CT_MNIST.py:139)
    merged = data_dependent_init(
        {**disc, **gen},
        lambda: classifiers.mnist_ssl_classifier(jnp.asarray(tr_x[:500]), dd_init=True),
        jax.random.PRNGKey(1),
    )
    disc = {k: v for k, v in merged.items() if k.startswith("Classifier")}
    state = init_state(disc, gen)

    jit_step = jax.jit(partial(step_fn), donate_argnums=0)
    bs = 100
    err0 = None
    key = jax.random.PRNGKey(2)
    for i in range(12):
        sl = slice((i * bs) % 500, (i * bs) % 500 + bs)
        x_lab = jnp.asarray(tr_x[sl])
        y = jnp.asarray(tr_y[sl])
        state, (metrics, _, _) = jit_step(state, x_lab, y, x_lab, x_lab, None, key)
        if err0 is None:
            err0 = float(metrics["train_err"])
    err_final = float(metrics["train_err"])
    assert np.isfinite(float(metrics["loss_lab"]))
    assert np.isfinite(float(metrics["loss_gen"]))
    assert err_final <= err0 + 0.05, (err0, err_final)
    # EMA params have moved off zero
    assert float(jnp.abs(state.avg_params["Classifier.D1.W"]).max()) > 0


def test_te_variant_runs():
    disc, gen = _init_mnist_ssl()
    cfg = SslConfig(variant="te", lambda_2=1.0)
    init_state, step_fn, test_fn, multi_step_fn = make_ssl_trainer(
        classifiers.mnist_ssl_classifier, classifiers.mnist_ssl_generator, cfg
    )
    state = init_state(disc, gen)
    x = jnp.asarray(np.random.default_rng(0).uniform(size=(50, 784)).astype("f4"))
    y = jnp.asarray(np.zeros(50, "int32"))
    targets = (jnp.full((50, 10), 0.1), jnp.zeros((50, 250)))
    state, (metrics, probs, feats) = jax.jit(step_fn, donate_argnums=0)(
        state, x, y, x, x, targets, jax.random.PRNGKey(0)
    )
    assert probs.shape == (50, 10)
    assert feats.shape == (50, 250)
    assert np.isfinite(float(metrics["loss_unl"]))


def test_test_fn_uses_avg_params():
    disc, gen = _init_mnist_ssl()
    cfg = SslConfig()
    init_state, step_fn, test_fn, multi_step_fn = make_ssl_trainer(
        classifiers.mnist_ssl_classifier, classifiers.mnist_ssl_generator, cfg
    )
    state = init_state(disc, gen)
    x = jnp.asarray(np.random.default_rng(0).uniform(size=(20, 784)).astype("f4"))
    y = jnp.asarray(np.zeros(20, "int32"))
    err = float(test_fn(state, x, y))
    assert 0.0 <= err <= 1.0
