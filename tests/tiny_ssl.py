"""Importable tiny-SSL patch helpers.

Used two ways:
  * by test_apps.py via pytest's monkeypatch (pass `setter=monkeypatch.setattr`)
    so the patch is undone at test teardown;
  * by cross-PROCESS determinism tests, where a fresh subprocess applies the
    patch with plain setattr (its interpreter exits afterwards, nothing to
    undo).

The tiny nets keep the real apps' contract (128-d features for the TE
buffers, Classifier./Generator. param prefixes, dd_init support); the
semantics under test — epoch-scan, resume, replay determinism — are
architecture-independent, and the full CT_CIFAR nets take ~25 min per
compile on the 1-core CPU host (full-size modes are verified on the real
chip, VALIDATION.md rounds 3-4).
"""


def apply_tiny_ssl_models(setter=setattr):
    import jax.numpy as jnp

    import ctgan_tpu.models.classifiers as classifiers
    from ctgan_tpu.core import rng
    from ctgan_tpu.models.classifiers import ClassifierOut, deconv_bn_relu
    from ctgan_tpu.models.common import flat_to_nhwc, nhwc_to_flat
    from ctgan_tpu.ops import (
        batchnorm, dropout, global_mean_pool, leaky_relu, linear, relu,
        wn_conv2d, wn_deconv2d, wn_dense,
    )

    def tiny_classifier(x, *, deterministic=False, dd_init=False):
        if x.ndim == 2:
            x = flat_to_nhwc(x, 3, 32, 32)
        out = wn_conv2d("Classifier.C1", 3, 16, 3, x, pad=1, stride=2,
                        nonlinearity=leaky_relu, dd_init=dd_init)
        out = dropout(out, 0.5, deterministic=deterministic)
        out = wn_conv2d("Classifier.NIN", 16, 128, 1, out,
                        nonlinearity=leaky_relu, dd_init=dd_init)
        pooled = global_mean_pool(out)
        logits = wn_dense("Classifier.Output", 128, 10, pooled,
                          nonlinearity=None, dd_init=dd_init,
                          init_stdv=0.1, train_g=True)
        return ClassifierOut(logits, pooled, pooled)

    def tiny_generator(n_samples, *, noise_dim=8, noise=None, dd_init=False):
        import jax

        if noise is None:
            noise = jax.random.uniform(rng.next_key("noise"),
                                       (n_samples, noise_dim))
        out = linear("Generator.D1", noise_dim, 8 * 8 * 8, noise,
                     biases=False)
        out = relu(batchnorm("Generator.BN1", out, scale=False))
        out = out.reshape(-1, 8, 8, 8)
        out = deconv_bn_relu("Generator.DC1", 8, 8, out)
        out = wn_deconv2d("Generator.Output", 8, 3, 5, out,
                          nonlinearity=jnp.tanh, init_stdv=0.1,
                          train_g=True, dd_init=dd_init)
        return nhwc_to_flat(out)

    setter(classifiers, "cifar_ssl_classifier", tiny_classifier)
    setter(classifiers, "cifar_ssl_generator", tiny_generator)


def apply_small_cifar(setter=setattr):
    import ctgan_tpu.data.cifar10 as cifar_mod

    def small(data_dir=None, subset="train"):
        from ctgan_tpu.data.synthetic import synthetic_images

        n = 200 if subset == "train" else 100
        flat, y = synthetic_images(n, 3, 32, seed=0 if subset == "train" else 1)
        x = flat.reshape(-1, 3, 32, 32).astype("float32") / 255.0 - 0.5
        return x, y

    setter(cifar_mod, "load_normalized", small)
