"""Trained-classifier scorer: the self-contained Inception-Score path.

The reference's primary scorer downloads the frozen Inception-2015 GraphDef
(tflib/inception_score.py:56-77) — impossible in a zero-egress environment and
a documented fidelity risk (SURVEY §7).  This module implements the
reference's *fallback* protocol instead: train a small classifier on the real
training set once, cache its weights, and compute exp-KL scores from its
softmax (LSUN_bedrooms/inception_score.py:95-196, which does exactly this for
MNIST, caching at /tmp/inception_score.ckpt).

The scorer model is a compact conv net on our own op library; its penultimate
global-pool features also feed FID.  Scores are *self-consistent* (comparable
across checkpoints of the same run) though not numerically identical to
Inception-2015 IS; calibration against the committed 5.13/5.20 artifacts
requires the original frozen graph.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..core import apply_context, init_context, rng_context, split_params
from ..models.common import flat_to_nhwc
from ..ops import batchnorm, conv2d, global_mean_pool, linear, relu
from ..train import optim
from ..utils.checkpoint import load_checkpoint, save_checkpoint
from .metrics import fid_from_features, inception_score_from_probs

__all__ = ["ScorerNet", "TrainedScorer"]


def scorer_net(x_flat: jax.Array, channels: int, size: int, dim: int = 64) -> tuple[jax.Array, jax.Array]:
    """Compact classifier: 3 stride-2 convs + BN + global pool + linear.
    Returns (logits [N,10], features [N, 4*dim])."""
    out = flat_to_nhwc(x_flat, channels, size, size)
    out = relu(conv2d("Scorer.C1", channels, dim, 3, out, stride=2))
    out = relu(batchnorm("Scorer.BN1", conv2d("Scorer.C2", dim, 2 * dim, 3, out, stride=2)))
    out = relu(batchnorm("Scorer.BN2", conv2d("Scorer.C3", 2 * dim, 4 * dim, 3, out, stride=2)))
    feats = global_mean_pool(out)
    logits = linear("Scorer.Out", 4 * dim, 10, feats)
    return logits, feats


ScorerNet = scorer_net


class TrainedScorer:
    """Train-once-and-cache classifier scorer.

    ``fit`` trains on (uint8-valued flat images [N,D], labels); ``cache_path``
    mirrors the reference's /tmp weight cache
    (LSUN_bedrooms/inception_score.py:185-190).
    """

    def __init__(self, channels: int, size: int, dim: int = 64, cache_path: str | None = None):
        self.channels = channels
        self.size = size
        self.dim = dim
        self.cache_path = cache_path
        self.params: dict | None = None
        if cache_path and os.path.exists(cache_path):
            self.params = load_checkpoint(cache_path)

    def _normalize(self, images: np.ndarray) -> np.ndarray:
        x = np.asarray(images, dtype="float32")
        if x.max() > 1.5:  # [0,255] -> [-1,1]
            x = 2.0 * (x / 255.0 - 0.5)
        return x

    def fit(
        self,
        images: np.ndarray,
        labels: np.ndarray,
        *,
        epochs: int = 3,
        batch_size: int = 128,
        lr: float = 1e-3,
        seed: int = 0,
        verbose: bool = False,
    ) -> float:
        """Returns final train accuracy.  Caches weights when done."""
        x = self._normalize(images)
        y = np.asarray(labels, "int64")
        with init_context(seed=seed) as ctx:
            scorer_net(jnp.asarray(x[:2]), self.channels, self.size, self.dim)
        params, rest = split_params(ctx.params, "Scorer")[0], None
        opt = optim.adam(lr)
        opt_state = opt.init(params)

        def loss_fn(p, xb, yb):
            with apply_context(p):
                logits, _ = scorer_net(xb, self.channels, self.size, self.dim)
            logp = jax.nn.log_softmax(logits)
            ce = -jnp.mean(jnp.take_along_axis(logp, yb[:, None], axis=1))
            acc = jnp.mean((jnp.argmax(logits, 1) == yb).astype(jnp.float32))
            return ce, acc

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        @jax.jit
        def step(p, s, xb, yb):
            (ce, acc), g = grad_fn(p, xb, yb)
            p, s = opt.update(g, s, p, 0)
            return p, s, ce, acc

        rng = np.random.default_rng(seed)
        acc = 0.0
        for epoch in range(epochs):
            perm = rng.permutation(len(x))
            for i in range(0, len(x) - batch_size + 1, batch_size):
                idx = perm[i : i + batch_size]
                params, opt_state, ce, acc = step(
                    params, opt_state, jnp.asarray(x[idx]), jnp.asarray(y[idx])
                )
            if verbose:
                print(f"scorer epoch {epoch}: ce={float(ce):.4f} acc={float(acc):.3f}")
        self.params = params
        if self.cache_path:
            save_checkpoint(self.cache_path, params)
        return float(acc)

    def _apply(self, images: np.ndarray, batch_size: int = 2500):
        # large batches: on a tunneled TPU each dispatch+readback is a round
        # trip, so 50k samples at batch 500 paid 100 of them per IS eval
        assert self.params is not None, "call fit() first or provide a cache"
        x = self._normalize(images)

        @jax.jit
        def fwd(p, xb):
            with apply_context(p):
                logits, feats = scorer_net(xb, self.channels, self.size, self.dim)
            return jax.nn.softmax(logits), feats

        probs, feats = [], []
        for i in range(0, len(x), batch_size):
            p, f = fwd(self.params, jnp.asarray(x[i : i + batch_size]))
            probs.append(np.asarray(p))
            feats.append(np.asarray(f))
        return np.concatenate(probs), np.concatenate(feats)

    def probs(self, images) -> np.ndarray:
        return self._apply(images)[0]

    def features(self, images) -> np.ndarray:
        return self._apply(images)[1]

    def inception_score(self, images, splits: int = 10) -> tuple[float, float]:
        """The reference protocol: 10-split exp-KL mean±std
        (tflib/inception_score.py:25-53)."""
        return inception_score_from_probs(self.probs(images), splits)

    def fid(self, real_images, fake_images) -> float:
        return fid_from_features(self.features(real_images), self.features(fake_images))

    def sanity_check(self, test_images, test_labels) -> float:
        """Self-validating eval on the real test set
        (LSUN_bedrooms/inception_score.py:198-211)."""
        probs = self.probs(test_images)
        return float(np.mean(np.argmax(probs, 1) == np.asarray(test_labels)))
