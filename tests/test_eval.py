"""Eval stack: IS formula golden check, FID properties, trained scorer."""

import numpy as np

from ctgan_tpu.data.synthetic import synthetic_cifar10
from ctgan_tpu.eval import (
    TrainedScorer,
    fid_from_features,
    inception_score_from_probs,
)


def test_inception_score_uniform_is_one():
    probs = np.full((1000, 10), 0.1)
    mean, std = inception_score_from_probs(probs)
    assert np.isclose(mean, 1.0, atol=1e-6)
    assert np.isclose(std, 0.0, atol=1e-6)


def test_inception_score_confident_diverse_is_high():
    # perfectly confident, uniformly diverse -> IS = n_classes
    n = 1000
    probs = np.eye(10)[np.arange(n) % 10] * 0.9999 + 1e-5
    probs /= probs.sum(1, keepdims=True)
    mean, _ = inception_score_from_probs(probs)
    assert mean > 9.0


def test_inception_score_collapsed_is_low():
    probs = np.zeros((1000, 10))
    probs[:, 3] = 1.0  # mode collapse
    mean, _ = inception_score_from_probs(probs)
    assert np.isclose(mean, 1.0, atol=1e-3)


def test_inception_score_matches_numpy_reference():
    """Exact formula vs direct reimplementation of
    tflib/inception_score.py:40-50."""
    rng = np.random.default_rng(0)
    probs = rng.dirichlet(np.ones(10), size=500)
    got_mean, got_std = inception_score_from_probs(probs, splits=10)
    scores = []
    for i in range(10):
        part = probs[i * 50 : (i + 1) * 50]
        kl = part * (np.log(part + 1e-12) - np.log(np.expand_dims(np.mean(part, 0), 0) + 1e-12))
        scores.append(np.exp(np.mean(np.sum(kl, 1))))
    assert np.isclose(got_mean, np.mean(scores), rtol=1e-9)
    assert np.isclose(got_std, np.std(scores), rtol=1e-9)


def test_fid_identical_zero_and_orders():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(500, 16))
    b = rng.normal(size=(500, 16))
    c = rng.normal(loc=3.0, size=(500, 16))
    fid_ab = fid_from_features(a, b)
    fid_ac = fid_from_features(a, c)
    assert fid_from_features(a, a) < 1e-6
    assert fid_ab < fid_ac
    assert fid_ac > 100  # mean shift of 3 in 16 dims -> >= 144


def test_trained_scorer_end_to_end(tmp_path):
    (tr_x, tr_y), (te_x, te_y) = synthetic_cifar10(n_train=2000, n_test=500)
    scorer = TrainedScorer(3, 32, dim=16, cache_path=str(tmp_path / "scorer.npz"))
    acc = scorer.fit(tr_x, tr_y, epochs=2, batch_size=128)
    assert acc > 0.5  # synthetic classes are easily separable
    sanity = scorer.sanity_check(te_x[:500], te_y[:500])
    assert sanity > 0.5
    # IS of real data should beat IS of noise images
    mean_real, _ = scorer.inception_score(te_x[:500], splits=5)
    noise_imgs = np.random.default_rng(0).integers(0, 256, size=(500, 3072))
    mean_noise, _ = scorer.inception_score(noise_imgs, splits=5)
    assert mean_real > mean_noise
    # FID(real, real-subset) << FID(real, noise)
    fid_rr = scorer.fid(te_x[:250], te_x[250:500])
    fid_rn = scorer.fid(te_x[:250], noise_imgs[:250])
    assert fid_rr < fid_rn
    # cache reload path
    scorer2 = TrainedScorer(3, 32, dim=16, cache_path=str(tmp_path / "scorer.npz"))
    assert scorer2.params is not None
