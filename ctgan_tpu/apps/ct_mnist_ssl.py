"""Semi-supervised CT classifier, 100-label MNIST (rebuild of CT_MNIST.py).

Feature-matching GAN classifier with the consistency term between two
noise-perturbed passes, EMA parameter averaging for test, data-dependent
weight-norm init.  ``--count`` labels per class (default 10 -> 100 labels).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..core import init_context, rng_context, split_params
from ..data import mnist
from ..models import classifiers
from ..train import SslConfig, data_dependent_init, make_ssl_trainer
from ..utils import MetricLogger, save_checkpoint
from .common import parse_config, setup_out_dir


@dataclass(frozen=True)
class Config:
    seed: int = 2               # CT_MNIST.py:18-19
    seed_data: int = 2
    unlabeled_weight: float = 1.0
    batch_size: int = 100
    count: int = 10             # labels per class
    epochs: int = 300           # CT_MNIST.py:141
    learning_rate: float = 0.003
    LAMBDA_2: float = 0.1       # CT_MNIST.py:15
    factor_M: float = 0.0
    out_dir: str = "runs/ct_mnist_ssl"


def select_labeled(trainx, trainy, count, rng):
    """First ``count`` examples of each class after a shuffle
    (CT_MNIST.py:127-137)."""
    inds = rng.permutation(len(trainx))
    trainx, trainy = trainx[inds], trainy[inds]
    txs, tys = [], []
    for j in range(10):
        txs.append(trainx[trainy == j][:count])
        tys.append(trainy[trainy == j][:count])
    return np.concatenate(txs), np.concatenate(tys)


def main(argv=None, cfg: Config | None = None):
    cfg = cfg or parse_config(Config, argv)
    out_dir = setup_out_dir(cfg)
    data_rng = np.random.default_rng(cfg.seed_data)
    rng = np.random.default_rng(cfg.seed)

    d = mnist.load_arrays()
    trainx = np.concatenate([d["train"][0], d["dev"][0]])  # train+valid (:118)
    trainy = np.concatenate([d["train"][1], d["dev"][1]])
    testx, testy = d["test"]
    txs, tys = select_labeled(trainx, trainy, cfg.count, data_rng)

    with init_context(seed=cfg.seed) as ctx:
        with rng_context(jax.random.PRNGKey(cfg.seed)):
            classifiers.mnist_ssl_classifier(jnp.zeros((2, 784)))
            classifiers.mnist_ssl_generator(2)
    disc, gen, rest = split_params(ctx.params, "Classifier", "Generator")
    assert not rest

    # data-dependent init on the first 500 training examples (:139)
    merged = data_dependent_init(
        {**disc, **gen},
        lambda: classifiers.mnist_ssl_classifier(jnp.asarray(trainx[:500]), dd_init=True),
        jax.random.PRNGKey(cfg.seed),
    )
    disc = {k: v for k, v in merged.items() if k.startswith("Classifier")}

    scfg = SslConfig(
        variant="mnist", unlabeled_weight=cfg.unlabeled_weight,
        lr=cfg.learning_rate, lambda_2=cfg.LAMBDA_2, factor_m=cfg.factor_M,
    )
    init_state, step_fn, test_fn, multi_step_fn = make_ssl_trainer(
        classifiers.mnist_ssl_classifier, classifiers.mnist_ssl_generator, scfg
    )
    state = init_state(disc, gen)
    # whole-epoch chunks through the scanned multi-step: one device dispatch
    # per CHUNK batches instead of one per batch
    CHUNK = 50
    from ctgan_tpu.core import tuned_compiler_options

    jit_multi = jax.jit(multi_step_fn, donate_argnums=0,
                        compiler_options=tuned_compiler_options())
    jit_test = jax.jit(test_fn)

    logger = MetricLogger(out_dir)
    bs = cfg.batch_size
    nr_batches = len(trainx) // bs
    key = jax.random.PRNGKey(cfg.seed)

    def stack(arr, idx, t0, t1):
        sel = idx[t0 * bs : t1 * bs]
        return jnp.asarray(arr[sel].reshape(t1 - t0, bs, *arr.shape[1:]))

    for epoch in range(cfg.epochs):
        # tiled shuffled labeled stream (:145-152) + two unlabeled streams
        reps = len(trainx) // len(txs)
        lab_idx = np.concatenate([rng.permutation(len(txs)) for _ in range(reps)])
        unl1 = rng.permutation(len(trainx))
        unl2 = rng.permutation(len(trainx))

        sums = {"loss_lab": 0.0, "loss_unl": 0.0, "train_err": 0.0, "loss_ct": 0.0}
        n_chunks = 0
        for t0 in range(0, nr_batches, CHUNK):
            t1 = min(t0 + CHUNK, nr_batches)
            if t1 - t0 != CHUNK and t0 > 0:
                break  # drop ragged tail chunk (avoids a second compile)
            state, (metrics, _, _) = jit_multi(
                state,
                stack(txs, lab_idx, t0, t1), stack(tys, lab_idx, t0, t1),
                stack(trainx, unl1, t0, t1), stack(trainx, unl2, t0, t1),
                None, key,
            )
            n_chunks += 1
            for k in sums:
                sums[k] += float(metrics[k])
        nr_batches_eff = n_chunks
        test_err = float(np.mean([
            float(jit_test(state, jnp.asarray(testx[i : i + bs]), jnp.asarray(testy[i : i + bs])))
            for i in range(0, len(testx) - bs + 1, bs)
        ]))
        for k, v in sums.items():
            logger.plot(k, v / max(nr_batches_eff, 1))
        logger.plot("test_err", test_err)
        logger.tick()
        logger.flush()
        save_checkpoint(f"{out_dir}/disc_params.npz", state.disc_params)
        save_checkpoint(f"{out_dir}/gen_params.npz", state.gen_params)
    return state


if __name__ == "__main__":
    main()
