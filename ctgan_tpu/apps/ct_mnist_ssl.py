"""Semi-supervised CT classifier, 100-label MNIST (rebuild of CT_MNIST.py).

Feature-matching GAN classifier with the consistency term between two
noise-perturbed passes, EMA parameter averaging for test, data-dependent
weight-norm init.  ``--count`` labels per class (default 10 -> 100 labels).

``--epoch_scan true`` runs the whole epoch as ONE device program (dataset
HBM-resident, permutation indices in, metrics out) plus a single-dispatch
test sweep — the same execution mode the CIFAR SSL app uses (measured ~7x
on the tunneled chip, where the chunked path pays ~100 test-batch round
trips per epoch).  Both modes draw each epoch's shuffles from a
(seed, epoch)-keyed RNG, so epoch-level crash/resume (``ssl_state.npz``)
replays the exact data order — superseding train_loop_2.py:123-139's
generator fast-forward.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..core import init_context, rng_context, split_params
from ..data import mnist
from ..models import classifiers
from ..train import SslConfig, data_dependent_init, make_ssl_trainer
from ..utils import MetricLogger, load_checkpoint, save_checkpoint
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
    allow_fresh_start: bool = False  # required to train from scratch in an
                                     # out_dir whose log.pkl shows progress
    epoch_scan: bool = False    # ONE dispatch per epoch (see module doc)
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

    _opts = tuned_compiler_options()
    jit_multi = jax.jit(multi_step_fn, donate_argnums=0,
                        compiler_options=_opts)
    jit_test = jax.jit(test_fn)

    def epoch_scan_fn(state, data, lab_idx_s, u1_s, u2_s, key):
        """The whole epoch as one program: device-resident dataset, gathers
        by permutation index inside the scan body."""
        txs_d, tys_d, trainx_d = data

        def body(st, inp):
            li, u1, u2 = inp
            st, out = step_fn(
                st, txs_d[li], tys_d[li], trainx_d[u1], trainx_d[u2], None, key
            )
            return st, out

        state, (mstack, _, _) = jax.lax.scan(body, state, (lab_idx_s, u1_s, u2_s))
        return state, {k: jnp.mean(v) for k, v in mstack.items()}

    def test_sweep_fn(state, xs, ys):
        """All test batches in one scanned program -> mean error."""

        def body(carry, inp):
            x, y = inp
            return carry + test_fn(state, x, y), None

        total, _ = jax.lax.scan(body, jnp.zeros(()), (xs, ys))
        return total / xs.shape[0]

    jit_epoch = jax.jit(epoch_scan_fn, donate_argnums=0, compiler_options=_opts)
    jit_test_sweep = jax.jit(test_sweep_fn)

    logger = MetricLogger(out_dir)
    bs = cfg.batch_size
    n = len(trainx)
    nr_batches = n // bs
    key = jax.random.PRNGKey(cfg.seed)

    if cfg.epoch_scan:
        dev_data = (jnp.asarray(txs), jnp.asarray(tys), jnp.asarray(trainx))
        nb_test = len(testx) // bs
        test_xs = jnp.asarray(testx[: nb_test * bs].reshape(nb_test, bs, *testx.shape[1:]))
        test_ys = jnp.asarray(testy[: nb_test * bs].reshape(nb_test, bs))

    # epoch-level crash/resume (mirrors ct_cifar_ssl): (seed, epoch)-derived
    # permutations make the resumed order exact in either execution mode
    from ..train.trainer_semisup import SslState

    from ..utils.resume import guard_fresh_start, reap_stale_tmps, resolve_ssl_resume

    reap_stale_tmps(out_dir)
    ckpt_path = f"{out_dir}/ssl_state.npz"
    mode, start_epoch, blob = resolve_ssl_resume(
        out_dir, ckpt_path, allow_fresh_start=cfg.allow_fresh_start
    )
    if mode == "exact":
        saved = blob
        state = SslState(**{
            k: (jax.tree.map(jnp.asarray, saved["state"][k])
                if k != "step" else jnp.asarray(saved["state"][k]))
            for k in SslState._fields
        })
        logger.set_iteration(start_epoch)  # absolute epoch labels post-resume
        print(f"resumed from {ckpt_path} at epoch {start_epoch}")
    elif mode == "approx":
        # full state lost (round-boundary clean): params restored exactly
        # from the tracked files, optimizer/EMA re-warmed (utils/resume.py)
        disc_path, gen_path = blob
        disc = {k: jnp.asarray(v) for k, v in load_checkpoint(disc_path).items()}
        gen = {k: jnp.asarray(v) for k, v in load_checkpoint(gen_path).items()}
        state = init_state(disc, gen)
        avg_path = f"{out_dir}/avg_params.npz"
        avg = (
            {k: jnp.asarray(v) for k, v in load_checkpoint(avg_path).items()}
            if os.path.exists(avg_path)
            else jax.tree.map(jnp.array, disc)
        )
        state = state._replace(avg_params=avg)
        logger.set_iteration(start_epoch)
        print(
            f"resumed (approximate) from {disc_path} + log.pkl at epoch "
            f"{start_epoch}: params exact, optimizer/EMA re-warmed"
        )
    else:
        guard_fresh_start(
            out_dir, 0, allow_fresh_start=cfg.allow_fresh_start, unit="epoch"
        )

    def stack(arr, idx, t0, t1):
        sel = idx[t0 * bs : t1 * bs]
        return jnp.asarray(arr[sel].reshape(t1 - t0, bs, *arr.shape[1:]))

    # Hang detection for the tunneled chip: one beat per epoch; a wedged
    # runtime call exits the process so the queue retries and the exact
    # epoch-level resume above picks up (utils/watchdog.py).
    from ctgan_tpu.utils.watchdog import StepWatchdog

    watchdog = StepWatchdog.start_from_env(name="ct_mnist_ssl")
    try:
        for epoch in range(start_epoch, cfg.epochs):
            # tiled shuffled labeled stream (:145-152) + two unlabeled streams
            erng = np.random.default_rng((cfg.seed, epoch))
            reps = int(np.ceil(n / len(txs)))
            lab_idx = np.concatenate([erng.permutation(len(txs)) for _ in range(reps)])[:n]
            unl1 = erng.permutation(n)
            unl2 = erng.permutation(n)

            sums = {"loss_lab": 0.0, "loss_unl": 0.0, "train_err": 0.0, "loss_ct": 0.0}
            if cfg.epoch_scan:
                m = nr_batches * bs
                idx_s = lambda a: jnp.asarray(a[:m].reshape(nr_batches, bs).astype("int32"))
                state, metrics = jit_epoch(
                    state, dev_data, idx_s(lab_idx), idx_s(unl1), idx_s(unl2), key
                )
                for k in sums:
                    sums[k] += float(metrics[k])
                nr_batches_eff = 1
            else:
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
                nr_batches_eff = max(n_chunks, 1)
            if cfg.epoch_scan:
                test_err = float(jit_test_sweep(state, test_xs, test_ys))
            else:
                test_err = float(np.mean([
                    float(jit_test(state, jnp.asarray(testx[i : i + bs]), jnp.asarray(testy[i : i + bs])))
                    for i in range(0, len(testx) - bs + 1, bs)
                ]))
            for k, v in sums.items():
                logger.plot(k, v / nr_batches_eff)
            logger.plot("test_err", test_err)
            logger.tick()
            logger.flush()
            save_checkpoint(f"{out_dir}/disc_params.npz", state.disc_params)
            save_checkpoint(f"{out_dir}/gen_params.npz", state.gen_params)
            save_checkpoint(f"{out_dir}/avg_params.npz", state.avg_params)
            save_checkpoint(ckpt_path, {"state": state._asdict(), "epoch": epoch})
            watchdog.beat()
    finally:
        watchdog.stop()
    return state


if __name__ == "__main__":
    main()
