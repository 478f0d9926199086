"""Semi-supervised CT classifier, 4000-label CIFAR-10 (rebuild of
CT_CIFAR.py), with optional temporal ensembling (rebuild of
CT_CIFAR-10_TE.py via ``--temporal_ensembling true``).

Key TPU redesign: the reference's per-epoch host Python augmentation loop
(100k single-image crops, CT_CIFAR.py:203-265 — the pipeline bottleneck)
becomes an on-device vectorized flip/crop *inside the jitted step*
(ctgan_tpu.data.augment.random_crop_flip), preserving the two-independent-
streams property the CT term needs.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..core import init_context, rng_context, split_params
from ..data import cifar10
from ..data.augment import random_crop_flip
from ..losses.semisup import ema_targets_update
from ..models import classifiers
from ..train import SslConfig, data_dependent_init, make_ssl_trainer
from ..utils import MetricLogger, load_checkpoint, save_checkpoint
from .common import parse_config, setup_out_dir


@dataclass(frozen=True)
class Config:
    seed: int = 2
    seed_data: int = 2
    count: int = 400            # labels per class -> 4000 (CT_CIFAR.py:25)
    batch_size: int = 100
    unlabeled_weight: float = 1.0
    learning_rate: float = 3e-4
    epochs: int = 1000
    data_dir: str = ""
    temporal_ensembling: bool = False
    prediction_decay: float = 0.6   # CT_CIFAR-10_TE.py:23
    LAMBDA_2: float = 1.0           # TE variant weight (TE:22); plain uses fixed weights
    factor_M: float = 0.0
    allow_fresh_start: bool = False  # required to train from scratch in an
                                     # out_dir whose log.pkl shows progress
                                     # (utils/resume.py fresh-start guard)
    chunk: int = 1                  # batches per device dispatch; raise (e.g.
                                    # 25) on TPU to amortize dispatch latency.
                                    # Default 1: scanning this conv step
                                    # compiles pathologically slowly on CPU XLA
    epoch_scan: bool = False        # device-resident data + ONE dispatch per
                                    # epoch (indices in, metrics out) and a
                                    # single-dispatch test sweep.  The r2 chip
                                    # run paid ~120 tunnel round trips/epoch
                                    # (~150 s); this runs the full reference
                                    # 1000-epoch schedule in device time.
    out_dir: str = "runs/ct_cifar_ssl"


def main(argv=None, cfg: Config | None = None):
    cfg = cfg or parse_config(Config, argv)
    out_dir = setup_out_dir(cfg)
    rng = np.random.default_rng(cfg.seed)
    data_rng = np.random.default_rng(cfg.seed_data)

    trainx_nchw, trainy = cifar10.load_normalized(cfg.data_dir or None, "train")
    testx_nchw, testy = cifar10.load_normalized(cfg.data_dir or None, "test")
    # NHWC for the on-device pipeline
    trainx = trainx_nchw.transpose(0, 2, 3, 1)
    testx = testx_nchw.transpose(0, 2, 3, 1)

    inds = data_rng.permutation(len(trainx))
    sx, sy = trainx[inds], trainy[inds]
    txs, tys = [], []
    for j in range(10):
        txs.append(sx[sy == j][: cfg.count])
        tys.append(sy[sy == j][: cfg.count])
    txs, tys = np.concatenate(txs), np.concatenate(tys)

    with init_context(seed=cfg.seed) as ctx:
        with rng_context(jax.random.PRNGKey(cfg.seed)):
            classifiers.cifar_ssl_classifier(jnp.zeros((2, 32, 32, 3)))
            classifiers.cifar_ssl_generator(2)
    disc, gen, rest = split_params(ctx.params, "Classifier", "Generator")
    assert not rest
    merged = data_dependent_init(
        {**disc, **gen},
        lambda: classifiers.cifar_ssl_classifier(jnp.asarray(trainx[:500]), dd_init=True),
        jax.random.PRNGKey(cfg.seed),
    )
    disc = {k: v for k, v in merged.items() if k.startswith("Classifier")}

    variant = "te" if cfg.temporal_ensembling else "cifar"
    scfg = SslConfig(
        variant=variant, unlabeled_weight=cfg.unlabeled_weight,
        lr=cfg.learning_rate, lambda_2=cfg.LAMBDA_2, factor_m=cfg.factor_M,
    )
    init_state, raw_step_fn, test_fn, multi_step_fn = make_ssl_trainer(
        classifiers.cifar_ssl_classifier, classifiers.cifar_ssl_generator, scfg
    )
    state = init_state(disc, gen)

    def step_with_augment(state, x_lab, y, x_unl, x_unl2, targets, key):
        """On-device augmentation: labeled stream + two independent
        unlabeled streams (CT_CIFAR.py:203-265, vectorized)."""
        k0, k1, k2, k3 = jax.random.split(jax.random.fold_in(key, state.step), 4)
        x_lab = random_crop_flip(x_lab, k1)
        x_unl = random_crop_flip(x_unl, k2)
        x_unl2 = random_crop_flip(x_unl2, k3)
        return raw_step_fn(state, x_lab, y, x_unl, x_unl2, targets, key)

    def multi_step_with_augment(state, xl_s, yl_s, xu_s, xu2_s, targets_s, key):
        """lax.scan of the augmented step over CHUNK stacked batches — one
        device dispatch per chunk; augmentation keys vary with state.step."""

        def body(st, inp):
            if targets_s is None:
                xl, yl, xu, xu2 = inp
                tg = None
            else:
                xl, yl, xu, xu2, tp, tf = inp
                tg = (tp, tf)
            st, out = step_with_augment(st, xl, yl, xu, xu2, tg, key)
            return st, out

        xs = (
            (xl_s, yl_s, xu_s, xu2_s)
            if targets_s is None
            else (xl_s, yl_s, xu_s, xu2_s, targets_s[0], targets_s[1])
        )
        state, (mstack, probs, feats) = jax.lax.scan(body, state, xs)
        return state, ({k: jnp.mean(v) for k, v in mstack.items()}, probs, feats)

    def epoch_scan_fn(state, data, lab_idx_s, u1_s, u2_s, targets_dev, key):
        """The whole epoch as ONE program: device-resident dataset, gathers
        by permutation index inside the scan body — zero host staging and a
        single dispatch/readback per epoch."""
        txs_d, tys_d, trainx_d = data

        def body(st, inp):
            li, u1, u2 = inp
            tg = None
            if targets_dev is not None:
                tg = (targets_dev[0][u1], targets_dev[1][u1])
            st, out = step_with_augment(
                st, txs_d[li], tys_d[li], trainx_d[u1], trainx_d[u2], tg, key
            )
            return st, out

        state, (mstack, probs, feats) = jax.lax.scan(
            body, state, (lab_idx_s, u1_s, u2_s)
        )
        return state, ({k: jnp.mean(v) for k, v in mstack.items()}, probs, feats)

    def test_sweep_fn(state, xs, ys):
        """All test batches in one scanned program -> mean error."""
        def body(carry, inp):
            x, y = inp
            return carry + test_fn(state, x, y), None

        total, _ = jax.lax.scan(body, jnp.zeros(()), (xs, ys))
        return total / xs.shape[0]

    CHUNK = cfg.chunk
    from ctgan_tpu.core import tuned_compiler_options

    _opts = tuned_compiler_options()
    jit_step = jax.jit(step_with_augment, donate_argnums=0,
                       compiler_options=_opts)
    jit_multi = jax.jit(multi_step_with_augment, donate_argnums=0,
                        compiler_options=_opts)
    jit_test = jax.jit(test_fn)
    jit_epoch = jax.jit(epoch_scan_fn, donate_argnums=0,
                        compiler_options=_opts)
    jit_test_sweep = jax.jit(test_sweep_fn)
    logger = MetricLogger(out_dir)
    bs = cfg.batch_size
    n = len(trainx)
    nr_batches = n // bs
    key = jax.random.PRNGKey(cfg.seed)

    # temporal-ensembling buffers (TE:177-180)
    ensemble = np.zeros((n, 10), "float32")
    ensemble2 = np.zeros((n, 128), "float32")
    targets_np = np.zeros((n, 10), "float32")
    targets2_np = np.zeros((n, 128), "float32")

    if cfg.epoch_scan:
        # dataset to HBM once; epochs feed only [nr_batches, bs] index arrays
        dev_data = (jnp.asarray(txs), jnp.asarray(tys), jnp.asarray(trainx))
        # match the chunked path's batch count: range(0, len-bs+1, bs) visits
        # len//bs batches ((len-bs+1)//bs under-counts by one and is 0 when
        # len == bs, which made the scanned sweep drop a full test batch)
        nb_test = len(testx) // bs
        test_xs = jnp.asarray(testx[: nb_test * bs].reshape(nb_test, bs, *testx.shape[1:]))
        test_ys = jnp.asarray(testy[: nb_test * bs].reshape(nb_test, bs))

    # epoch-level crash/resume: full (state, TE buffers, epoch) saved each
    # epoch; per-epoch permutations derive from (seed, epoch) so resumed
    # runs replay the exact data order with no generator fast-forward
    # (supersedes train_loop_2.py:123-139's replay approach).  When the full
    # state is gone but the tracked params + log.pkl survive (round-4 data
    # loss incident), resume APPROXIMATELY: params exact, epoch from the
    # log, optimizer/EMA/ensembles re-warmed (utils/resume.py).
    from ..train.trainer_semisup import SslState
    from ..utils.resume import guard_fresh_start, reap_stale_tmps, resolve_ssl_resume

    reap_stale_tmps(out_dir)
    ckpt_path = f"{out_dir}/ssl_state.npz"
    mode, start_epoch, blob = resolve_ssl_resume(
        out_dir, ckpt_path, allow_fresh_start=cfg.allow_fresh_start
    )
    # epoch at which the TE ensemble buffers began accumulating — the EMA
    # bias correction 1-decay^k counts updates SINCE this epoch, so a
    # re-warmed ensemble replays the reference's epoch-0 warmup transient
    # (CT_CIFAR-10_TE.py:305-309) instead of dividing ~zero by ~one.
    ens_base = 0
    import os as _os

    if mode == "exact":
        saved = blob
        state = SslState(**{
            k: (jax.tree.map(jnp.asarray, saved["state"][k])
                if k != "step" else jnp.asarray(saved["state"][k]))
            for k in SslState._fields
        })
        ensemble = np.asarray(saved["ensemble"])
        ensemble2 = np.asarray(saved["ensemble2"])
        targets_np = np.asarray(saved["targets"])
        targets2_np = np.asarray(saved["targets2"])
        ens_base = int(saved.get("ens_base", 0))
        logger.set_iteration(start_epoch)  # absolute epoch labels post-resume
        print(f"resumed from {ckpt_path} at epoch {start_epoch}")
    elif mode == "approx":
        disc_path, gen_path = blob
        disc = {k: jnp.asarray(v) for k, v in load_checkpoint(disc_path).items()}
        gen = {k: jnp.asarray(v) for k, v in load_checkpoint(gen_path).items()}
        state = init_state(disc, gen)
        avg_path = f"{out_dir}/avg_params.npz"
        avg = (
            {k: jnp.asarray(v) for k, v in load_checkpoint(avg_path).items()}
            if _os.path.exists(avg_path)
            # no tracked EMA snapshot: seed the test-path average at the
            # current params (the 0-init of CT_MNIST.py:104 would need
            # ~2/ema_rate steps to recover)
            else jax.tree.map(jnp.array, disc)
        )
        state = state._replace(avg_params=avg)
        ens_base = start_epoch
        logger.set_iteration(start_epoch)
        print(
            f"resumed (approximate) from {disc_path} + log.pkl at epoch "
            f"{start_epoch}: params exact, optimizer/ensemble re-warmed"
        )
    else:
        guard_fresh_start(
            out_dir, 0, allow_fresh_start=cfg.allow_fresh_start, unit="epoch"
        )

    # Hang detection for the tunneled chip: one beat per epoch; a wedged
    # runtime call exits the process so the queue retries and the exact
    # epoch-level resume above picks up (utils/watchdog.py).
    from ctgan_tpu.utils.watchdog import StepWatchdog

    watchdog = StepWatchdog.start_from_env(name="ct_cifar_ssl")
    try:
        for epoch in range(start_epoch, cfg.epochs):
            erng = np.random.default_rng((cfg.seed, epoch))
            reps = int(np.ceil(n / len(txs)))
            lab_idx = np.concatenate([erng.permutation(len(txs)) for _ in range(reps)])[:n]
            unl1 = erng.permutation(n)
            unl2 = erng.permutation(n)

            epoch_preds = np.zeros((n, 10), "float32")
            epoch_preds2 = np.zeros((n, 128), "float32")
            sums = {"loss_lab": 0.0, "loss_unl": 0.0, "train_err": 0.0, "loss_gen": 0.0}
            n_calls = 0

            def stack(arr, idx):
                return jnp.asarray(arr[idx].reshape(-1, bs, *arr.shape[1:]))

            if cfg.epoch_scan:
                m = nr_batches * bs
                idx_s = lambda a: jnp.asarray(a[:m].reshape(nr_batches, bs).astype("int32"))
                targets_dev = (
                    (jnp.asarray(targets_np), jnp.asarray(targets2_np))
                    if cfg.temporal_ensembling else None
                )
                state, (metrics, probs, feats) = jit_epoch(
                    state, dev_data, idx_s(lab_idx), idx_s(unl1), idx_s(unl2),
                    targets_dev, key,
                )
                if cfg.temporal_ensembling:
                    u1 = unl1[:m]
                    epoch_preds[u1] = np.asarray(probs).reshape(-1, 10)
                    epoch_preds2[u1] = np.asarray(feats).reshape(-1, 128)
                n_calls = 1
                for k in sums:
                    sums[k] += float(metrics[k])
            else:
                for t0 in range(0, nr_batches, CHUNK):
                    t1 = min(t0 + CHUNK, nr_batches)
                    if t1 - t0 != CHUNK and t0 > 0:
                        break  # drop ragged tail (avoids a second compile)
                    sl = slice(t0 * bs, t1 * bs)
                    li = lab_idx[sl]
                    u1 = unl1[sl]
                    targets = None
                    if cfg.temporal_ensembling:
                        targets = (
                            stack(targets_np, u1), stack(targets2_np, u1)
                        )
                    if CHUNK == 1:
                        tg = None if targets is None else (targets[0][0], targets[1][0])
                        state, (metrics, probs, feats) = jit_step(
                            state,
                            jnp.asarray(txs[li]), jnp.asarray(tys[li]),
                            jnp.asarray(trainx[u1]), jnp.asarray(trainx[unl2[sl]]),
                            tg, key,
                        )
                        probs = probs[None]
                        feats = feats[None]
                    else:
                        state, (metrics, probs, feats) = jit_multi(
                            state,
                            stack(txs, li), stack(tys, li),
                            stack(trainx, u1), stack(trainx, unl2[sl]),
                            targets, key,
                        )
                    if cfg.temporal_ensembling:
                        epoch_preds[u1] = np.asarray(probs).reshape(-1, 10)
                        epoch_preds2[u1] = np.asarray(feats).reshape(-1, 128)
                    n_calls += 1
                    for k in sums:
                        sums[k] += float(metrics[k])

            nr_batches_eff = max(n_calls, 1)

            if cfg.temporal_ensembling:
                # bias-corrected EMA target update (TE:305-309); the update
                # count is epochs since the ensemble started accumulating
                # (== epoch unless this leg resumed approximately)
                ensemble, targets_np = map(np.asarray, ema_targets_update(
                    jnp.asarray(ensemble), jnp.asarray(epoch_preds),
                    epoch - ens_base, decay=cfg.prediction_decay,
                ))
                ensemble2, targets2_np = map(np.asarray, ema_targets_update(
                    jnp.asarray(ensemble2), jnp.asarray(epoch_preds2),
                    epoch - ens_base, decay=cfg.prediction_decay,
                ))

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
            # small tracked EMA snapshot so an approximate resume restores
            # the test path exactly (disc/gen/avg params survive round
            # boundaries in git; ssl_state.npz does not)
            save_checkpoint(f"{out_dir}/avg_params.npz", state.avg_params)
            save_checkpoint(ckpt_path, {
                "state": state._asdict(),
                "ensemble": ensemble, "ensemble2": ensemble2,
                "targets": targets_np, "targets2": targets2_np,
                "epoch": epoch, "ens_base": ens_base,
            })
            watchdog.beat()
    finally:
        watchdog.stop()
    return state


if __name__ == "__main__":
    main()
