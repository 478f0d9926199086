"""Resume durability: fresh-start guards, approximate resume, tmp reaping,
ndjson backfill (ctgan_tpu/utils/resume.py + MetricLogger._backfill_ndjson).

Closes the round-4 incident class: a round-boundary clean deleted the
untracked heavyweight resume state (``ssl_state.npz``) while the tracked
params + ``log.pkl`` survived, and the next leg silently restarted from
epoch 0, overwriting ~500 epochs.  The reference's resume
(train_loop_2.py:123-143) has the same hole; these tests pin the three
defenses that close it.
"""

import json
import os
import pickle

import numpy as np
import pytest

from ctgan_tpu.utils.resume import (
    guard_fresh_start,
    logged_progress,
    reap_stale_tmps,
    resolve_ssl_resume,
)


def _write_log(out_dir, upto, metric="loss"):
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "log.pkl"), "wb") as f:
        pickle.dump({metric: {i: float(i) for i in range(1, upto + 1)}}, f)


# ---------------------------------------------------------------- units


def test_logged_progress(tmp_path):
    assert logged_progress(str(tmp_path)) == 0
    _write_log(str(tmp_path), 42)
    assert logged_progress(str(tmp_path)) == 42


def test_logged_progress_corrupt_pickle(tmp_path):
    (tmp_path / "log.pkl").write_bytes(b"not a pickle")
    assert logged_progress(str(tmp_path)) == 0


def test_reap_stale_tmps(tmp_path):
    (tmp_path / "tmpabc.npz.tmp").write_bytes(b"x" * 100)
    (tmp_path / "keep.npz").write_bytes(b"y")
    reaped = reap_stale_tmps(str(tmp_path))
    assert len(reaped) == 1
    assert not (tmp_path / "tmpabc.npz.tmp").exists()
    assert (tmp_path / "keep.npz").exists()


def test_guard_raises_on_silent_fresh_start(tmp_path):
    _write_log(str(tmp_path), 50)
    with pytest.raises(SystemExit, match="REFUSING"):
        guard_fresh_start(str(tmp_path), 0)


def test_guard_tolerance_covers_save_cadence(tmp_path):
    # logs flush more often than checkpoints: resume at 48 with logs to 50
    # and cadence 5 is a legitimate resume, not a fresh start
    _write_log(str(tmp_path), 50)
    guard_fresh_start(str(tmp_path), 48, tolerance=5)
    with pytest.raises(SystemExit):
        guard_fresh_start(str(tmp_path), 40, tolerance=5)


def test_guard_explicit_overrides(tmp_path, monkeypatch):
    _write_log(str(tmp_path), 50)
    guard_fresh_start(str(tmp_path), 0, allow_fresh_start=True)
    monkeypatch.setenv("CTGAN_ALLOW_FRESH_START", "1")
    guard_fresh_start(str(tmp_path), 0)


def test_guard_clean_dir_is_free(tmp_path):
    guard_fresh_start(str(tmp_path), 0)


# ------------------------------------------------- resolve_ssl_resume


def _write_state(out_dir, epoch):
    from ctgan_tpu.utils import save_checkpoint

    path = os.path.join(out_dir, "ssl_state.npz")
    save_checkpoint(path, {"epoch": epoch, "state": {"w": np.ones(2)}})
    return path


def _write_params(out_dir):
    from ctgan_tpu.utils import save_checkpoint

    for name in ("disc_params.npz", "gen_params.npz"):
        save_checkpoint(os.path.join(out_dir, name), {"w": np.ones(2)})


def test_resolve_exact(tmp_path):
    out = str(tmp_path)
    _write_log(out, 10)
    ckpt = _write_state(out, 9)  # epoch 9 done -> start 10 == logged
    mode, start, blob = resolve_ssl_resume(out, ckpt)
    assert mode == "exact" and start == 10
    assert int(blob["epoch"]) == 9


def test_resolve_stale_state_prefers_tracked_params(tmp_path, capsys):
    # the round-4 incident shape: state clobbered back to epoch 67 while
    # the log proves 500 -> approximate resume from params at 500
    out = str(tmp_path)
    _write_log(out, 500)
    ckpt = _write_state(out, 67)
    _write_params(out)
    mode, start, blob = resolve_ssl_resume(out, ckpt)
    assert mode == "approx" and start == 500
    assert blob == (os.path.join(out, "disc_params.npz"),
                    os.path.join(out, "gen_params.npz"))
    assert "STALE" in capsys.readouterr().out


def test_resolve_missing_state_approx_from_params(tmp_path):
    out = str(tmp_path)
    _write_log(out, 500)
    _write_params(out)
    mode, start, _ = resolve_ssl_resume(out, os.path.join(out, "none.npz"))
    assert mode == "approx" and start == 500


def test_resolve_state_without_log_is_exact(tmp_path):
    out = str(tmp_path)
    ckpt = _write_state(out, 3)
    mode, start, _ = resolve_ssl_resume(out, ckpt)
    assert mode == "exact" and start == 4


def test_resolve_nothing_guards(tmp_path):
    out = str(tmp_path)
    _write_log(out, 500)  # progress logged but no state AND no params
    with pytest.raises(SystemExit, match="REFUSING"):
        resolve_ssl_resume(out, os.path.join(out, "none.npz"))
    mode, start, _ = resolve_ssl_resume(
        out, os.path.join(out, "none.npz"), allow_fresh_start=True
    )
    assert mode == "fresh" and start == 0


def test_resolve_clean_dir_fresh(tmp_path):
    mode, start, _ = resolve_ssl_resume(
        str(tmp_path), str(tmp_path / "none.npz")
    )
    assert mode == "fresh" and start == 0


# ------------------------------------------------------ ndjson backfill


def test_ndjson_backfilled_from_pkl(tmp_path):
    from ctgan_tpu.utils import MetricLogger

    _write_log(str(tmp_path), 5)
    MetricLogger(str(tmp_path))
    rows = [json.loads(l) for l in (tmp_path / "log.ndjson").read_text().splitlines()]
    assert [r["iteration"] for r in rows] == [1, 2, 3, 4, 5]
    assert all(r["backfilled"] and r["loss"] == r["iteration"] for r in rows)


def test_ndjson_behind_is_rebuilt(tmp_path):
    # round-4 shape: ndjson holds only the clobbering leg's rows while the
    # pickle holds the full history
    from ctgan_tpu.utils import MetricLogger

    _write_log(str(tmp_path), 500)
    (tmp_path / "log.ndjson").write_text(
        "\n".join(json.dumps({"iteration": i, "loss": 0.0}) for i in range(1, 70))
        + "\n"
    )
    MetricLogger(str(tmp_path))
    rows = (tmp_path / "log.ndjson").read_text().splitlines()
    assert len(rows) == 500
    assert json.loads(rows[-1])["iteration"] == 500


def test_ndjson_current_untouched(tmp_path):
    from ctgan_tpu.utils import MetricLogger

    _write_log(str(tmp_path), 3)
    orig = (
        "\n".join(
            json.dumps({"iteration": i, "loss": float(i), "wall_time": 1.0})
            for i in (1, 2, 3)
        )
        + "\n"
    )
    (tmp_path / "log.ndjson").write_text(orig)
    MetricLogger(str(tmp_path))
    assert (tmp_path / "log.ndjson").read_text() == orig


# ------------------------------------------------- end-to-end (tiny SSL)


def _small_mnist(monkeypatch):
    import ctgan_tpu.data.mnist as mnist_mod

    def small(path=None, n_examples=None):
        from ctgan_tpu.data.synthetic import synthetic_mnist

        tr, dev, te = synthetic_mnist(500, 100, 200)
        return {"train": tr, "dev": dev, "test": te}

    monkeypatch.setattr(mnist_mod, "load_arrays", small)


def test_mnist_ssl_approx_resume_after_state_loss(tmp_path, monkeypatch, capsys):
    """Delete ssl_state.npz mid-schedule: the app must NOT restart from
    epoch 0 — it resumes approximately from the tracked params + log.pkl
    (the round-4 incident, now caught)."""
    from ctgan_tpu.apps.ct_mnist_ssl import Config, main
    from ctgan_tpu.utils import load_checkpoint

    _small_mnist(monkeypatch)
    base = dict(batch_size=100, count=10, epoch_scan=True,
                out_dir=str(tmp_path))
    main(cfg=Config(**base, epochs=2))
    os.unlink(tmp_path / "ssl_state.npz")  # the round-boundary clean
    capsys.readouterr()
    main(cfg=Config(**base, epochs=3))
    out = capsys.readouterr().out
    assert "resumed (approximate)" in out
    assert "epoch 2" in out
    saved = load_checkpoint(str(tmp_path / "ssl_state.npz"))
    assert int(saved["epoch"]) == 2  # trained exactly epoch index 2


def test_mnist_ssl_refuses_silent_fresh_start(tmp_path, monkeypatch):
    """With state AND params gone but log.pkl showing progress, the app
    refuses to train unless --allow_fresh_start."""
    from ctgan_tpu.apps.ct_mnist_ssl import Config, main

    _small_mnist(monkeypatch)
    base = dict(batch_size=100, count=10, epoch_scan=True,
                out_dir=str(tmp_path))
    main(cfg=Config(**base, epochs=2))
    for name in ("ssl_state.npz", "disc_params.npz", "gen_params.npz"):
        os.unlink(tmp_path / name)
    with pytest.raises(SystemExit, match="REFUSING"):
        main(cfg=Config(**base, epochs=3))
    main(cfg=Config(**base, epochs=1, allow_fresh_start=True))


def test_gan_loop_params_latest_fallback(tmp_path):
    """train_loop: big ckpt_N.npz files lost, the small params_latest.npz
    survives -> approximate resume restores params + iteration counter."""
    import shutil

    from ctgan_tpu.apps.ct_gan_mnist import Config, main

    cfg = Config(DIM=8, BATCH_SIZE=8, ITERS=2, n_examples=64,
                 sample_every=10, save_every=2, out_dir=str(tmp_path))
    main(cfg=cfg)
    assert os.path.exists(tmp_path / "params_latest.npz")
    shutil.rmtree(tmp_path / "ckpt")  # the round-boundary clean
    cfg2 = Config(DIM=8, BATCH_SIZE=8, ITERS=4, n_examples=64,
                  sample_every=10, save_every=2, out_dir=str(tmp_path))
    state = main(cfg=cfg2)
    assert int(state.step) == 4  # 2 resumed + 2 trained, not 4 from scratch


def test_gan_loop_refuses_silent_fresh_start(tmp_path):
    import shutil

    from ctgan_tpu.apps.ct_gan_mnist import Config, main

    cfg = Config(DIM=8, BATCH_SIZE=8, ITERS=6, n_examples=64,
                 sample_every=10, save_every=2, out_dir=str(tmp_path))
    main(cfg=cfg)
    shutil.rmtree(tmp_path / "ckpt")
    os.unlink(tmp_path / "params_latest.npz")
    with pytest.raises(SystemExit, match="REFUSING"):
        main(cfg=Config(DIM=8, BATCH_SIZE=8, ITERS=8, n_examples=64,
                        sample_every=10, save_every=2,
                        out_dir=str(tmp_path)))
