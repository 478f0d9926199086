"""Generation/serving app: checkpoint -> samples."""

import os

import numpy as np

from ctgan_tpu.apps.generate import Config as GenConfig, load_gen_params, main as gen_main
from ctgan_tpu.apps.ct_gan_mnist import Config as MnistConfig, main as mnist_main


def test_generate_from_checkpoint(tmp_path):
    mnist_main(cfg=MnistConfig(
        DIM=8, BATCH_SIZE=8, ITERS=2, n_examples=64, sample_every=10,
        save_every=2, out_dir=str(tmp_path),
    ))
    ckpt = str(tmp_path / "ckpt" / "ckpt_2.npz")
    samples = gen_main(cfg=GenConfig(
        model="mnist", ckpt=ckpt, n=16, batch=8, dim=8,
        out_prefix=str(tmp_path / "gen"), save_npz=True,
    ))
    assert samples.shape == (16, 784)
    assert os.path.exists(tmp_path / "gen.png")
    assert os.path.exists(tmp_path / "gen.npz")
    params = load_gen_params(ckpt)
    assert all(k.startswith("Generator") for k in params)


def test_serve_bench_fresh_init(capsys):
    # --serve_iters without --ckpt: fresh-init weights, scan-window timed,
    # one JSON line on stdout.
    import json

    r = gen_main(cfg=GenConfig(model="mnist", dim=8, batch=8, serve_iters=6))
    line = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
    parsed = json.loads(line)
    assert parsed == {k: v for k, v in r.items()}
    assert r["value"] > 0 and r["sec_per_batch"] > 0
    assert r["unit"] == "images/sec/chip"
    assert r["params"].startswith("fresh-init")


def test_serve_bench_from_checkpoint(tmp_path):
    mnist_main(cfg=MnistConfig(
        DIM=8, BATCH_SIZE=8, ITERS=2, n_examples=64, sample_every=10,
        save_every=2, out_dir=str(tmp_path),
    ))
    r = gen_main(cfg=GenConfig(
        model="mnist", dim=8, batch=8, serve_iters=6,
        ckpt=str(tmp_path / "ckpt" / "ckpt_2.npz"),
    ))
    assert r["params"] == "checkpoint"
    assert r["value"] > 0


def test_sampling_shards_over_data_mesh(tmp_path):
    # On the 8-virtual-device mesh, sampling batches shard over 'data'
    # (replicated weights, SPMD-partitioned batch) and ragged tails fall
    # back to the unsharded program.
    import jax

    from ctgan_tpu.apps.generate import _apply_call, _mesh_setup, _model_entry

    assert len(jax.devices()) == 8
    cfg = GenConfig(model="mnist", dim=8, batch=8)
    body, _, _ = _model_entry(cfg)
    from ctgan_tpu.apps.generate import _init_gen_params

    params, mesh = _mesh_setup(_init_gen_params(cfg, body))
    assert mesh is not None and mesh.shape["data"] == 8
    call = _apply_call(body)
    from ctgan_tpu.parallel import data_sharding

    out = jax.jit(call, static_argnums=1,
                  out_shardings=data_sharding(mesh, 0, 2))(
        params, 8, jax.random.PRNGKey(0))
    assert len(out.sharding.device_set) == 8

    # sharded == unsharded (same logical program; SPMD is a partition,
    # not a numerics change at fp32 for this generator)
    ref = jax.jit(call, static_argnums=1)(params, 8, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_generate_ragged_tail_on_mesh(tmp_path):
    # n=12, batch=8 on the 8-device mesh: one sharded batch + a ragged
    # 4-sample tail through the fallback program.
    mnist_main(cfg=MnistConfig(
        DIM=8, BATCH_SIZE=8, ITERS=2, n_examples=64, sample_every=10,
        save_every=2, out_dir=str(tmp_path),
    ))
    samples = gen_main(cfg=GenConfig(
        model="mnist", ckpt=str(tmp_path / "ckpt" / "ckpt_2.npz"),
        n=12, batch=8, dim=8, out_prefix=str(tmp_path / "gen"),
    ))
    assert samples.shape == (12, 784)
    assert np.isfinite(samples).all()
