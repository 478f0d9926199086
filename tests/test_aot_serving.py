"""AOT serving artifacts (utils/aot.py + generate --aot_save/--aot).

The reference has no inference entry point (sampling inlined in trainers);
serving is this repo's own addition, and round 4 measured its cold-start
tax (394-1194 s compile for the flagship serve program).  The AOT artifact
kills that: ship the compiled executable next to the weights.
"""

import json
import os
import pickle
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctgan_tpu.utils.aot import AotMismatch, load_aot, save_aot


def _tiny_compiled():
    def f(p, x):
        return {"y": p["w"] @ x + p["b"], "m": jnp.mean(x)}

    p = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    x = jnp.arange(4.0)
    return jax.jit(f).lower(p, x).compile(), p, x


def test_roundtrip_bit_exact(tmp_path):
    compiled, p, x = _tiny_compiled()
    path = str(tmp_path / "f.jaxexec")
    meta = save_aot(path, compiled, meta={"model": "tiny"})
    assert meta["model"] == "tiny" and meta["jax_version"] == jax.__version__
    loaded, lmeta = load_aot(path)
    assert lmeta["load_sec"] >= 0
    want, got = compiled(p, x), loaded(p, x)
    assert np.array_equal(np.asarray(want["y"]), np.asarray(got["y"]))
    assert float(want["m"]) == float(got["m"])


def test_env_mismatch_refused_strict_and_warned_lenient(tmp_path, capsys):
    compiled, p, x = _tiny_compiled()
    path = str(tmp_path / "f.jaxexec")
    save_aot(path, compiled)
    with open(path, "rb") as fh:
        record = pickle.load(fh)
    record["env"]["jax_version"] = "0.0.1"
    with open(path, "wb") as fh:
        pickle.dump(record, fh)
    with pytest.raises(AotMismatch, match="0.0.1"):
        load_aot(path)
    loaded, _ = load_aot(path, strict=False)  # expert opt-out: warn only
    assert "different environment" in capsys.readouterr().err
    assert np.array_equal(np.asarray(loaded(p, x)["y"]),
                          np.asarray(compiled(p, x)["y"]))


def test_not_an_artifact_is_refused(tmp_path):
    path = str(tmp_path / "junk.jaxexec")
    with open(path, "wb") as fh:
        pickle.dump({"magic": "nope"}, fh)
    with pytest.raises(AotMismatch, match="not a"):
        load_aot(path)


def _single_device_env():
    env = dict(os.environ)
    # strip the conftest's 8-virtual-device flag: AOT artifacts are
    # single-device by contract (generate.py refuses under a mesh)
    flags = env.get("XLA_FLAGS", "").split()
    env["XLA_FLAGS"] = " ".join(
        f for f in flags if "host_platform_device_count" not in f)
    return env


def _gen(args, env):
    r = subprocess.run(
        [sys.executable, "-m", "ctgan_tpu", "--platform", "cpu",
         "generate", "--model", "mnist", "--dim", "8", "--batch", "8", *args],
        capture_output=True, text=True, timeout=300, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    return r


def test_cross_process_zero_compile_serving(tmp_path):
    """Save the artifact in one process; a FRESH process serves from it
    with compile_sec == 0 and matches the jit path bit-exactly."""
    env = _single_device_env()
    art = str(tmp_path / "mnist_b8.jaxexec")

    _gen(["--aot_save", art], env)
    assert os.path.exists(art)

    # fresh process, AOT serve bench: zero compile by construction
    r = _gen(["--aot", art, "--serve_iters", "5"], env)
    parsed = json.loads(
        [l for l in r.stdout.splitlines() if l.startswith("{")][-1])
    assert parsed["compile_sec"] == 0.0
    assert parsed["request_compile_sec"] < 30  # deserialization, not XLA
    assert parsed["value"] > 0

    # grid path: --aot output == plain jit output for the same checkpoint
    # and seed (full batches only; both processes are single-device)
    from ctgan_tpu.apps.ct_gan_mnist import Config as MnistConfig, main as mnist_main

    mnist_main(cfg=MnistConfig(
        DIM=8, BATCH_SIZE=8, ITERS=1, n_examples=64, sample_every=10,
        save_every=1, out_dir=str(tmp_path)))
    ckpt = str(tmp_path / "ckpt" / "ckpt_1.npz")
    _gen(["--ckpt", ckpt, "--n", "8", "--save_npz", "true",
          "--out_prefix", str(tmp_path / "aot_out"), "--aot", art], env)
    _gen(["--ckpt", ckpt, "--n", "8", "--save_npz", "true",
          "--out_prefix", str(tmp_path / "jit_out")], env)
    a = np.load(tmp_path / "aot_out.npz")["samples"]
    b = np.load(tmp_path / "jit_out.npz")["samples"]
    assert np.array_equal(a, b)
