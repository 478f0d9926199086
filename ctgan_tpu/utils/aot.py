"""Ahead-of-time compiled serving executables (save / load / validate).

The reference framework has no inference entry point at all (sampling is
inlined in its training scripts, e.g. ``CT_gan_cifar_resnet.py``'s
``generate_image``); serving is this repo's own addition, so it has to be
production-grade.  Round 4 measured the cold-start problem: the flagship
batch-1024 serve program paid 394 s (fp32) / 1194 s (bf16) of XLA compile
in a fresh process.  Two complementary fixes:

* the persistent compilation cache (``utils/compile_cache.py``) removes
  the cost for later processes on the SAME machine + cache dir;
* this module turns the compiled executable into an explicit, shippable
  artifact (the TPU analogue of a TensorRT engine or an AOTInductor
  ``.pt2``): ``save_aot`` serializes a ``jax.stages.Compiled`` binary +
  its arg/result pytrees, ``load_aot`` rehydrates it in any process on
  matching hardware with ZERO compilation — a serving fleet ships the
  artifact next to the weights checkpoint.

The artifact is weight-independent: parameters are a runtime input of the
compiled program, so one artifact serves every checkpoint of its model.
It IS specific to jax version, device kind, and the traced shapes —
``load_aot`` validates all three against the recorded metadata and fails
with an actionable error instead of a runtime crash.
"""

from __future__ import annotations

import pickle
import time
from typing import Any, Callable

import jax

__all__ = ["save_aot", "load_aot", "AotMismatch"]

_MAGIC = "ctgan-tpu-aot-v1"


class AotMismatch(RuntimeError):
    """The AOT artifact cannot run in this environment (version/device)."""


def _env_meta() -> dict:
    return {
        "jax_version": jax.__version__,
        "device_kind": jax.devices()[0].device_kind,
        "platform": jax.devices()[0].platform,
        "n_devices": jax.device_count(),
    }


def save_aot(path: str, compiled: "jax.stages.Compiled",
             meta: dict | None = None) -> dict:
    """Serialize a compiled executable (+pytrees, +environment metadata).

    Returns the metadata dict written.  Raises ``ValueError`` if the
    backend's compilation does not support serialization (the caller
    should fall back to the persistent compile cache).
    """
    from jax.experimental import serialize_executable as se

    payload, in_tree, out_tree = se.serialize(compiled)
    try:  # devices the program was compiled for (≠ process device count)
        n_exec = len(compiled._executable.xla_executable.local_devices())
    except AttributeError:
        n_exec = 1
    record = {
        "magic": _MAGIC,
        "exec_n_devices": n_exec,
        "env": _env_meta(),
        "meta": dict(meta or {}),
        "in_tree": in_tree,
        "out_tree": out_tree,
        "payload": payload,
    }
    tmp = f"{path}.tmp"
    with open(tmp, "wb") as fh:
        pickle.dump(record, fh, protocol=pickle.HIGHEST_PROTOCOL)
    import os

    os.replace(tmp, path)  # atomic, same contract as utils/checkpoint.py
    return {**record["env"], **record["meta"]}


def load_aot(path: str, strict: bool = True) -> tuple[Callable[..., Any], dict]:
    """Rehydrate an AOT artifact; returns ``(callable, meta)``.

    ``strict=True`` raises :class:`AotMismatch` when the recorded jax
    version / device kind / platform differ from this process (running a
    mismatched binary risks SIGILL or silent miscompiles); ``strict=False``
    downgrades that to a stderr warning for expert use.

    The returned callable has the original (tree-structured) signature of
    the jitted function and pays only deserialization — no tracing, no
    compilation.  ``meta['load_sec']`` records what that cost.
    """
    import sys

    from jax.experimental import serialize_executable as se

    t0 = time.perf_counter()
    with open(path, "rb") as fh:
        record = pickle.load(fh)
    if record.get("magic") != _MAGIC:
        raise AotMismatch(f"{path} is not a {_MAGIC} artifact")
    env, here = record["env"], _env_meta()
    mismatches = {k: (env[k], here[k]) for k in ("jax_version", "device_kind",
                                                 "platform")
                  if env.get(k) != here[k]}
    if mismatches:
        msg = (f"AOT artifact {path} was built for a different environment: "
               + ", ".join(f"{k}={a!r} (here {b!r})"
                           for k, (a, b) in mismatches.items())
               + ". Rebuild with --aot_save on this environment, or serve "
                 "via jit + the persistent compile cache.")
        if strict:
            raise AotMismatch(msg)
        print(f"warning: {msg}", file=sys.stderr)
    # Bind to exactly the devices the program was compiled for — a process
    # with MORE devices (e.g. the 8-virtual-device test mesh) would
    # otherwise shard-mismatch at execute time.
    n_exec = record.get("exec_n_devices", 1)
    if n_exec > jax.device_count():
        raise AotMismatch(
            f"{path} was compiled for {n_exec} devices; this process has "
            f"{jax.device_count()}")
    loaded = se.deserialize_and_load(
        record["payload"], record["in_tree"], record["out_tree"],
        execution_devices=jax.devices()[:n_exec])  # jax.stages.Compiled
    meta = {**record["meta"], "env": env,
            "load_sec": round(time.perf_counter() - t0, 3)}
    return loaded, meta
