"""Atomic checkpoint/resume.

Supersedes the reference's three mechanisms — TF Saver V2
(wgan_LSUN_Bedrooms128.py:367,394-395), raw ``np.save``/``np.savez`` dumps
(CT_gan_cifar.py:218-222, CT_CIFAR.py:312-313), and the pickled loop state +
generator fast-forward of ``train_loop_2.py:123-194`` (whose own comments
acknowledge corrupt-checkpoint risk on interrupt).

One atomic unit: ``(params, opt_state, loop_state, data_state)`` written as
a single ``.npz`` whose structure descriptor is embedded as a uint8 array
(``__structure_json__``), committed by ONE ``os.replace`` — crash-safe by
construction (no sidecar file that could go stale independently).  Arbitrary
nested dict/NamedTuple pytrees of arrays round-trip exactly.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any

import jax
import numpy as np

__all__ = ["save_checkpoint", "load_checkpoint", "latest_checkpoint"]

_SEP = "/"
_STRUCT_KEY = "__structure_json__"


def _flatten(tree: Any, prefix: str = "") -> tuple[dict, Any]:
    """Flatten nested dict/tuple/NamedTuple of arrays into name->array plus a
    JSON-serializable structure descriptor."""
    if isinstance(tree, dict):
        arrays, struct = {}, {"__kind__": "dict", "items": {}}
        for k in sorted(tree):
            a, s = _flatten(tree[k], f"{prefix}{_SEP}{k}" if prefix else k)
            arrays.update(a)
            struct["items"][k] = s
        return arrays, struct
    if hasattr(tree, "_fields"):  # NamedTuple
        arrays, struct = {}, {
            "__kind__": "namedtuple",
            "cls": type(tree).__name__,
            "fields": list(tree._fields),
            "items": {},
        }
        for k in tree._fields:
            a, s = _flatten(getattr(tree, k), f"{prefix}{_SEP}{k}" if prefix else k)
            arrays.update(a)
            struct["items"][k] = s
        return arrays, struct
    if isinstance(tree, (list, tuple)):
        arrays, struct = {}, {"__kind__": "list" if isinstance(tree, list) else "tuple", "items": []}
        for i, v in enumerate(tree):
            a, s = _flatten(v, f"{prefix}{_SEP}{i}" if prefix else str(i))
            arrays.update(a)
            struct["items"].append(s)
        return arrays, struct
    if tree is None:
        return {}, {"__kind__": "none"}
    if isinstance(tree, (str, bool)):
        return {}, {"__kind__": "scalar", "value": tree}
    if isinstance(tree, (int, float)) and not isinstance(tree, (np.generic,)):
        return {}, {"__kind__": "scalar", "value": tree}
    # array leaf
    return {prefix: np.asarray(tree)}, {"__kind__": "array", "name": prefix}


def _unflatten(struct: Any, arrays: dict) -> Any:
    kind = struct["__kind__"]
    if kind == "dict":
        return {k: _unflatten(s, arrays) for k, s in struct["items"].items()}
    if kind == "namedtuple":
        # rebuilt as a plain dict keyed by field; callers reconstruct their
        # NamedTuple types (keeps checkpoints independent of class identity)
        return {k: _unflatten(s, arrays) for k, s in struct["items"].items()}
    if kind == "list":
        return [_unflatten(s, arrays) for s in struct["items"]]
    if kind == "tuple":
        return tuple(_unflatten(s, arrays) for s in struct["items"])
    if kind == "none":
        return None
    if kind == "scalar":
        return struct["value"]
    return arrays[struct["name"]]


def save_checkpoint(path: str, tree: Any) -> str:
    """Atomically write ``tree`` to ``path`` (one self-contained .npz)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    # one pipelined device->host gather: flattening with per-leaf np.asarray
    # pays a full transfer round trip PER ARRAY (~27ms each on the tunneled
    # backend — a few hundred params made each checkpoint cost ~7s)
    tree = jax.device_get(tree)
    arrays, struct = _flatten(tree)
    assert _STRUCT_KEY not in arrays, f"reserved key {_STRUCT_KEY!r} in tree"
    struct_bytes = np.frombuffer(
        json.dumps(struct).encode("utf-8"), dtype=np.uint8
    )
    dir_ = os.path.dirname(path) or "."
    fd, tmp = tempfile.mkstemp(dir=dir_, suffix=".npz.tmp")
    os.close(fd)
    try:
        with open(tmp, "wb") as f:
            np.savez(f, **{_STRUCT_KEY: struct_bytes}, **arrays)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return path


def load_checkpoint(path: str) -> Any:
    with np.load(path, allow_pickle=False) as data:
        arrays = {k: data[k] for k in data.files}
    embedded = arrays.pop(_STRUCT_KEY, None)
    if embedded is not None:
        struct = json.loads(bytes(embedded).decode("utf-8"))
    else:
        # round-1 checkpoints used a sidecar .json; accept them on read
        with open(path + ".json") as f:
            struct = json.load(f)
    return _unflatten(struct, arrays)


def latest_checkpoint(dir_: str, prefix: str = "ckpt") -> str | None:
    if not os.path.isdir(dir_):
        return None
    cands = [
        f for f in os.listdir(dir_) if f.startswith(prefix) and f.endswith(".npz")
    ]
    if not cands:
        return None

    def step_of(f):
        try:
            return int(f[len(prefix) + 1 : -4])
        except ValueError:
            return -1

    return os.path.join(dir_, max(cands, key=step_of))
