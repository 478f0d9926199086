"""Device mesh + sharding rules.

The reference's entire distribution story is single-process in-graph
``tf.device`` placement: ≤2 GPUs, batch split by ``tf.split``, costs averaged
by ``tf.add_n`` and implicit send/recv at device edges (SURVEY §2e).  The
TPU-native replacement is one ``jax.sharding.Mesh`` and a single jitted step:

* ``data`` axis — batch sharding (the reference's data parallelism).  The
  loss means become XLA all-reduces over ICI; gradient sync is implicit in
  the SPMD partition of the fused fwd+bwd program.
* ``model`` axis — optional tensor parallelism for the wide generator input
  projections (128 → 4·4·8·dim) and discriminator output heads; the
  reference has no TP (model sizes never needed it) but the axis is
  first-class here.

The reference's A/B device split (D passes on GPU-A, GP+CT on GPU-B,
CT_gan_cifar_resnet.py:205-293) is deliberately *not* reproduced: it was a
2017 memory workaround, and on TPU the fused single program is strictly
better (no cross-device activation transfer, full overlap).
"""

from __future__ import annotations

import re
from typing import Mapping, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated",
    "shard_batch",
    "shard_params",
    "param_spec",
    "effective_param_specs",
    "DEFAULT_RULES",
]


def make_mesh(
    devices: Sequence[jax.Device] | None = None,
    *,
    data: int | None = None,
    model: int = 1,
) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices.

    Default: all devices on the data axis.  On a multi-slice system callers
    should order devices so the model axis maps to intra-slice ICI neighbours
    (collectives over 'model' are latency-sensitive; 'data' all-reduces are
    bandwidth-bound and tolerate DCN).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def data_sharding(mesh: Mesh, batch_axis: int = 0, ndim: int = 2) -> NamedSharding:
    spec = [None] * ndim
    spec[batch_axis] = "data"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, batch_axis: int = 0):
    """Place a host batch with the batch axis sharded over 'data'."""

    def place(x):
        return jax.device_put(x, data_sharding(mesh, batch_axis, x.ndim))

    return jax.tree.map(place, batch)


# Param-name regex → PartitionSpec.  Big generator input projections and
# discriminator flat output heads are the only >O(10MB) matrices in the model
# zoo; shard their wide dimension over 'model'.
DEFAULT_RULES: tuple[tuple[str, P], ...] = (
    (r".*Generator\.Input\.W$", P(None, "model")),
    (r".*Generator\.Input\.b$", P("model")),
    (r".*Discriminator\.Output\.W$", P("model", None)),
    (r".*\.EmbeddingMatrix$", P(None, "model")),
)


def param_spec(name: str, value, rules: Sequence[tuple[str, P]] = DEFAULT_RULES) -> P:
    for pattern, spec in rules:
        if re.fullmatch(pattern, name):
            # only apply if divisible; else replicate
            return spec
    return P()


def effective_param_specs(
    mesh: Mesh,
    params: Mapping[str, jax.Array],
    rules: Sequence[tuple[str, P]] = DEFAULT_RULES,
) -> dict[str, P]:
    """Per-leaf PartitionSpec after divisibility checks.

    A rule only applies when the sharded dimension divides evenly; otherwise
    the param stays replicated — so small models shard trivially."""
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    out = {}
    for k, v in params.items():
        spec = param_spec(k, v, rules)
        ok = True
        for dim, axis in enumerate(spec):
            if axis is None:
                continue
            size = axis_sizes.get(axis, 1)
            if dim >= v.ndim or v.shape[dim] % size != 0:
                ok = False
                break
        out[k] = spec if ok else P()
    return out


def shard_params(
    mesh: Mesh,
    params: Mapping[str, jax.Array],
    rules: Sequence[tuple[str, P]] = DEFAULT_RULES,
) -> dict[str, jax.Array]:
    """Place params on the mesh per the rules (replicated by default)."""
    specs = effective_param_specs(mesh, params, rules)
    return {
        k: jax.device_put(v, NamedSharding(mesh, specs[k]))
        for k, v in params.items()
    }
