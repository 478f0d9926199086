"""Cross-replica batch norm: axis_name stats under shard_map.

The reference's per-device BN used local batch stats (SURVEY §5 "BN
semantics"); our batchnorm defaults to whatever the enclosing program sees
(global under jit-over-sharded-batch) and supports explicit cross-replica
moments via ``axis_name`` for shard_map/pmap-style code.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from ctgan_tpu.core import apply_context, init_context
from ctgan_tpu.ops import batchnorm
from ctgan_tpu.parallel import make_mesh

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


def test_axis_name_batchnorm_matches_global():
    mesh = make_mesh(data=8, model=1)
    x = np.random.default_rng(0).normal(3.0, 2.0, size=(32, 4)).astype("f4")

    with init_context(seed=0) as ctx:
        batchnorm("BN", jnp.asarray(x))
    params = ctx.params

    def global_bn(xb):
        with apply_context(params):
            return batchnorm("BN", xb)

    ref = np.asarray(global_bn(jnp.asarray(x)))

    def shard_fn(xb):
        with apply_context(params):
            return batchnorm("BN", xb, axis_name="data")

    sharded = jax.shard_map(
        shard_fn, mesh=mesh, in_specs=P("data"), out_specs=P("data")
    )(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(sharded), ref, rtol=1e-4, atol=1e-5)


def test_local_stats_differ_from_global():
    """Without axis_name, each shard normalizes with its own statistics —
    the reference's per-device behaviour."""
    mesh = make_mesh(data=8, model=1)
    # strongly shard-dependent data: each shard has a different mean
    x = np.repeat(np.arange(8, dtype="f4")[:, None], 4, axis=0).reshape(32, 1)
    x = np.concatenate([x, np.ones((32, 1), "f4")], axis=1)

    with init_context(seed=0) as ctx:
        batchnorm("BN", jnp.asarray(x))
    params = ctx.params

    def local_fn(xb):
        with apply_context(params):
            return batchnorm("BN", xb)

    local = jax.shard_map(
        local_fn, mesh=mesh, in_specs=P("data"), out_specs=P("data")
    )(jnp.asarray(x))
    with apply_context(params):
        global_ = batchnorm("BN", jnp.asarray(x))
    assert not np.allclose(np.asarray(local), np.asarray(global_), atol=1e-3)
