"""BN recalibration: moving stats converge to the data distribution."""

import jax
import jax.numpy as jnp
import numpy as np

from ctgan_tpu.core import apply_context, init_context, rng_context
from ctgan_tpu.ops import batchnorm, linear
from ctgan_tpu.train.recalibrate import recalibrate_bn


def _model(x, update_stats=False, mode="batch"):
    h = linear("M.L", 8, 8, x)
    return batchnorm("M.BN", h, mode=mode, update_stats=update_stats)


def test_recalibrate_then_moving_eval():
    rng = np.random.default_rng(0)
    data = rng.normal(3.0, 2.0, size=(40, 8)).astype("f4")
    with init_context(seed=0) as ctx:
        _model(jnp.asarray(data[:4]))
    params = ctx.params

    batches = [jnp.asarray(data[i : i + 8]) for i in range(0, 40, 8)]
    state = recalibrate_bn(
        params, lambda b: _model(b, update_stats=True), batches, jax.random.PRNGKey(0)
    )
    assert float(state["M.BN.stats_iter"]) == 5.0
    # moving stats should approximate the pre-BN activation distribution
    with apply_context(params):
        pre = linear("M.L", 8, 8, jnp.asarray(data))
    mm = np.asarray(state["M.BN.moving_mean"])
    np.testing.assert_allclose(mm, np.asarray(pre).mean(0), rtol=0.2, atol=0.2)
    # eval in moving mode normalizes a fresh batch reasonably
    with apply_context(params, mutable_state=dict(state)):
        out = _model(jnp.asarray(data[:8]), mode="moving")
    o = np.asarray(out)
    assert abs(o.mean()) < 0.5
