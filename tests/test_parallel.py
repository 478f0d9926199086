"""Multi-device sharding tests on the 8-virtual-CPU-device mesh."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from ctgan_tpu.core import init_context, rng_context, split_params
from ctgan_tpu.models import dcgan
from ctgan_tpu.parallel import (
    make_mesh,
    param_spec,
    shard_batch,
    shard_params,
)
from ctgan_tpu.train import GanConfig, make_gan_trainer


pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_make_mesh_shapes():
    mesh = make_mesh(data=4, model=2)
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("data", "model")
    with pytest.raises(ValueError):
        make_mesh(data=3, model=2)


def test_param_spec_rules():
    assert param_spec("Generator.Input.W", None) == P(None, "model")
    assert param_spec("Discriminator.Output.W", None) == P("model", None)
    assert param_spec("Discriminator.2.Conv1.Filters", None) == P()


def test_shard_params_skips_indivisible():
    mesh = make_mesh(data=4, model=2)
    params = {
        "Generator.Input.W": jnp.zeros((128, 256)),  # divisible by 2 on dim1
        "Discriminator.Output.W": jnp.zeros((33, 1)),  # 33 % 2 != 0 -> replicated
    }
    out = shard_params(mesh, params)
    specs = {k: v.sharding.spec for k, v in out.items()}
    assert specs["Generator.Input.W"] == P(None, "model")
    assert specs["Discriminator.Output.W"] == P()


def _build_trainer():
    mode = "wgan-CT"
    gen_fn = partial(dcgan.mnist_generator, dim=8, mode=mode)
    disc_fn = partial(dcgan.mnist_discriminator, dim=8, mode=mode)
    cfg = GanConfig(mode=mode, batch_size=16, critic_iters=2, iters=100)
    init_state, step_fn, _, _ = make_gan_trainer(gen_fn, disc_fn, cfg)
    with init_context(seed=0) as ctx:
        with rng_context(jax.random.PRNGKey(0)):
            disc_fn(gen_fn(4))
    gp, dp, _ = split_params(ctx.params, "Generator", "Discriminator")
    return init_state(gp, dp), step_fn


def test_sharded_step_matches_single_device():
    """The pjit'd train step over the 8-device data axis must produce the
    same params as the unsharded step (same rng) — the distributed step is a
    pure reshard of the same program."""
    state, step_fn = _build_trainer()
    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.uniform(size=(2, 16, 784)).astype("f4"))
    key = jax.random.PRNGKey(1)

    ref_state, ref_metrics = jax.jit(step_fn)(state, batch, key)

    mesh = make_mesh(data=8, model=1)
    with mesh:
        sharded_state = type(state)(
            gen_params=shard_params(mesh, state.gen_params),
            disc_params=shard_params(mesh, state.disc_params),
            gen_opt=jax.tree.map(lambda x: jax.device_put(x), state.gen_opt),
            disc_opt=jax.tree.map(lambda x: jax.device_put(x), state.disc_opt),
            step=state.step,
        )
        sharded_batch = shard_batch(mesh, batch, batch_axis=1)
        out_state, out_metrics = jax.jit(step_fn)(sharded_state, sharded_batch, key)
    for k in ref_state.disc_params:
        np.testing.assert_allclose(
            np.asarray(ref_state.disc_params[k]),
            np.asarray(out_state.disc_params[k]),
            rtol=2e-4, atol=2e-5,
        )
    assert np.isclose(
        float(ref_metrics["disc_cost"]), float(out_metrics["disc_cost"]), rtol=1e-4
    )


def test_dryrun_multichip_entrypoint():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    out = compiled(*args)
    assert np.asarray(out[0]).shape == (16,)
