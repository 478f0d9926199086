"""Multi-process DP worker for test_distributed.py.

Each of N processes owns 4 virtual CPU devices; together they form one
8-device 'data' mesh and run ONE fused GAN train step on globally sharded
inputs.  Process 0 writes the resulting disc params + metrics for the
parent test to compare against the single-process reference.

This is the multi-HOST analogue of test_parallel.py's single-process mesh
tests — the comm-backend row of SURVEY §2e (`jax.distributed` +
cross-process gloo collectives standing in for the reference's implicit
tf.train server send/recv).

Usage: python dist_worker.py <pid> <nprocs> <port> <out_npz>
"""

import os
import sys


def main():
    pid, nprocs, port, out = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=4"
        ).strip()
    import jax

    # the container's sitecustomize imports jax with JAX_PLATFORMS=axon at
    # interpreter startup, so the env var alone is too late (tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        f"localhost:{port}", num_processes=nprocs, process_id=pid
    )
    assert jax.process_count() == nprocs, jax.process_count()
    assert len(jax.devices()) == 4 * nprocs

    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, here)                       # tests/ (test_parallel)
    sys.path.insert(0, os.path.dirname(here))      # repo root (ctgan_tpu)
    from test_parallel import _build_trainer

    # identical seeds -> identical host-side init in every process
    state, step_fn = _build_trainer()
    rng = np.random.default_rng(0)
    batch = rng.uniform(size=(2, 16, 784)).astype("f4")
    key = np.asarray(jax.random.PRNGKey(1))

    mesh = Mesh(np.array(jax.devices()).reshape(-1), ("data",))

    def to_global(x, spec):
        """Host value (same on all processes) -> one global array."""
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, NamedSharding(mesh, spec), lambda idx: x[idx]
        )

    replicate = lambda tree: jax.tree.map(lambda x: to_global(x, P()), tree)
    gstate = type(state)(
        gen_params=replicate(state.gen_params),
        disc_params=replicate(state.disc_params),
        gen_opt=replicate(state.gen_opt),
        disc_opt=replicate(state.disc_opt),
        step=to_global(state.step, P()),
    )
    gbatch = to_global(batch, P(None, "data", None))
    gkey = to_global(key, P())

    with mesh:
        out_state, metrics = jax.jit(step_fn)(gstate, gbatch, gkey)

    if pid == 0:
        blob = {
            f"disc/{k}": np.asarray(v.addressable_data(0))
            for k, v in out_state.disc_params.items()
        }
        blob["disc_cost"] = np.asarray(metrics["disc_cost"].addressable_data(0))
        np.savez(out, **blob)
        print("WORKER0_OK", flush=True)


if __name__ == "__main__":
    main()
