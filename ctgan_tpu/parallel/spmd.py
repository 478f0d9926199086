"""Fused model-axis training via ``jax.shard_map`` (manual SPMD).

XLA's GSPMD partitioner miscompiles the fused multi-update CT-GAN step
under a model axis — chained grad+update iterations in ONE program
mis-scale D outputs by the data-axis size (docs/XLA_GSPMD_SCAN_BUG.md) —
which forced tensor-parallel runs onto the unfused one-program-per-substep
path (train/unfused.py, +25.6% dispatch tax on chip).  ``shard_map``
sidesteps the partitioner entirely: we write the per-device program by
hand and place every collective ourselves, so the whole 1×G + K×D
iteration is again ONE compiled program even with model-sharded weights.

Design (sharded storage + gathered compute, ZeRO-style):

* State leaves matching the ``parallel.mesh`` rules are STORED sharded on
  the ``model`` axis — params and their optimizer moments alike (moments
  mirror params by name, train/optim.py).
* Each step ``all_gather``s the sharded leaves (tiled, rides ICI),
  computes the full-model forward/backward on the device's micro-batch
  (the global batch is sharded over BOTH mesh axes), mesh-averages the
  grads, re-slices the model-sharded leaves' grads, and runs the
  elementwise optimizer update directly on the shards:
  ``slice(update(full)) == update(slice)`` for every optimizer in
  train/optim.py.
* Gradient sync exploits shard_map's AD: differentiating a value that is
  *invarying* over a mesh axis auto-inserts the psum over that axis in the
  transpose, so gathered (model-invarying-over-data) weights arrive with
  the data-axis sum already taken.  ``_grad_mean`` psums over whichever
  axes the cotangent is still varying on and divides once by the total
  device count (vary + AD-presummed covers the whole mesh for grads);
  ``_metric_mean`` averages forward values over only their varying axes.  (A blanket ``pvary`` + ``pmean`` double-counts — see
  tests/test_parallel.py::test_spmd_fused_matches_emulation.)
* RNG: the base key is folded with the device's linear mesh index, so
  each micro-batch draws independent noise / dropout / GP-epsilon — the
  standard manual-SPMD discipline.  GSPMD's global-array RNG semantics
  cannot be reproduced per-device without generating the full global
  tensor on every device, so the fused-SPMD mode is a *parallel RNG
  schedule* of the same algorithm, not a bitwise reshard; numerics are
  validated against a sequential per-device emulation instead.
* Batchnorm sees per-device micro-batch statistics (ghost batch norm).

Reference anchor: the reference's only distribution is a 2-GPU in-graph
split (SURVEY §2e); this module is the beyond-reference TP/FSDP story.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DEFAULT_RULES, effective_param_specs

__all__ = ["SpmdHooks", "make_spmd_trainer", "fetch_full_params"]


class SpmdHooks(NamedTuple):
    """Collective-insertion points handed to make_gan_trainer.

    All callables run INSIDE the owning shard_map region."""

    gather_gen: Callable[[dict], dict]
    gather_disc: Callable[[dict], dict]
    sync_gen_grads: Callable[[dict], dict]
    sync_disc_grads: Callable[[dict], dict]
    sync_metrics: Callable


def _model_dim(spec: P) -> int | None:
    for dim, axis in enumerate(spec):
        if axis == "model":
            return dim
        if isinstance(axis, tuple) and "model" in axis:
            # gather/slice below handle exactly one plain 'model' entry; a
            # composite axis would be silently partially gathered
            raise NotImplementedError(
                f"composite spec {spec} mixes 'model' with other axes; "
                "spmd storage rules support plain 'model' entries only"
            )
    return None


def _opt_specs(opt_state: dict, pspecs: dict[str, P]) -> dict:
    """Spec tree for an optimizer state: moment dicts mirror params by
    name; scalars (step counters) replicate."""
    out = {}
    for k, v in opt_state.items():
        if isinstance(v, dict):
            out[k] = _opt_specs(v, pspecs)
        else:
            out[k] = pspecs.get(k, P())
    return out


def _tree_place(tree, specs, mesh: Mesh):
    if isinstance(tree, dict):
        return {k: _tree_place(tree[k], specs[k], mesh) for k in tree}
    return jax.device_put(tree, NamedSharding(mesh, specs))


def fetch_full_params(params: dict) -> dict:
    """Reassemble model-sharded param leaves to full host arrays (for
    eval/sampling/checkpointing outside the shard_map step)."""
    return {k: jax.device_get(v) for k, v in params.items()}


def make_spmd_trainer(
    gen_fn,
    disc_fn,
    cfg,
    mesh: Mesh,
    gen_params: dict,
    disc_params: dict,
    *,
    rules=DEFAULT_RULES,
    batch_axis: int = 1,
    flavor: str = "gan",
):
    """Build the fused manual-SPMD trainer over ``mesh``.

    Returns ``(state0, spmd_step, state_specs)``:

    * ``state0`` — trainer state placed on the mesh: rule-matched param
      (and moment) leaves stored as model-axis shards, the rest replicated.
    * ``spmd_step(state, real_stack[, label_stack], base_key)`` — jitted
      shard_map step with the trainer's exact fused semantics (1×G +
      critic_iters×D in one program).  ``real_stack`` is the global
      ``[K, B, ...]`` stack; its batch axis is sharded over every mesh
      axis.  ``flavor='acgan'`` adds the ``[K, B]`` label stack.
    * ``state_specs`` — the per-leaf PartitionSpec pytree (for
      checkpoint-restore placement).

    ``cfg.batch_size`` is the GLOBAL batch (as for the pjit path); it must
    divide by the mesh size.
    """
    if flavor == "gan":
        from ..train.trainer_gan import make_gan_trainer as _mk
    elif flavor == "acgan":
        from ..train.trainer_acgan import make_acgan_trainer as _mk
    else:
        raise ValueError(f"unknown flavor {flavor!r}")

    ndev = int(mesh.devices.size)
    axes = tuple(mesh.axis_names)
    if "model" not in axes:
        raise ValueError(f"mesh {axes} has no 'model' axis")
    model_n = dict(zip(mesh.axis_names, mesh.devices.shape))["model"]
    if cfg.batch_size % ndev:
        raise ValueError(f"batch {cfg.batch_size} not divisible by {ndev} devices")
    if getattr(cfg, "clip_global_norm", None) is not None:
        raise NotImplementedError(
            "clip_global_norm under fused SPMD needs a model-axis-corrected "
            "norm; use the unfused path or drop the clip"
        )
    local_cfg = dataclasses.replace(cfg, batch_size=cfg.batch_size // ndev)

    gen_specs = effective_param_specs(mesh, gen_params, rules)
    disc_specs = effective_param_specs(mesh, disc_params, rules)

    def _gather(specs):
        def f(tree):
            out = {}
            for k, v in tree.items():
                dim = _model_dim(specs[k])
                out[k] = (
                    lax.all_gather(v, "model", axis=dim, tiled=True)
                    if dim is not None else v
                )
            return out
        return f

    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))

    def _grad_mean(v):
        # psum only over axes the cotangent still varies on: shard_map's AD
        # has already summed grads over every axis their primal was
        # invarying on (replicated leaf -> presummed over both axes;
        # gathered leaf -> presummed over 'data').  vary + presummed always
        # covers the whole mesh for grads, so /ndev is the global mean.
        vary = tuple(a for a in axes if a in jax.typeof(v).vma)
        return (lax.psum(v, vary) if vary else v) / float(ndev)

    def _metric_mean(v):
        # forward values get no AD presum: the mesh mean averages only over
        # the axes the value actually varies on (an axis it is invarying on
        # contributes identical copies — dividing by its size too would
        # mis-scale, e.g. halve a model-invarying monitor on model=2)
        vary = tuple(a for a in axes if a in jax.typeof(v).vma)
        if not vary:
            return v
        denom = 1
        for a in vary:
            denom *= sizes[a]
        return lax.psum(v, vary) / float(denom)

    def _sync(specs):
        def f(grads):
            out = {}
            for k, g in grads.items():
                g = _grad_mean(g)
                dim = _model_dim(specs[k])
                if dim is not None:
                    shard = g.shape[dim] // model_n
                    out[k] = lax.dynamic_slice_in_dim(
                        g, lax.axis_index("model") * shard, shard, axis=dim
                    )
                else:
                    out[k] = g
            return out
        return f

    def _sync_metrics(m):
        # metrics are naturally mesh-varying scalars; psum over the still-
        # varying axes + /ndev is the global-batch mean
        return jax.tree.map(_metric_mean, m)

    hooks = SpmdHooks(
        gather_gen=_gather(gen_specs),
        gather_disc=_gather(disc_specs),
        sync_gen_grads=_sync(gen_specs),
        sync_disc_grads=_sync(disc_specs),
        sync_metrics=_sync_metrics,
    )
    made = _mk(gen_fn, disc_fn, local_cfg, spmd_hooks=hooks)
    init_state, step_fn = made[0], made[1]

    state_full = init_state(gen_params, disc_params)
    StateCls = type(state_full)
    state_specs = StateCls(
        gen_params=dict(gen_specs),
        disc_params=dict(disc_specs),
        gen_opt=_opt_specs(state_full.gen_opt, gen_specs),
        disc_opt=_opt_specs(state_full.disc_opt, disc_specs),
        step=P(),
    )
    state0 = StateCls(
        gen_params=_tree_place(state_full.gen_params, state_specs.gen_params, mesh),
        disc_params=_tree_place(state_full.disc_params, state_specs.disc_params, mesh),
        gen_opt=_tree_place(state_full.gen_opt, state_specs.gen_opt, mesh),
        disc_opt=_tree_place(state_full.disc_opt, state_specs.disc_opt, mesh),
        step=jax.device_put(state_full.step, NamedSharding(mesh, P())),
    )

    batch_spec = P(*[
        ("data", "model") if d == batch_axis else None for d in range(3)
    ])
    label_spec = P(*[
        ("data", "model") if d == batch_axis else None for d in range(2)
    ])

    if flavor == "acgan":
        def local_step(state, real_stack, label_stack, base_key):
            flat = lax.axis_index("data") * model_n + lax.axis_index("model")
            return step_fn(
                state, real_stack, label_stack, jax.random.fold_in(base_key, flat)
            )

        in_specs = (state_specs, batch_spec, label_spec, P())
    else:
        def local_step(state, real_stack, base_key):
            flat = lax.axis_index("data") * model_n + lax.axis_index("model")
            return step_fn(state, real_stack, jax.random.fold_in(base_key, flat))

        in_specs = (state_specs, batch_spec, P())

    spmd_step = jax.jit(
        jax.shard_map(
            local_step,
            mesh=mesh,
            in_specs=in_specs,
            out_specs=(state_specs, P()),
        ),
        donate_argnums=0,
    )
    return state0, spmd_step, state_specs
