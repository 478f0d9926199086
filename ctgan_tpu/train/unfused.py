"""TP-safe unfused execution of a trainer step.

Under model-axis (tensor-parallel) sharding, XLA's SPMD partitioner
miscompiles CHAINED grad+update iterations inside one program — the second
iteration's discriminator outputs come back multiplied by the data-axis size
(docs/XLA_GSPMD_SCAN_BUG.md).  One grad+update per program is verified
correct, so this wrapper runs the trainer's substeps as separate jits.
Dispatch overhead is ~K+2 extra launches per iteration (~100µs each),
negligible against multi-ms training steps; the substeps derive their RNG
keys identically to the fused step, so the two modes are numerically
interchangeable (tested: tests/test_parallel.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["make_unfused_step"]


def make_unfused_step(step_fn, *, has_labels: bool):
    """Wrap a trainer ``step_fn`` (carrying .gen_substep/.critic_substep/
    .bump_step attributes) into an unfused runner with the same signature.

    ``has_labels``: True for the ACGAN trainer (critic takes a label stack).
    """
    from ctgan_tpu.core import tuned_compiler_options

    _opts = tuned_compiler_options()
    jit_gen = jax.jit(step_fn.gen_substep, donate_argnums=0,
                      compiler_options=_opts)
    jit_critic = jax.jit(step_fn.critic_substep, donate_argnums=0,
                         compiler_options=_opts)
    jit_bump = jax.jit(step_fn.bump_step, donate_argnums=0,
                       compiler_options=_opts)

    if has_labels:
        def run(state, real_stack, label_stack, base_key):
            state, g_cost = jit_gen(state, base_key)
            for i in range(real_stack.shape[0]):
                state, metrics = jit_critic(
                    state, jnp.asarray(i), real_stack[i], label_stack[i], base_key
                )
            metrics["gen_cost"] = g_cost
            return jit_bump(state), metrics
    else:
        def run(state, real_stack, base_key):
            state, g_cost = jit_gen(state, base_key)
            for i in range(real_stack.shape[0]):
                state, metrics = jit_critic(
                    state, jnp.asarray(i), real_stack[i], base_key
                )
            metrics["gen_cost"] = g_cost
            return jit_bump(state), metrics

    return run
