"""HBM-resident input path shared by the big image workloads.

The uint8 dataset pool lives in HBM (``DeviceSampler``); per-iteration
selection, horizontal flip, and dequantization are fused INTO the jitted
training step, so the host feeds only the (constant) pool arrays each
iteration — zero steady-state host->device traffic.  Measured on the
tunneled v5e runtime: per-iteration host feed costs ~3x step time for the
64x64 workload (runs/final_pass_r2.log io64 rows), and even the per-epoch
``host_perm`` transfer cost ~0.26-0.48 s/iter amortized over the small
pools' short epochs (runs/good64_r3.log data-time column) — hence the
epoch permutation is computed IN-TRACE here (``perm=None``; a <=4096-
element device sort is noise next to these steps).  ``host_perm`` remains
the right call at flagship scale (n=50k, where the in-trace sort is
0.25 s/iter).  Both derive from the same ``jax.random`` stream, so the
batch sequence is bit-identical either way.

Replaces the reference's host-side feed_dict loops
(``CT_gan_64x64.py:480-546``, ``wgan_LSUN_Bedrooms128.py:214-296``).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["make_hbm_input"]


def make_hbm_input(
    step_fn: Callable,
    pool_flat_u8: np.ndarray,
    *,
    batch_size: int,
    critic_iters: int,
    chw: tuple[int, int, int],
    seed: int,
):
    """Wrap ``step_fn(state, x, key)`` with the HBM-resident input path.

    ``pool_flat_u8``: [N, C*H*W] uint8 image pool (device-uploaded once).
    Returns ``(run_step, next_batch, data_state, set_data_state)`` in the
    shapes ``train_loop`` expects: ``run_step(state, data, key)`` consumes
    the pool arrays passed through the jit boundary (embedding them as
    closure constants would inflate the HLO — see data/iterator.py), and
    the step index comes from ``state.step`` so input selection is fully
    device-side; ``next_batch`` only ticks a host counter kept for O(1)
    checkpoint/resume of the iterator position.
    """
    from . import DeviceSampler
    from .augment import random_flip

    c, h, w = chw
    out_dim = c * h * w
    # The pool is HBM-resident for the whole run, so dtype is a capacity
    # knob, not a speed one: uint8 keeps residency at 1 byte/px (a real
    # LSUN-scale pool fits; int32 quadruples it), and the gather reads 4x
    # fewer HBM bytes.  Dequantization happens after selection, on the
    # [K*B, ...] batch only.
    sampler = DeviceSampler(
        [pool_flat_u8.astype("uint8")], batch_size, critic_iters, seed=seed
    )
    data_args = tuple(sampler.arrays)
    counter = {"i": 0}

    def run_step(state, data, key):
        raw = sampler.sample(state.step, data)  # [K, B, C*H*W]
        x = 2.0 * (raw.astype(jnp.float32) / 255.0 - 0.5)
        imgs = x.reshape(-1, c, h, w).transpose(0, 2, 3, 1)
        imgs = random_flip(imgs, jax.random.fold_in(key, state.step))
        x = imgs.transpose(0, 3, 1, 2).reshape(critic_iters, batch_size, out_dim)
        return step_fn(state, x, key)

    def next_batch():
        counter["i"] += 1
        return (data_args,)

    def data_state():
        return {"i": counter["i"]}

    def set_data_state(s):
        counter.update(i=int(s["i"]))

    return run_step, next_batch, data_state, set_data_state
