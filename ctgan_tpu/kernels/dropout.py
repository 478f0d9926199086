"""Pallas TPU kernel: fused dropout-mask generation with the on-core PRNG.

Dropout dominates the discriminator's elementwise traffic: the CT objective
runs *three* dropout-perturbed D passes per critic step (two CT passes + the
GP pass), each needing an independent mask per activation tensor.  The
``jax.random`` path lowers to threefry (dozens of vector ops per 128 bits)
and materializes uniform floats; this kernel generates the scaled mask
directly from ``pltpu.prng_random_bits`` in VMEM — one pass, no intermediate
uniforms.

Second-order safety (required by the gradient-penalty double backward): the
kernel computes only the *mask* from integer seeds; the dropout itself is a
plain ``x * mask`` multiply in JAX, so autodiff at any order sees a constant
mask and never differentiates the kernel.

Grid: the flattened tensor is viewed as rows of 1024 lanes (8x128 fp32
tiles), blocked to keep each program within VMEM.  Non-TPU backends fall
back to ``jax.random`` (tests run the kernel itself in interpreter mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["dropout_mask", "pallas_dropout"]

_LANES = 1024  # 8 sublanes x 128 lanes of fp32
_BLOCK_ROWS = 256  # 256 rows x 1024 lanes x 4B = 1 MiB per block


def _mask_kernel(seed_ref, thresh_ref, scale_ref, out_ref):
    from jax.experimental.pallas import tpu as pltpu
    import jax.experimental.pallas as pl

    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    # prng_random_bits yields int32 on TPU; bitcast to uint32 before the
    # threshold compare (signed compare flips half the range).
    bits = pltpu.bitcast(pltpu.prng_random_bits(out_ref.shape), jnp.uint32)
    keep = bits < thresh_ref[0]
    out_ref[:] = jnp.where(keep, scale_ref[0], 0.0).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _mask_padded(seed: jax.Array, n_rows: int, keep_prob: float, interpret: bool, dtype=jnp.float32):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # threshold on raw uint32 bits: keep iff bits < keep_prob * 2^32
    thresh = np.uint32(min(int(keep_prob * (1 << 32)), (1 << 32) - 1))
    scale = np.float32(1.0 / keep_prob)
    grid = (pl.cdiv(n_rows, _BLOCK_ROWS),)
    return pl.pallas_call(
        _mask_kernel,
        out_shape=jax.ShapeDtypeStruct((n_rows, _LANES), dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(
                (_BLOCK_ROWS, _LANES),
                lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        interpret=interpret,
    )(
        seed.reshape(1).astype(jnp.int32),
        jnp.asarray([thresh], jnp.uint32),
        jnp.asarray([scale], jnp.float32),
    )


def dropout_mask(
    seed: jax.Array,
    shape,
    keep_prob: float,
    *,
    interpret: bool = False,
    dtype=jnp.float32,
) -> jax.Array:
    """Scaled keep-mask (values 0 or 1/keep_prob) of ``shape``.

    ``dtype`` is the storage dtype of the emitted mask.  The scale is always
    computed as fp32 ``1/keep_prob`` and then rounded to ``dtype`` — bit-
    identical to materializing the fp32 mask and casting, but without ever
    writing the 4-byte version to HBM (the mask is kept alive for the
    backward multiply, so on byte-bound steps its residency is paid twice).

    Off-TPU (tests, CPU dry runs) the mask comes from ``jax.random`` with the
    same (seed -> mask) determinism contract — the TPU PRNG primitives have
    no CPU lowering and the HLO interpreter stubs them to zeros.
    """
    n = int(np.prod(shape))
    if jax.default_backend() in ("cpu",) or interpret:
        key = jax.random.PRNGKey(seed.astype(jnp.uint32) if hasattr(seed, "astype") else seed)
        keep = jax.random.uniform(key, shape) < keep_prob
        return jnp.where(keep, np.float32(1.0 / keep_prob), 0.0).astype(dtype)
    n_rows = -(-n // _LANES)
    # round rows up to a block multiple so every grid step is full
    n_rows = -(-n_rows // _BLOCK_ROWS) * _BLOCK_ROWS
    flat = _mask_padded(seed, n_rows, float(keep_prob), False, jnp.dtype(dtype))
    return flat.reshape(-1)[:n].reshape(shape)


def pallas_dropout(
    x: jax.Array,
    seed: jax.Array,
    keep_prob: float,
    *,
    interpret: bool = False,
) -> jax.Array:
    """Dropout via the Pallas mask kernel: ``x * mask`` (mask is constant to
    autodiff — safe under grad-of-grad).

    The mask is emitted directly in ``x.dtype`` (same values as the fp32
    mask cast to ``x.dtype``, which is what the multiply consumed anyway) so
    the tensor XLA keeps alive for the backward multiply is half-width on
    bf16 activation paths."""
    if keep_prob >= 1.0:
        return x
    mask = dropout_mask(seed, x.shape, keep_prob, interpret=interpret, dtype=x.dtype)
    return x * mask
