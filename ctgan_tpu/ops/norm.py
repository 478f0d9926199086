"""Normalization ops (rebuild of ``tflib/ops/batchnorm.py``,
``cond_batchnorm.py``, ``layernorm.py``).

Layout is NHWC: the "feature" axis is the last axis.  The reference's fused
NCHW batch-norm (``tf.nn.fused_batch_norm``) becomes a plain reduce+scale that
XLA fuses into neighbouring convs on TPU.

Semantics preserved from the reference:

* **GAN-path BN uses batch statistics always** — ``is_training`` is never
  passed in the GAN scripts (tflib/ops/batchnorm.py:51-52), so there is no
  moving-average read in the training step.  ``mode="batch"`` is therefore the
  default.
* Moving statistics (for eval / recalibration, train_loop_2.py:236-254) use the
  cumulative ``t/(t+1)`` blend of the reference's ``_force_updates``.
* Conditional BN (Dumoulin et al.) looks up per-label offset/scale embeddings
  (cond_batchnorm.py:6-17).
* Under data parallelism, statistics are **local to the shard** by default —
  the reference's per-device BN implies local batch stats (SURVEY §7); pass
  ``axis_name`` to opt into cross-replica stats.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import store

__all__ = ["batchnorm", "cond_batchnorm", "layernorm", "cond_layernorm"]

_EPS = 1e-5


def _moments(x, axes, axis_name=None):
    mean = jnp.mean(x, axis=axes, keepdims=True)
    if axis_name is not None:
        mean = jax.lax.pmean(mean, axis_name)
    var = jnp.mean(jnp.square(x - mean), axis=axes, keepdims=True)
    if axis_name is not None:
        var = jax.lax.pmean(var, axis_name)
    return mean, var


def batchnorm(
    name: str,
    inputs: jax.Array,
    *,
    mode: str = "batch",
    update_stats: bool = False,
    axis_name: str | None = None,
    per_batch_axes: tuple | None = None,
    scale: bool = True,
    center: bool = True,
) -> jax.Array:
    """Batch normalization over all axes except the last (channel).

    mode:
      * ``"batch"``  — normalize with this batch's statistics (GAN training
        path; reference default when ``is_training is None``).
      * ``"moving"`` — normalize with stored moving statistics.
      * ``"blend"``  — the reference's inference oddity: blend the current
        item's per-example spatial moments with moving stats, weighted
        ``1/batch : (batch-1)/batch`` (tflib/ops/batchnorm.py:33-40).

    ``per_batch_axes`` reproduces the non-fused branch where 0 is *not* in the
    reduction axes and each batch item gets its own statistics
    (tflib/ops/batchnorm.py:74-87); pass the reduction axes explicitly.
    """
    x = inputs.astype(jnp.float32)
    if per_batch_axes is not None:
        axes = tuple(per_batch_axes)
        mean, var = _moments(x, axes, axis_name=None)
        shape = [x.shape[-1]]
        offset = store.param(name + ".offset", lambda: np.zeros(shape, dtype="float32"))
        scale = store.param(name + ".scale", lambda: np.ones(shape, dtype="float32"))
        inv = jax.lax.rsqrt(var + _EPS)
        return (x - mean) * inv * scale + offset

    c = x.shape[-1]
    reduce_axes = tuple(range(x.ndim - 1))
    # ``scale=False`` reproduces the Theano ``batch_norm(..., g=None)`` wrap
    # (CT_MNIST.py:34-35): offset only, no learned gain.
    offset = (
        store.param(name + ".offset", lambda: np.zeros(c, dtype="float32"))
        if center
        else jnp.zeros(c, jnp.float32)
    )
    scale = (
        store.param(name + ".scale", lambda: np.ones(c, dtype="float32"))
        if scale
        else jnp.ones(c, jnp.float32)
    )

    needs_stats = mode in ("moving", "blend") or update_stats
    if needs_stats:
        moving_mean = store.state(
            name + ".moving_mean", lambda: np.zeros(c, dtype="float32")
        )
        moving_var = store.state(
            name + ".moving_variance", lambda: np.ones(c, dtype="float32")
        )
        stats_iter = store.state(
            name + ".stats_iter", lambda: np.zeros((), dtype="float32")
        )

    if mode == "batch":
        mean, var = _moments(x, reduce_axes, axis_name)
        if update_stats:
            t = stats_iter
            new_mean = (t / (t + 1)) * moving_mean + (1 / (t + 1)) * mean.reshape(c)
            new_var = (t / (t + 1)) * moving_var + (1 / (t + 1)) * var.reshape(c)
            store.update_state(name + ".moving_mean", new_mean)
            store.update_state(name + ".moving_variance", new_var)
            store.update_state(name + ".stats_iter", t + 1)
    elif mode == "moving":
        mean = moving_mean.reshape((1,) * (x.ndim - 1) + (c,))
        var = moving_var.reshape((1,) * (x.ndim - 1) + (c,))
    elif mode == "blend":
        # Per-item-moments blend (reference tflib/ops/batchnorm.py:31-68) is
        # only defined for conv inputs; the reference's non-conv path never
        # reaches it either.
        if x.ndim != 4:
            raise ValueError(
                f"batchnorm mode='blend' requires NHWC (4-D) input, got ndim={x.ndim}"
            )
        bs = jnp.asarray(x.shape[0], jnp.float32)
        item_mean, item_var = _moments(x, (1, 2))
        mean = (1.0 / bs) * item_mean + ((bs - 1.0) / bs) * moving_mean
        var = (1.0 / bs) * item_var + ((bs - 1.0) / bs) * moving_var
    else:
        raise ValueError(f"unknown batchnorm mode {mode!r}")

    inv = jax.lax.rsqrt(var + _EPS)
    return ((x - mean) * inv * scale + offset).astype(inputs.dtype)


def cond_batchnorm(
    name: str,
    inputs: jax.Array,
    labels: jax.Array,
    n_labels: int,
    *,
    axis_name: str | None = None,
) -> jax.Array:
    """Conditional BN: per-label offset/scale via embedding lookup
    (tflib/ops/cond_batchnorm.py:6-17).  NHWC input."""
    x = inputs.astype(jnp.float32)
    c = x.shape[-1]
    offset_m = store.param(
        name + ".offset", lambda: np.zeros((n_labels, c), dtype="float32")
    )
    scale_m = store.param(
        name + ".scale", lambda: np.ones((n_labels, c), dtype="float32")
    )
    offset = offset_m[labels]  # [N, C]
    scale = scale_m[labels]
    mean, var = _moments(x, tuple(range(x.ndim - 1)), axis_name)
    inv = jax.lax.rsqrt(var + _EPS)
    bcast = (slice(None),) + (None,) * (x.ndim - 2)
    return ((x - mean) * inv * scale[bcast] + offset[bcast]).astype(inputs.dtype)


def layernorm(name: str, inputs: jax.Array, norm_axes: tuple | None = None) -> jax.Array:
    """Layer norm with per-channel offset/scale (tflib/ops/layernorm.py:6-21).

    ``norm_axes`` defaults to all non-batch axes.  The affine parameters are
    sized by the channel (last) axis — the reference sizes them by the first
    normalized axis, which is the channel in its BCHW layout; same thing here.
    """
    x = inputs.astype(jnp.float32)
    if norm_axes is None:
        norm_axes = tuple(range(1, x.ndim))
    c = x.shape[-1]
    offset = store.param(name + ".offset", lambda: np.zeros(c, dtype="float32"))
    scale = store.param(name + ".scale", lambda: np.ones(c, dtype="float32"))
    mean, var = _moments(x, tuple(norm_axes))
    inv = jax.lax.rsqrt(var + _EPS)
    return ((x - mean) * inv * scale + offset).astype(inputs.dtype)


def cond_layernorm(
    name: str, inputs: jax.Array, labels: jax.Array, n_labels: int
) -> jax.Array:
    """Conditional layer norm (LSUN-fork layernorm conditional variant):
    per-label offset/scale embeddings, statistics per example."""
    x = inputs.astype(jnp.float32)
    c = x.shape[-1]
    offset_m = store.param(
        name + ".offset", lambda: np.zeros((n_labels, c), dtype="float32")
    )
    scale_m = store.param(
        name + ".scale", lambda: np.ones((n_labels, c), dtype="float32")
    )
    offset = offset_m[labels]
    scale = scale_m[labels]
    mean, var = _moments(x, tuple(range(1, x.ndim)))
    inv = jax.lax.rsqrt(var + _EPS)
    bcast = (slice(None),) + (None,) * (x.ndim - 2)
    return ((x - mean) * inv * scale[bcast] + offset[bcast]).astype(inputs.dtype)
