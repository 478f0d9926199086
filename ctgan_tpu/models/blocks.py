"""ResNet GAN building blocks (rebuild of CT_gan_cifar_resnet.py:89-153,
CT_gan_64x64.py:106-200, wgan_LSUN_Bedrooms128.py:76-138).

All NHWC.  ``normalize`` is a callable ``(name, x, labels) -> x`` chosen by
the model config (batch/cond-batch/layer norm or identity) — replacing the
reference's global-flag ``Normalize`` dispatchers.
"""

from __future__ import annotations

import os
from typing import Callable

import jax

from ..ops import (
    conv2d,
    conv_mean_pool2d,
    deconv2d,
    depth_to_space,
    mean_pool,
    mean_pool_conv2d,
    relu,
    upsample_conv2d,
    upsample_nearest,
)

__all__ = [
    "conv_mean_pool",
    "mean_pool_conv",
    "upsample_conv",
    "scaled_upsample_conv",
    "subpixel_conv",
    "residual_block",
    "optimized_res_block_disc1",
    "bottleneck_residual_block",
]

NormFn = Callable[[str, jax.Array, jax.Array | None], jax.Array]


def _identity_norm(name, x, labels=None):
    return x


# The fused path rewrites conv+mean_pool (either order) as ONE stride-2 conv
# with a transformed kernel (ops/conv.py::conv_mean_pool2d / mean_pool_conv2d)
# — identical params, identical math up to float reassociation.  Unlike the
# upsample case below, XLA does NOT absorb the pool: the flagship HLO shows
# the pre-pool activation materialized, reduced, and re-broadcast in the VJP
# (the two largest non-conv HBM categories), and the fused form is also
# ~2.25x fewer MACs for K=3.  Default ON since the chip A/B validated it
# (flagship 24.5 -> 14.8 ms/iter, runs/queue_r4e.log); env opt-out
# ``CTGAN_FUSE_MEANPOOL=0`` so any tool/app can A/B the unfused path
# without plumbing.  When the env var is set (either way) it wins over app
# configs — see set_fuse_meanpool().
FUSE_MEANPOOL_CONV = os.environ.get("CTGAN_FUSE_MEANPOOL", "1") != "0"


def set_fuse_meanpool(enabled: bool) -> None:
    """App-config hook: apply ``enabled`` unless CTGAN_FUSE_MEANPOOL is set
    in the environment (the env var is the A/B escape hatch and always
    wins).  Tools that need unconditional control (bench_all arms) assign
    ``blocks.FUSE_MEANPOOL_CONV`` directly instead."""
    global FUSE_MEANPOOL_CONV
    if os.environ.get("CTGAN_FUSE_MEANPOOL") is None:
        FUSE_MEANPOOL_CONV = enabled


def conv_mean_pool(name, input_dim, output_dim, filter_size, inputs, *, he_init=True, biases=True):
    if FUSE_MEANPOOL_CONV:
        return conv_mean_pool2d(
            name, input_dim, output_dim, filter_size, inputs,
            he_init=he_init, biases=biases,
        )
    out = conv2d(name, input_dim, output_dim, filter_size, inputs, he_init=he_init, biases=biases)
    return mean_pool(out)


def mean_pool_conv(name, input_dim, output_dim, filter_size, inputs, *, he_init=True, biases=True):
    if FUSE_MEANPOOL_CONV:
        return mean_pool_conv2d(
            name, input_dim, output_dim, filter_size, inputs,
            he_init=he_init, biases=biases,
        )
    out = mean_pool(inputs)
    return conv2d(name, input_dim, output_dim, filter_size, out, he_init=he_init, biases=biases)


# The fused path computes the conv on the SMALL grid (exact parity-collapse
# rewrite, ops/conv.py::upsample_conv2d) instead of materializing the 4x
# nearest-upsampled activation; identical params, identical math.  Default
# OFF: on v5e the naive path measured 7% faster for the flagship step
# (24.5 vs 26.3 ms/iter, tools/ab_fused_upsample.py with overhead-cancelling
# timing) — XLA fuses the nearest-upsample broadcast into the conv input
# read, and the collapsed 4*Cout kernel costs more MXU time than the HBM it
# saves at these sizes.  Flip per-model when activations dominate (e.g.
# larger spatial dims / memory-limited configs).
FUSE_UPSAMPLE_CONV = False


def upsample_conv(name, input_dim, output_dim, filter_size, inputs, *, he_init=True, biases=True):
    if FUSE_UPSAMPLE_CONV:
        return upsample_conv2d(
            name, input_dim, output_dim, filter_size, inputs,
            he_init=he_init, biases=biases,
        )
    out = upsample_nearest(inputs)
    return conv2d(name, input_dim, output_dim, filter_size, out, he_init=he_init, biases=biases)


def scaled_upsample_conv(name, input_dim, output_dim, filter_size, inputs, *, he_init=True, biases=True):
    """UpsampleConv with gain 0.5 (wgan_LSUN_Bedrooms128.py:87-94)."""
    if FUSE_UPSAMPLE_CONV:
        return upsample_conv2d(
            name, input_dim, output_dim, filter_size, inputs,
            he_init=he_init, biases=biases, gain=0.5,
        )
    out = upsample_nearest(inputs)
    return conv2d(
        name, input_dim, output_dim, filter_size, out, he_init=he_init, biases=biases, gain=0.5
    )


def subpixel_conv(name, input_dim, output_dim, filter_size, inputs, *, he_init=True, biases=True):
    """Conv to 4x channels then depth-to-space (CT_gan_64x64.py:101-106)."""
    out = conv2d(name, input_dim, 4 * output_dim, filter_size, inputs, he_init=he_init, biases=biases)
    return depth_to_space(out, 2)


def residual_block(
    name: str,
    input_dim: int,
    output_dim: int,
    filter_size: int,
    inputs: jax.Array,
    *,
    resample: str | None = None,
    labels: jax.Array | None = None,
    normalize: NormFn | None = None,
    nonlinearity=relu,
) -> jax.Array:
    """Pre-activation residual block with optional up/down resampling
    (CT_gan_cifar_resnet.py:111-143)."""
    normalize = normalize or _identity_norm
    if resample == "down":
        def conv_1(n, x):
            return conv2d(n, input_dim, input_dim, filter_size, x)

        def conv_2(n, x):
            return conv_mean_pool(n, input_dim, output_dim, filter_size, x)

        def conv_shortcut(n, x):
            return conv_mean_pool(n, input_dim, output_dim, 1, x, he_init=False, biases=True)

    elif resample == "up":
        def conv_1(n, x):
            return upsample_conv(n, input_dim, output_dim, filter_size, x)

        def conv_2(n, x):
            return conv2d(n, output_dim, output_dim, filter_size, x)

        def conv_shortcut(n, x):
            return upsample_conv(n, input_dim, output_dim, 1, x, he_init=False, biases=True)

    elif resample is None:
        def conv_1(n, x):
            return conv2d(n, input_dim, output_dim, filter_size, x)

        def conv_2(n, x):
            return conv2d(n, output_dim, output_dim, filter_size, x)

        def conv_shortcut(n, x):
            return conv2d(n, input_dim, output_dim, 1, x, he_init=False, biases=True)

    else:
        raise ValueError(f"invalid resample {resample!r}")

    if output_dim == input_dim and resample is None:
        shortcut = inputs
    else:
        shortcut = conv_shortcut(name + ".Shortcut", inputs)

    out = inputs
    out = normalize(name + ".N1", out, labels)
    out = nonlinearity(out)
    out = conv_1(name + ".Conv1", out)
    out = normalize(name + ".N2", out, labels)
    out = nonlinearity(out)
    out = conv_2(name + ".Conv2", out)
    return shortcut + out


def residual_block_stride(
    name: str,
    input_dim: int,
    output_dim: int,
    filter_size: int,
    inputs: jax.Array,
    *,
    resample: str | None = None,
    normalize: NormFn | None = None,
    nonlinearity=relu,
) -> jax.Array:
    """The LSUN-128 block variant: 'down' uses a strided conv for conv_2 and a
    mean-pool-conv shortcut; 'up' uses ScaledUpsampleConv
    (wgan_LSUN_Bedrooms128.py:96-134)."""
    normalize = normalize or _identity_norm
    if resample == "down":
        def conv_1(n, x):
            return conv2d(n, input_dim, input_dim, filter_size, x)

        def conv_2(n, x):
            return conv2d(n, input_dim, output_dim, filter_size, x, stride=2)

        def conv_shortcut(n, x):
            return mean_pool_conv(n, input_dim, output_dim, 1, x, he_init=False, biases=True)

    elif resample == "up":
        def conv_1(n, x):
            return scaled_upsample_conv(n, input_dim, output_dim, filter_size, x)

        def conv_2(n, x):
            return conv2d(n, output_dim, output_dim, filter_size, x)

        def conv_shortcut(n, x):
            return scaled_upsample_conv(n, input_dim, output_dim, 1, x, he_init=False, biases=True)

    elif resample is None:
        def conv_1(n, x):
            return conv2d(n, input_dim, output_dim, filter_size, x)

        def conv_2(n, x):
            return conv2d(n, output_dim, output_dim, filter_size, x)

        def conv_shortcut(n, x):
            return conv2d(n, input_dim, output_dim, 1, x, he_init=False, biases=True)

    else:
        raise ValueError(f"invalid resample {resample!r}")

    if output_dim == input_dim and resample is None:
        shortcut = inputs
    else:
        shortcut = conv_shortcut(name + ".Shortcut", inputs)

    out = inputs
    out = normalize(name + ".N1", out, None)
    out = nonlinearity(out)
    out = conv_1(name + ".Conv1", out)
    out = normalize(name + ".N2", out, None)
    out = nonlinearity(out)
    out = conv_2(name + ".Conv2", out)
    return shortcut + out


def optimized_res_block_disc1(inputs: jax.Array, dim_d: int, *, name: str = "Discriminator.1") -> jax.Array:
    """First discriminator block: conv path + mean-pool shortcut, no norm,
    no pre-activation on the raw image (CT_gan_cifar_resnet.py:145-153)."""
    shortcut = mean_pool_conv(name + ".Shortcut", 3, dim_d, 1, inputs, he_init=False, biases=True)
    out = conv2d(name + ".Conv1", 3, dim_d, 3, inputs)
    out = relu(out)
    out = conv_mean_pool(name + ".Conv2", dim_d, dim_d, 3, out)
    return shortcut + out


def bottleneck_residual_block(
    name: str,
    input_dim: int,
    output_dim: int,
    filter_size: int,
    inputs: jax.Array,
    *,
    resample: str | None = None,
    he_init: bool = True,
    normalize: NormFn | None = None,
) -> jax.Array:
    """Bottleneck block with 0.3-scaled residual (CT_gan_64x64.py:126-164)."""
    normalize = normalize or _identity_norm
    if resample == "down":
        def conv_shortcut(n, x):
            return conv2d(n, input_dim, output_dim, 1, x, stride=2, he_init=False, biases=True)

        def conv_1(n, x):
            return conv2d(n, input_dim, input_dim // 2, 1, x, he_init=he_init)

        def conv_1b(n, x):
            return conv2d(n, input_dim // 2, output_dim // 2, filter_size, x, stride=2, he_init=he_init)

        def conv_2(n, x):
            return conv2d(n, output_dim // 2, output_dim, 1, x, he_init=he_init, biases=False)

    elif resample == "up":
        def conv_shortcut(n, x):
            return subpixel_conv(n, input_dim, output_dim, 1, x, he_init=False, biases=True)

        def conv_1(n, x):
            return conv2d(n, input_dim, input_dim // 2, 1, x, he_init=he_init)

        def conv_1b(n, x):
            return deconv2d(n, input_dim // 2, output_dim // 2, filter_size, x, he_init=he_init)

        def conv_2(n, x):
            return conv2d(n, output_dim // 2, output_dim, 1, x, he_init=he_init, biases=False)

    elif resample is None:
        def conv_shortcut(n, x):
            return conv2d(n, input_dim, output_dim, 1, x, he_init=False, biases=True)

        def conv_1(n, x):
            return conv2d(n, input_dim, input_dim // 2, 1, x, he_init=he_init)

        def conv_1b(n, x):
            return conv2d(n, input_dim // 2, output_dim // 2, filter_size, x, he_init=he_init)

        def conv_2(n, x):
            return conv2d(n, input_dim // 2, output_dim, 1, x, he_init=he_init, biases=False)

    else:
        raise ValueError(f"invalid resample {resample!r}")

    if output_dim == input_dim and resample is None:
        shortcut = inputs
    else:
        shortcut = conv_shortcut(name + ".Shortcut", inputs)

    out = relu(inputs)
    out = conv_1(name + ".Conv1", out)
    out = relu(out)
    out = conv_1b(name + ".Conv1B", out)
    out = relu(out)
    out = conv_2(name + ".Conv2", out)
    out = normalize(name + ".BN", out, None)
    return shortcut + (0.3 * out)
