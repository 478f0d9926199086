"""Convolution ops (rebuild of ``tflib/ops/conv2d.py``, ``deconv2d.py``,
``conv1d.py``, ``separable_conv2d.py``).

Layout: **NHWC activations, HWIO filters** — the TPU-native layout (XLA tiles
channels-last convs directly onto the MXU; the reference's NCHW was a cuDNN
preference, see ``tflib/ops/conv2d.py:106-112``).  Models convert from the
flat/NCHW external interface once at the boundary.

All convs use SAME padding and the reference's fan-based uniform init
(``ops.init``).  Optional features mirrored from the reference: autoregressive
masks 'a'/'b', weight-norm reparameterization, stride, gain, bias toggles.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import store
from ..core.matmul import conv as _mxu_conv, conv_transpose as _mxu_conv_transpose
from .init import conv_filter_stdev, uniform_stdev

__all__ = [
    "conv2d", "deconv2d", "conv1d", "separable_conv2d", "upsample_conv2d",
    "conv_mean_pool2d", "mean_pool_conv2d",
]


def _upsample_collapse_map(filter_size: int) -> tuple[np.ndarray, int]:
    """Constant map M[u, v, a, b, r, c] in {0,1} that rewrites
    ``conv(upsample_nearest_2x(x), W)`` as a conv on the SMALL input.

    Nearest 2x upsample means U(x)[p] = x[floor(p/2)], so the big-grid tap
    at output (2i+a) with kernel row u reads x[i + floor((a+u-pad)/2)] —
    per output parity ``a`` the K taps collapse onto a few small-grid
    offsets.  M scatters each W[u, v] onto the collapsed kernel position
    (r, c) of the parity-(a, b) sub-kernel.  Exact for any odd K including
    zero-padding boundaries (p out of [0, 2H) iff floor(p/2) out of
    [0, H)).
    """
    pad = (filter_size - 1) // 2
    offs = {
        a: [(a + u - pad) // 2 for u in range(filter_size)] for a in (0, 1)
    }
    maxoff = max(abs(o) for a in (0, 1) for o in offs[a])
    ks = 2 * maxoff + 1
    m = np.zeros((filter_size, filter_size, 2, 2, ks, ks), dtype="float32")
    for a in (0, 1):
        for b in (0, 1):
            for u in range(filter_size):
                for v in range(filter_size):
                    m[u, v, a, b, offs[a][u] + maxoff, offs[b][v] + maxoff] = 1.0
    return m, ks


def upsample_conv2d(
    name: str,
    input_dim: int,
    output_dim: int,
    filter_size: int,
    inputs: jax.Array,
    *,
    he_init: bool = True,
    weightnorm: bool = False,
    biases: bool = True,
    gain: float = 1.0,
) -> jax.Array:
    """``conv2d(name, ..., upsample_nearest(inputs))`` computed WITHOUT
    materializing the 4x-sized intermediate.

    Parameters (name, shape, init) are identical to the plain path, so
    checkpoints are interchangeable; the parity-collapsed kernel
    ``W'[r,c,i,(a,b,o)]`` is derived in-trace (a tiny einsum XLA folds into
    the step) and one SAME conv on the small input + depth_to_space yields
    the bit-equivalent output up to float reassociation.  On HBM-bound TPU
    steps this removes a 4HW*Cin activation write+read per generator block
    (the reference's UpsampleConv, CT_gan_cifar_resnet.py:103-109, runs the
    conv on the upsampled grid)."""
    if filter_size % 2 != 1:
        raise ValueError(
            f"upsample_conv2d requires an odd filter_size (got {filter_size}): "
            "the parity-collapse map assumes the symmetric (K-1)//2 padding "
            "that SAME convs only have for odd kernels"
        )
    ctx = store.current_context()
    stdev = conv_filter_stdev(input_dim, output_dim, filter_size, 1, he_init)

    def make_filters():
        f = uniform_stdev(
            ctx.rng, stdev, (filter_size, filter_size, input_dim, output_dim)
        )
        return f * gain

    filters = store.param(name + ".Filters", make_filters)
    if weightnorm:
        filters = _weightnormed(name, filters, (0, 1, 2))

    m, ks = _upsample_collapse_map(filter_size)
    # [ks, ks, Cin, a, b, Cout] -> [ks, ks, Cin, 4*Cout] with (a, b, o)
    # channel order matching depth_to_space's [block, block, C] layout
    w4 = jnp.einsum(
        "uvio,uvabrc->rciabo", filters, jnp.asarray(m, filters.dtype)
    ).reshape(ks, ks, input_dim, 4 * output_dim)

    small = _mxu_conv(
        inputs,
        w4,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    n, h, w, _ = small.shape
    out = small.reshape(n, h, w, 2, 2, output_dim)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * w, output_dim)
    if biases:
        b = store.param(name + ".Biases", lambda: np.zeros(output_dim, dtype="float32"))
        out = out + b.astype(out.dtype)
    return out


def _require_even_hw(fn_name: str, inputs: jax.Array) -> None:
    h, w = inputs.shape[1], inputs.shape[2]
    if h % 2 or w % 2:
        raise ValueError(
            f"{fn_name} requires even spatial dims (got {h}x{w}): the fused "
            "stride-2 rewrite assumes non-overlapping 2x2 pool windows"
        )


def conv_mean_pool2d(
    name: str,
    input_dim: int,
    output_dim: int,
    filter_size: int,
    inputs: jax.Array,
    *,
    he_init: bool = True,
    biases: bool = True,
    gain: float = 1.0,
) -> jax.Array:
    """``mean_pool(conv2d(name, ...))`` WITHOUT the full-resolution conv
    output ever touching HBM.

    conv (SAME, odd K) followed by 2x2/stride-2 mean-pool is algebraically a
    single stride-2 conv whose (K+1)x(K+1) kernel is the original kernel
    convolved with the 2x2 box / 4, padded (K-1)//2 per side — exact
    including zero-padding boundaries for even H, W (p = a + u, the pool
    offset plus the tap).  XLA cannot perform this rewrite (it changes the
    conv's algorithm, not its schedule): the unfused pair materializes the
    4x-larger pre-pool activation and a reduce per down-block, and the
    reduce's VJP re-materializes it as a broadcast — on the flagship step
    those broadcasts + reduces are the two largest non-conv HBM categories
    (tools/hlo_breakdown.py).  The fused form also does ~2.25x fewer MXU
    MACs for K=3 ((K+1)^2/4 vs K^2 taps per pooled output).

    Parameters (name, shape, init) are identical to the plain
    ``conv2d`` + ``mean_pool`` path, so checkpoints are interchangeable.
    Reference: ConvMeanPool, CT_gan_cifar_resnet.py:89-96.
    """
    if filter_size % 2 != 1:
        raise ValueError(
            f"conv_mean_pool2d requires an odd filter_size (got {filter_size})"
        )
    _require_even_hw("conv_mean_pool2d", inputs)
    ctx = store.current_context()
    stdev = conv_filter_stdev(input_dim, output_dim, filter_size, 1, he_init)

    def make_filters():
        f = uniform_stdev(
            ctx.rng, stdev, (filter_size, filter_size, input_dim, output_dim)
        )
        return f * gain

    filters = store.param(name + ".Filters", make_filters)
    # Kf[p, q] = 1/4 * sum_{a,b in {0,1}} K[p-a, q-b]: the four zero-padded
    # shifts of K summed — K convolved with the 2x2 box, size (K+1, K+1).
    kf = 0.25 * sum(
        jnp.pad(filters, ((a, 1 - a), (b, 1 - b), (0, 0), (0, 0)))
        for a in (0, 1)
        for b in (0, 1)
    )
    k = (filter_size - 1) // 2
    out = _mxu_conv(
        inputs,
        kf,
        window_strides=(2, 2),
        padding=[(k, k), (k, k)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if biases:
        b = store.param(name + ".Biases", lambda: np.zeros(output_dim, dtype="float32"))
        out = out + b.astype(out.dtype)
    return out


def mean_pool_conv2d(
    name: str,
    input_dim: int,
    output_dim: int,
    filter_size: int,
    inputs: jax.Array,
    *,
    he_init: bool = True,
    biases: bool = True,
    gain: float = 1.0,
) -> jax.Array:
    """``conv2d(name, ..., mean_pool(inputs))`` WITHOUT materializing the
    pooled intermediate.

    2x2/stride-2 mean-pool followed by a SAME conv (odd K) is a single
    stride-2 conv whose 2Kx2K kernel duplicates each original tap over its
    2x2 pool window / 4 (Kf[2u+a, 2v+b] = K[u,v]/4), padded K-1 per side —
    exact including boundaries for even H, W (the half-grid zero padding
    covers whole pool windows).  Used for the 1x1 shortcut convs
    (K=1: a 2x2/stride-2 kernel, zero pad), where it removes the pooled
    activation's HBM round-trip at unchanged MAC count.  Params are
    identical to the plain path.  Reference: MeanPoolConv,
    CT_gan_cifar_resnet.py:97-101.
    """
    if filter_size % 2 != 1:
        raise ValueError(
            f"mean_pool_conv2d requires an odd filter_size (got {filter_size})"
        )
    _require_even_hw("mean_pool_conv2d", inputs)
    ctx = store.current_context()
    stdev = conv_filter_stdev(input_dim, output_dim, filter_size, 1, he_init)

    def make_filters():
        f = uniform_stdev(
            ctx.rng, stdev, (filter_size, filter_size, input_dim, output_dim)
        )
        return f * gain

    filters = store.param(name + ".Filters", make_filters)
    kf = 0.25 * jnp.repeat(jnp.repeat(filters, 2, axis=0), 2, axis=1)
    k2 = filter_size - 1  # = 2 * (K-1)//2 for odd K
    out = _mxu_conv(
        inputs,
        kf,
        window_strides=(2, 2),
        padding=[(k2, k2), (k2, k2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if biases:
        b = store.param(name + ".Biases", lambda: np.zeros(output_dim, dtype="float32"))
        out = out + b.astype(out.dtype)
    return out


def _ar_mask(filter_size: int, input_dim: int, output_dim: int, mask_type: str, n_channels: int) -> np.ndarray:
    """PixelCNN-style autoregressive mask (tflib/ops/conv2d.py:29-52)."""
    mask = np.ones((filter_size, filter_size, input_dim, output_dim), dtype="float32")
    center = filter_size // 2
    mask[center + 1 :, :, :, :] = 0.0
    mask[center, center + 1 :, :, :] = 0.0
    for i in range(n_channels):
        for j in range(n_channels):
            if (mask_type == "a" and i >= j) or (mask_type == "b" and i > j):
                mask[center, center, i::n_channels, j::n_channels] = 0.0
    return mask


def _weightnormed(name: str, filters: jax.Array, axis_reduce) -> jax.Array:
    """Scale filters so each output channel's norm is the learned g.

    ``axis_reduce`` are the reduced axes; the ratio is broadcast back along
    the remaining (output-channel) axis wherever it sits in the layout.
    """
    f_init = filters

    def make_g():
        return np.sqrt(
            np.sum(np.square(np.asarray(f_init)), axis=axis_reduce)
        ).astype("float32")

    target_norms = store.param(name + ".g", make_g)
    norms = jnp.sqrt(jnp.sum(jnp.square(filters), axis=axis_reduce))
    ratio = target_norms / norms
    shape = [1] * filters.ndim
    (out_axis,) = [d for d in range(filters.ndim) if d not in axis_reduce]
    shape[out_axis] = filters.shape[out_axis]
    return filters * ratio.reshape(shape)


def conv2d(
    name: str,
    input_dim: int,
    output_dim: int,
    filter_size: int,
    inputs: jax.Array,
    *,
    he_init: bool = True,
    mask_type: tuple | None = None,
    stride: int = 1,
    weightnorm: bool = False,
    biases: bool = True,
    gain: float = 1.0,
) -> jax.Array:
    """2-D SAME conv on NHWC input (tflib/ops/conv2d.py:20-123)."""
    ctx = store.current_context()
    masked = mask_type is not None
    stdev = conv_filter_stdev(
        input_dim, output_dim, filter_size, stride, he_init, masked=masked
    )

    def make_filters():
        f = uniform_stdev(
            ctx.rng, stdev, (filter_size, filter_size, input_dim, output_dim)
        )
        return f * gain

    filters = store.param(name + ".Filters", make_filters)
    if weightnorm:
        filters = _weightnormed(name, filters, (0, 1, 2))
    if masked:
        mtype, n_ch = mask_type
        filters = filters * jnp.asarray(
            _ar_mask(filter_size, input_dim, output_dim, mtype, n_ch)
        )

    result = _mxu_conv(
        inputs,
        filters,
        window_strides=(stride, stride),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if biases:
        b = store.param(name + ".Biases", lambda: np.zeros(output_dim, dtype="float32"))
        result = result + b.astype(result.dtype)
    return result


def deconv2d(
    name: str,
    input_dim: int,
    output_dim: int,
    filter_size: int,
    inputs: jax.Array,
    *,
    he_init: bool = True,
    weightnorm: bool = False,
    biases: bool = True,
    gain: float = 1.0,
    stride: int = 2,
) -> jax.Array:
    """Stride-2 transposed conv, SAME, 2x upsampling on NHWC input.

    Matches ``tf.nn.conv2d_transpose`` semantics (tflib/ops/deconv2d.py:89-112):
    output spatial dims are exactly ``stride *`` input dims.  Filter layout is
    HWOI (height, width, out_channels, in_channels) like TF's transposed-conv
    filters; ``transpose_kernel=True`` makes ``lax.conv_transpose`` compute the
    true gradient-of-conv, which is what TF does.
    """
    ctx = store.current_context()
    stdev = conv_filter_stdev(
        input_dim, output_dim, filter_size, stride, he_init, transposed=True
    )

    def make_filters():
        f = uniform_stdev(
            ctx.rng, stdev, (filter_size, filter_size, output_dim, input_dim)
        )
        return f * gain

    filters = store.param(name + ".Filters", make_filters)
    if weightnorm:
        # per-output-channel norms: reduce over (H, W, I) = axes (0, 1, 3)
        filters = _weightnormed(name, filters, (0, 1, 3))

    result = _mxu_conv_transpose(
        inputs,
        filters,
        strides=(stride, stride),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if biases:
        b = store.param(name + ".Biases", lambda: np.zeros(output_dim, dtype="float32"))
        result = result + b.astype(result.dtype)
    return result


def conv1d(
    name: str,
    input_dim: int,
    output_dim: int,
    filter_size: int,
    inputs: jax.Array,
    *,
    he_init: bool = True,
    mask_type: tuple | None = None,
    stride: int = 1,
    weightnorm: bool = False,
    biases: bool = True,
    gain: float = 1.0,
) -> jax.Array:
    """1-D SAME conv on NWC input (tflib/ops/conv1d.py:11-108)."""
    ctx = store.current_context()
    masked = mask_type is not None
    fan_in = input_dim * filter_size
    fan_out = output_dim * filter_size / stride
    if masked:
        fan_in /= 2.0
        fan_out /= 2.0
    stdev = float(np.sqrt((4.0 if he_init else 2.0) / (fan_in + fan_out)))

    def make_filters():
        return uniform_stdev(ctx.rng, stdev, (filter_size, input_dim, output_dim)) * gain

    filters = store.param(name + ".Filters", make_filters)
    if weightnorm:
        f_init = filters

        def make_g():
            return np.sqrt(
                np.sum(np.square(np.asarray(f_init)), axis=(0, 1))
            ).astype("float32")

        target_norms = store.param(name + ".g", make_g)
        norms = jnp.sqrt(jnp.sum(jnp.square(filters), axis=(0, 1)))
        filters = filters * (target_norms / norms)
    if masked:
        mtype, n_ch = mask_type
        mask = np.ones((filter_size, input_dim, output_dim), dtype="float32")
        center = filter_size // 2
        mask[center + 1 :, :, :] = 0.0
        for i in range(n_ch):
            for j in range(n_ch):
                if (mtype == "a" and i >= j) or (mtype == "b" and i > j):
                    mask[center, i::n_ch, j::n_ch] = 0.0
        filters = filters * jnp.asarray(mask)

    result = _mxu_conv(
        inputs,
        filters,
        window_strides=(stride,),
        padding="SAME",
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    if biases:
        b = store.param(name + ".Biases", lambda: np.zeros(output_dim, dtype="float32"))
        result = result + b.astype(result.dtype)
    return result


def separable_conv2d(
    name: str,
    input_dim: int,
    output_dim: int,
    filter_size: int,
    inputs: jax.Array,
    *,
    depth_multiplier: int = 1,
    stride: int = 1,
    biases: bool = True,
) -> jax.Array:
    """Depthwise-separable conv (LSUN fork ``ops/separable_conv2d.py``)."""
    ctx = store.current_context()
    dw_stdev = conv_filter_stdev(input_dim, input_dim * depth_multiplier, filter_size, stride, True)
    pw_stdev = conv_filter_stdev(input_dim * depth_multiplier, output_dim, 1, 1, True)

    depthwise = store.param(
        name + ".DepthwiseFilters",
        lambda: uniform_stdev(
            ctx.rng, dw_stdev, (filter_size, filter_size, input_dim, depth_multiplier)
        ),
    )
    pointwise = store.param(
        name + ".PointwiseFilters",
        lambda: uniform_stdev(
            ctx.rng, pw_stdev, (1, 1, input_dim * depth_multiplier, output_dim)
        ),
    )
    # depthwise: feature_group_count = input_dim, filters reshaped HW1(I*M)
    dw = depthwise.reshape(filter_size, filter_size, 1, input_dim * depth_multiplier)
    out = _mxu_conv(
        inputs,
        dw,
        window_strides=(stride, stride),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=input_dim,
    )
    out = _mxu_conv(
        out,
        pointwise,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if biases:
        b = store.param(name + ".Biases", lambda: np.zeros(output_dim, dtype="float32"))
        out = out + b.astype(out.dtype)
    return out
