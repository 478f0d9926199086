"""Weight-initialization distributions.

GAN training in the reference is init-sensitive, so these reproduce the exact
distributions from ``tflib/ops/linear.py:40-104`` and
``tflib/ops/conv2d.py:57-83``: every scheme is a *uniform* distribution with
half-width ``stdev * sqrt(3)`` (variance ``stdev**2``), plus the orthogonal
sampler.  Initialization happens on the host with NumPy (as in the reference)
via the ``Context`` rng; device arrays are created once at init.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "uniform_stdev",
    "linear_initializer",
    "conv_filter_stdev",
    "orthogonal",
    "WeightsStdevOverride",
]


class WeightsStdevOverride:
    """Module-wide stdev override (``set_weights_stdev`` in the reference).

    DCGAN architectures set a global 0.02 stdev for every op while building
    (``CT_gan_64x64.py:243-246``).  Modeled as a context manager instead of
    mutable module globals.
    """

    _stack: list[float] = []

    def __init__(self, stdev: float):
        self.stdev = stdev

    def __enter__(self):
        WeightsStdevOverride._stack.append(self.stdev)
        return self

    def __exit__(self, *exc):
        WeightsStdevOverride._stack.pop()

    @classmethod
    def current(cls) -> float | None:
        return cls._stack[-1] if cls._stack else None


def uniform_stdev(rng: np.random.Generator, stdev: float, size) -> np.ndarray:
    """U(-stdev*sqrt(3), stdev*sqrt(3)) — variance = stdev^2."""
    override = WeightsStdevOverride.current()
    if override is not None:
        stdev = override
    lim = stdev * np.sqrt(3)
    return rng.uniform(low=-lim, high=lim, size=size).astype("float32")


def orthogonal(rng: np.random.Generator, shape) -> np.ndarray:
    """Lasagne-style orthogonal init (tflib/ops/linear.py:76-92)."""
    if len(shape) < 2:
        raise ValueError("orthogonal init needs >=2-D shape")
    flat_shape = (shape[0], int(np.prod(shape[1:])))
    a = rng.normal(0.0, 1.0, flat_shape)
    u, _, v = np.linalg.svd(a, full_matrices=False)
    q = u if u.shape == flat_shape else v
    return q.reshape(shape).astype("float32")


def linear_initializer(
    rng: np.random.Generator,
    input_dim: int,
    output_dim: int,
    initialization: str | tuple | None,
    gain: float = 1.0,
) -> np.ndarray:
    """The Linear init menu (tflib/ops/linear.py:48-104).

    None defaults to glorot, except square matrices default to orthogonal —
    reproducing the reference's quirky ``initialization == None and
    input_dim == output_dim`` branch ordering (glorot wins because it is
    checked first; the orthogonal fallback is unreachable for None). We match
    the *effective* behaviour: None -> glorot always.
    """
    shape = (input_dim, output_dim)
    if initialization == "lecun":
        w = uniform_stdev(rng, np.sqrt(1.0 / input_dim), shape)
    elif initialization == "glorot" or initialization is None:
        w = uniform_stdev(rng, np.sqrt(2.0 / (input_dim + output_dim)), shape)
    elif initialization == "he":
        w = uniform_stdev(rng, np.sqrt(2.0 / input_dim), shape)
    elif initialization == "glorot_he":
        w = uniform_stdev(rng, np.sqrt(4.0 / (input_dim + output_dim)), shape)
    elif initialization == "orthogonal":
        w = orthogonal(rng, shape)
    elif isinstance(initialization, (tuple, list)) and initialization[0] == "uniform":
        w = rng.uniform(
            low=-initialization[1], high=initialization[1], size=shape
        ).astype("float32")
    else:
        raise ValueError(f"Invalid initialization: {initialization!r}")
    return w * gain


def conv_filter_stdev(
    input_dim: int,
    output_dim: int,
    filter_size: int,
    stride: int = 1,
    he_init: bool = True,
    masked: bool = False,
    transposed: bool = False,
) -> float:
    """Fan-based filter stdev (tflib/ops/conv2d.py:62-83, deconv2d.py:48-55).

    The reference calls ``sqrt(4/(fan_in+fan_out))`` "he" and
    ``sqrt(2/(fan_in+fan_out))`` glorot.  For transposed convs the stride
    divides fan_in instead of fan_out.
    """
    if transposed:
        fan_in = input_dim * filter_size**2 / (stride**2)
        fan_out = output_dim * filter_size**2
    else:
        fan_in = input_dim * filter_size**2
        fan_out = output_dim * filter_size**2 / (stride**2)
    if masked:  # "only approximately correct" per the reference
        fan_in /= 2.0
        fan_out /= 2.0
    if he_init:
        return float(np.sqrt(4.0 / (fan_in + fan_out)))
    return float(np.sqrt(2.0 / (fan_in + fan_out)))
