"""TPU-native op/layer library — rebuild of the reference's ``tflib/ops``
(TF side) and ``nn.py`` (Theano side) surfaces on JAX/XLA.

All spatial ops are NHWC (TPU-native); parameters are created through the
functional named store in :mod:`ctgan_tpu.core.store`.
"""

from .activations import (
    centered_softplus,
    gated_nonlinearity,
    leaky_relu,
    log_sum_exp,
    lrelu,
    relu,
    softplus,
)
from .conv import (
    conv1d,
    conv2d,
    conv_mean_pool2d,
    deconv2d,
    mean_pool_conv2d,
    separable_conv2d,
    upsample_conv2d,
)
from .dropout import dropout
from .embedding import embedding
from .linear import linear
from .lsuv import lsuv_init
from .minibatch import minibatch_discrimination
from .mlp import mlp
from .noise import gaussian_noise
from .norm import batchnorm, cond_batchnorm, cond_layernorm, layernorm
from .pool import (
    depth_to_space,
    global_mean_pool,
    mean_pool,
    space_to_depth,
    upsample_nearest,
)
from .recurrent import gru, gru_step, rnn, rnn_step
from .stats import kl_gaussian_gaussian, kl_unit_gaussian
from .weightnorm import l2_dense, wn_conv2d, wn_deconv2d, wn_dense

__all__ = [
    "centered_softplus", "gated_nonlinearity", "leaky_relu", "log_sum_exp",
    "lrelu", "relu", "softplus",
    "conv1d", "conv2d", "deconv2d", "separable_conv2d", "upsample_conv2d",
    "conv_mean_pool2d", "mean_pool_conv2d",
    "dropout", "embedding", "linear", "minibatch_discrimination", "mlp",
    "gaussian_noise", "batchnorm", "cond_batchnorm", "cond_layernorm",
    "layernorm", "depth_to_space", "global_mean_pool", "mean_pool",
    "space_to_depth", "upsample_nearest", "gru", "gru_step", "rnn", "rnn_step",
    "kl_gaussian_gaussian", "kl_unit_gaussian",
    "l2_dense", "wn_conv2d", "wn_deconv2d", "wn_dense", "lsuv_init",
]
