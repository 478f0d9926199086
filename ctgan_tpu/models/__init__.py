"""Model zoo — all architectures from the reference, NHWC/TPU-native.

* :mod:`dcgan` — MNIST, CIFAR conv, 64x64 DCGAN (+ gated/crippled variants)
* :mod:`resnet_cifar` — conditional ResNet/ACGAN CT-GAN (flagship)
* :mod:`good64` — 64x64 "Good" ResNet and 101-layer bottleneck ResNet
* :mod:`lsun128` — 128x128 ResNet WGAN-GP+CT
* :mod:`fc` — fully-connected G/D
* :mod:`classifiers` — semi-supervised GAN classifiers (Theano side)
"""

from . import blocks, classifiers, common, dcgan, fc, good64, lsun128, resnet_cifar

__all__ = [
    "blocks", "classifiers", "common", "dcgan", "fc", "good64", "lsun128",
    "resnet_cifar",
]
