"""ctgan_tpu — a TPU-native CT-GAN framework.

A from-scratch JAX/XLA/Pallas/pjit rebuild of the capabilities of the
reference repo biuyq/CT-GAN (ICLR-2018 "Improving the Improved Training of
Wasserstein GANs"): WGAN-GP + consistency-term GAN trainers (MNIST, CIFAR-10
conv + conditional ResNet/ACGAN, 64x64 ImageNet, LSUN-128) and the
semi-supervised feature-matching classifiers (100-label MNIST, 4000-label
CIFAR-10, temporal ensembling) — redesigned for TPU: one fused pjit train
step over a device mesh instead of the reference's 2-GPU in-graph splits,
explicit functional parameter pytrees instead of a global variable store, and
on-device data augmentation instead of host Python loops.
"""

__version__ = "0.1.0"

from . import core, ops

__all__ = ["core", "ops", "__version__"]
