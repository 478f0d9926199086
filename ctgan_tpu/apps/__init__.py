"""Entry-point trainers — the L5 "CLI" layer of the reference rebuilt as
``python -m ctgan_tpu.apps.<name>`` modules with argparse configs:

=====================  ===========================================
reference script        app module
=====================  ===========================================
CT_gan_mnist.py         ct_gan_mnist
CT_gan_cifar.py         ct_gan_cifar
CT_gan_cifar_resnet.py  ct_gan_cifar_resnet (flagship)
CT_gan_64x64.py         ct_gan_64x64 (--ARCH zoo)
wgan_LSUN_Bedrooms128   wgan_lsun128
CT_MNIST.py             ct_mnist_ssl
CT_CIFAR.py             ct_cifar_ssl
CT_CIFAR-10_TE.py       ct_cifar_ssl --temporal_ensembling true
wgan_onehots.py         onehot_toys --which wgan
onehot_autoencoder.py   onehot_toys --which ae
=====================  ===========================================
"""

import importlib

__all__ = [
    "common", "generate", "ct_cifar_ssl", "ct_gan_64x64", "ct_gan_cifar",
    "ct_gan_cifar_resnet", "ct_gan_mnist", "ct_mnist_ssl", "onehot_toys",
    "wgan_lsun128",
]


def __getattr__(name):  # PEP 562: lazy submodule imports
    # Eager imports here made every `python -m ctgan_tpu.apps.<x>` pull in
    # ALL app modules (and their model imports) before runpy executed the
    # requested one — slower starts plus a runpy double-import warning.
    if name in __all__:
        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
