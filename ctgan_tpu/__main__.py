"""Unified CLI: ``ctgan-tpu <app> [app args...]`` (or ``python -m ctgan_tpu``).

The reference had no CLI — each workload was a bare ``python script.py``
with module-level constants as config (SURVEY §1 L5; e.g.
``CT_gan_cifar.py:34-43``).  Every workload here is an app module with a
typed ``Config`` dataclass and a ``main(argv)`` that accepts
``--FIELD value`` overrides for every config field; this dispatcher just
routes a short name to the right module so the whole framework is one
installed command.
"""

from __future__ import annotations

import importlib
import sys

# short name -> (module, one-line description, reference script)
APPS = {
    "mnist": ("ctgan_tpu.apps.ct_gan_mnist",
              "CT-GAN on 1000-example MNIST (dcgan/wgan/wgan-CT modes)",
              "CT_gan_mnist.py"),
    "cifar": ("ctgan_tpu.apps.ct_gan_cifar",
              "CT-GAN on 1000-example CIFAR-10 with Inception Score",
              "CT_gan_cifar.py"),
    "cifar-resnet": ("ctgan_tpu.apps.ct_gan_cifar_resnet",
                     "conditional ResNet CT-GAN + ACGAN on full CIFAR-10 (flagship)",
                     "CT_gan_cifar_resnet.py"),
    "good64": ("ctgan_tpu.apps.ct_gan_64x64",
               "64x64 ImageNet-style CT-GAN (architecture zoo)",
               "CT_gan_64x64.py"),
    "lsun128": ("ctgan_tpu.apps.wgan_lsun128",
                "128x128 ResNet WGAN-GP+CT (LSUN bedrooms)",
                "LSUN_bedrooms/wgan_LSUN_Bedrooms128.py"),
    "mnist-ssl": ("ctgan_tpu.apps.ct_mnist_ssl",
                  "semi-supervised 100-label MNIST classifier",
                  "Theano_classifier/CT_MNIST.py"),
    "cifar-ssl": ("ctgan_tpu.apps.ct_cifar_ssl",
                  "semi-supervised 4000-label CIFAR-10 (+--temporal_ensembling)",
                  "Theano_classifier/CT_CIFAR.py, CT_CIFAR-10_TE.py"),
    "onehot-toys": ("ctgan_tpu.apps.onehot_toys",
                    "one-hot WGAN + autoencoder toys",
                    "LSUN_bedrooms/wgan_onehots.py, onehot_autoencoder.py"),
    "generate": ("ctgan_tpu.apps.generate",
                 "sample from a trained checkpoint (serving path)",
                 "(new; reference inlined sampling in the trainers)"),
}


def _usage() -> str:
    lines = ["usage: ctgan-tpu [--platform cpu|tpu|axon] <app> [--FIELD value ...]", "",
             "apps (each accepts --help-style --FIELD overrides of its Config):"]
    width = max(len(k) for k in APPS)
    for name, (_, desc, ref) in APPS.items():
        lines.append(f"  {name:<{width}}  {desc}")
        lines.append(f"  {'':<{width}}    reference: {ref}")
    lines.append("")
    lines.append("e.g.  ctgan-tpu cifar-resnet --ITERS 100000 --out_dir runs/flagship")
    return "\n".join(lines)


def main(argv: list[str] | None = None) -> int:
    try:
        return _dispatch(argv)
    except BrokenPipeError:
        # e.g. ``ctgan-tpu list | head``: the reader closed the pipe; exit
        # quietly like a well-behaved CLI instead of tracebacking.  Covers
        # both the console script and ``python -m ctgan_tpu``.
        sys.stderr.close()
        return 0


def _dispatch(argv: list[str] | None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if argv and argv[0] == "--platform":
        # Force the JAX backend before any app import can initialize one
        # (e.g. ``--platform cpu`` to smoke-test on a machine whose TPU is
        # busy).  Must be the first argument.
        if len(argv) < 2:
            print("ctgan-tpu: --platform needs a value (cpu|tpu|axon)", file=sys.stderr)
            return 2
        import jax

        jax.config.update("jax_platforms", argv[1])
        argv = argv[2:]
    if not argv or argv[0] in ("-h", "--help", "list"):
        print(_usage())
        return 0
    name, rest = argv[0], argv[1:]
    if name not in APPS:
        print(f"ctgan-tpu: unknown app '{name}'\n\n{_usage()}", file=sys.stderr)
        return 2
    module = importlib.import_module(APPS[name][0])
    module.main(rest)
    return 0


if __name__ == "__main__":
    sys.exit(main())
