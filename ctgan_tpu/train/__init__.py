"""Training: optimizers, schedules, GAN/semi-sup trainers, loop utilities."""

from . import optim, schedules
from .loop import LoopConfig, train_loop
from .recalibrate import recalibrate_bn
from .trainer_acgan import AcganConfig, AcganState, make_acgan_trainer
from .trainer_gan import GanConfig, GANState, make_gan_trainer
from .unfused import make_unfused_step
from .trainer_semisup import SslConfig, SslState, make_ssl_trainer
from .wn_init import data_dependent_init

__all__ = [
    "optim", "schedules", "LoopConfig", "train_loop",
    "AcganConfig", "AcganState", "make_acgan_trainer",
    "GanConfig", "GANState", "make_gan_trainer", "make_unfused_step",
    "recalibrate_bn",
    "SslConfig", "SslState", "make_ssl_trainer", "data_dependent_init",
]
