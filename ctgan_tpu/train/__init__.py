"""Training: optimizers, schedules, GAN/semi-sup trainers, loop utilities."""

from . import optim, schedules
from .trainer_gan import GanConfig, GANState, make_gan_trainer

__all__ = ["optim", "schedules", "GanConfig", "GANState", "make_gan_trainer"]
