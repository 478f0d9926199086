"""Data pipeline: loaders with synthetic fallback, resumable iterators,
on-device augmentation, prefetch."""

from . import augment, cifar10, images_dir, iterator, mnist, synthetic
from .augment import dequantize, random_crop_flip, random_flip, two_stream_augment
from .iterator import DeviceSampler, EpochIterator, stack_batches

__all__ = [
    "augment", "cifar10", "images_dir", "iterator", "mnist", "synthetic",
    "dequantize", "random_crop_flip", "random_flip", "two_stream_augment",
    "DeviceSampler", "EpochIterator", "stack_batches",
]
