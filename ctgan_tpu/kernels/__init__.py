"""Pallas TPU kernels for the hot ops."""

from .dropout import dropout_mask, pallas_dropout

__all__ = ["dropout_mask", "pallas_dropout"]
