"""Pallas TPU kernels for hot ops."""

from .norm import PALLAS_NORM_SUPPORTED, instance_norm_pallas, supports_pallas_norm
