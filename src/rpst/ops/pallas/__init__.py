"""Pallas TPU kernels for the framework's hot ops."""

from .flash_attention import flash_attention, sanet_attention

__all__ = ["flash_attention", "sanet_attention"]
