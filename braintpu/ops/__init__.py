"""Pallas TPU kernels for the framework's hot ops."""

from .conv3d_pallas import conv3d_tap_merged, pallas_conv_supported

__all__ = ["conv3d_tap_merged", "pallas_conv_supported"]
