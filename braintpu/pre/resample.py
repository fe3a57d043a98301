"""Volume resampling (trilinear / nearest) as pure XLA ops.

Used on the export path when predicted probability maps must be brought back
to the original voxel grid (the reference's
``save_segmentation_nifti_from_softmax(..., interpolation_order=1,
interpolation_order_z=0)`` call at
/root/reference/run_brats2021_inference_singlethread.py:131-156).  For BraTS
(1 mm in = 1 mm out) this is an identity, but the framework supports arbitrary
grids.

Coordinate convention matches ``skimage.transform.resize`` (what nnU-Net's
``resample_data_or_seg`` uses): center-aligned sampling,
``src = (dst + 0.5) * in_size / out_size - 0.5``, edge-clamped.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

__all__ = ["resize_trilinear", "resize_nearest"]


def _src_coords(out_size: int, in_size: int, dtype=jnp.float32) -> jnp.ndarray:
    scale = in_size / out_size
    return (jnp.arange(out_size, dtype=dtype) + 0.5) * scale - 0.5


def _gather_axis(vol: jnp.ndarray, idx: jnp.ndarray, axis: int) -> jnp.ndarray:
    return jnp.take(vol, idx, axis=axis)


@partial(jax.jit, static_argnums=(1,))
def resize_trilinear(vol: jnp.ndarray, new_shape: Tuple[int, int, int]) -> jnp.ndarray:
    """Trilinear resize of the trailing 3 axes of ``vol`` (any leading axes).

    Separable implementation: three 1-D lerps, each expressed as two gathers
    and a weighted add — XLA fuses this into bandwidth-bound code.
    """
    ndim = vol.ndim
    out = vol
    for i, target in enumerate(new_shape):
        axis = ndim - 3 + i
        in_size = out.shape[axis]
        if in_size == target:
            continue
        c = _src_coords(target, in_size)
        lo = jnp.clip(jnp.floor(c), 0, in_size - 1).astype(jnp.int32)
        hi = jnp.clip(lo + 1, 0, in_size - 1)
        w = jnp.clip(c - lo.astype(c.dtype), 0.0, 1.0)
        shape = [1] * ndim
        shape[axis] = target
        w = w.reshape(shape).astype(out.dtype)
        out = _gather_axis(out, lo, axis) * (1 - w) + _gather_axis(out, hi, axis) * w
    return out


@partial(jax.jit, static_argnums=(1,))
def resize_nearest(vol: jnp.ndarray, new_shape: Tuple[int, int, int]) -> jnp.ndarray:
    """Nearest-neighbour resize of the trailing 3 axes (labels / masks)."""
    ndim = vol.ndim
    out = vol
    for i, target in enumerate(new_shape):
        axis = ndim - 3 + i
        in_size = out.shape[axis]
        if in_size == target:
            continue
        c = _src_coords(target, in_size)
        idx = jnp.clip(jnp.round(c), 0, in_size - 1).astype(jnp.int32)
        out = _gather_axis(out, idx, axis)
    return out
