"""Gaussian importance map + sliding-window patch grid planning.

nnU-Net weights each sliding-window patch by a Gaussian centered on the
patch (σ = patch/8), normalized to max 1, with zeros clamped to the smallest
nonzero value; patch start positions are evenly re-spaced so the last patch
ends exactly at the volume edge.  The reference relies on the vendored
nnU-Net for both (invoked at
/root/reference/run_brats2021_inference_singlethread.py:97-106; the
"computing Gaussian" behavior is documented at
PROJECT_DOCUMENTATION.md:439-448).

Both are tiny host-side computations executed once per (patch, volume-shape)
pair and cached; the resulting arrays live on device for the whole scan.
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Sequence, Tuple

import numpy as np
from scipy.ndimage import gaussian_filter

__all__ = ["gaussian_importance_map", "sliding_window_starts", "patch_grid"]


@lru_cache(maxsize=8)
def gaussian_importance_map(
    patch_size: Tuple[int, int, int], sigma_scale: float = 1.0 / 8
) -> np.ndarray:
    """(D, H, W) float32 map: unit impulse at the center, Gaussian-blurred,
    peak-normalized, zero-floor clamped (exact nnU-Net semantics)."""
    imp = np.zeros(patch_size, dtype=np.float64)
    imp[tuple(s // 2 for s in patch_size)] = 1.0
    sigmas = [s * sigma_scale for s in patch_size]
    imp = gaussian_filter(imp, sigmas, mode="constant", cval=0.0)
    imp = (imp / imp.max()).astype(np.float32)
    nonzero_min = imp[imp > 0].min()
    imp[imp == 0] = nonzero_min
    return imp


@lru_cache(maxsize=128)
def sliding_window_starts(
    image_size: Tuple[int, ...], patch_size: Tuple[int, ...], step_size: float = 0.5
) -> Tuple[Tuple[int, ...], ...]:
    """Per-axis patch start offsets (nnU-Net re-spacing formula).

    target step = patch·step_size; the actual step is stretched/shrunk so the
    first patch starts at 0 and the last ends at the volume edge.
    """
    out: List[Tuple[int, ...]] = []
    for size, patch in zip(image_size, patch_size):
        if size < patch:
            raise ValueError(f"image axis {size} < patch {patch}; pad first")
        target = patch * step_size
        num = int(np.ceil((size - patch) / target)) + 1
        if num > 1:
            actual = (size - patch) / (num - 1)
        else:
            actual = 0.0
        out.append(tuple(int(np.round(actual * i)) for i in range(num)))
    return tuple(out)


def patch_grid(
    image_size: Sequence[int], patch_size: Sequence[int], step_size: float = 0.5
) -> np.ndarray:
    """(P, 3) int32 array of all patch start corners, x-fastest ordering."""
    sx, sy, sz = sliding_window_starts(tuple(image_size), tuple(patch_size), step_size)
    grid = [(a, b, c) for a in sx for b in sy for c in sz]
    return np.asarray(grid, dtype=np.int32)
