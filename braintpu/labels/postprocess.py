"""Segmentation post-processing: the KAIST ET minimum-size rule and
largest-component filtering.

The original winning recipe applies ``apply_threshold_to_folder(..., 200, 2)``
after the softmax-level ensemble: if the enhancing-tumor region has fewer than
200 voxels, relabel those voxels to tumor core (internal label 2), because a
tiny predicted ET is usually noise
(ref: /root/reference/archived/kaist_original_inference.py:30-34).

Connected components run on host (scipy) — a 3D label pass over one volume is
microseconds-level work and inherently sequential; keeping it off-device
avoids polluting the jit cache with dynamic component counts.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
from scipy import ndimage as ndi

__all__ = ["et_min_size_postprocess", "keep_largest_component"]

#: 26-connectivity structuring element for 3D components.
STRUCT_26 = np.ones((3, 3, 3), dtype=bool)


def et_min_size_postprocess(
    seg: np.ndarray,
    et_label: int = 3,
    replace_with: int = 2,
    min_voxels: int = 200,
) -> np.ndarray:
    """If total ET volume < ``min_voxels``, convert ET voxels to ``replace_with``.

    Matches nnU-Net's ``apply_threshold_to_folder`` semantics (threshold on the
    *total* ET voxel count, not per-component).  Defaults are the KAIST
    recipe's (200 voxels → internal NCR/TC label 2).
    """
    seg = np.asarray(seg)
    et_mask = seg == et_label
    n = int(et_mask.sum())
    if 0 < n < min_voxels:
        out = seg.copy()
        out[et_mask] = replace_with
        return out
    return seg


def keep_largest_component(
    mask: np.ndarray, connectivity_26: bool = True
) -> Tuple[np.ndarray, int]:
    """Keep only the largest connected component of a boolean mask.

    Returns ``(filtered_mask, num_components)``.
    """
    mask = np.asarray(mask, dtype=bool)
    structure = STRUCT_26 if connectivity_26 else None
    labeled, n = ndi.label(mask, structure=structure)
    if n <= 1:
        return mask, n
    sizes = np.bincount(labeled.ravel())
    sizes[0] = 0
    return labeled == int(np.argmax(sizes)), n
