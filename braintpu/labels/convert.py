"""Label-space remapping between nnU-Net internal and BraTS conventions.

Internal (regions export with ``region_class_order=(1,2,3)``):
0 = background, 1 = ED (WT-only), 2 = NCR (TC-not-ET), 3 = ET
(ref: /root/reference/convert_labels_to_brats.py:1-56).

BraTS-2025: 1 = NCR, 2 = ED, 3 = ET.
BraTS-2021: 1 = NCR, 2 = ED, 4 = ET.

Instead of the reference's three boolean-mask passes, remaps are a single
lookup-table gather — one fused XLA op, trivially batched/jittable.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "INTERNAL_ED",
    "INTERNAL_NCR",
    "INTERNAL_ET",
    "remap_labels",
    "internal_to_brats2025",
    "internal_to_brats2021",
    "brats2025_to_internal",
    "brats2021_to_internal",
    "brats2021_to_brats2025",
    "brats2025_to_brats2021",
    "normalize_to_brats2025",
]

INTERNAL_ED = 1
INTERNAL_NCR = 2
INTERNAL_ET = 3

_INTERNAL_TO_2025 = (0, 2, 1, 3)  # index = internal label
_INTERNAL_TO_2021 = (0, 2, 1, 4)
_2021_TO_2025 = (0, 1, 2, 0, 3)  # label 3 unused in 2021 space
_2025_TO_2021 = (0, 1, 2, 4)
_ANY_TO_2025 = (0, 1, 2, 3, 3)  # both ET spellings (2021: 4, 2025: 3) → 3


def remap_labels(seg, table):
    """Remap integer labels through a lookup table (rounding floats first).

    ``table[i]`` is the output label for input label ``i``; labels outside the
    table map to 0.

    Device arrays stay on device (one fused gather, jit/batch friendly).
    Host arrays take a pure-numpy path and return numpy: a full-volume
    device round-trip just to remap uint8 labels costs seconds through a
    remote-dispatch TPU link (readback bandwidth), vs ~10 ms on host.
    """
    if isinstance(seg, jax.Array):
        lut = jnp.asarray(table, dtype=jnp.uint8)
        if jnp.issubdtype(seg.dtype, jnp.floating):
            seg = jnp.round(seg)
        idx = jnp.clip(seg.astype(jnp.int32), 0, lut.shape[0] - 1)
        valid = (seg >= 0) & (seg < lut.shape[0])
        return jnp.where(valid, lut[idx], 0).astype(jnp.uint8)
    seg = np.asarray(seg)
    if np.issubdtype(seg.dtype, np.floating):
        seg = np.round(seg)
    if seg.dtype == np.uint8:
        # single-gather fast path: pad the table to every possible uint8 value
        lut256 = np.zeros(256, np.uint8)
        lut256[: len(table)] = table
        return lut256[seg]
    lut = np.asarray(table, np.uint8)
    idx = np.clip(seg.astype(np.int32), 0, lut.shape[0] - 1)
    valid = (seg >= 0) & (seg < lut.shape[0])
    return np.where(valid, lut[idx], 0).astype(np.uint8)


def internal_to_brats2025(seg):
    """nnU-Net internal [0,1,2,3] → BraTS-2025 [0,1,2,3] (ET stays 3)."""
    return remap_labels(seg, _INTERNAL_TO_2025)


def internal_to_brats2021(seg):
    """nnU-Net internal [0,1,2,3] → BraTS-2021 [0,1,2,4] (ET becomes 4)."""
    return remap_labels(seg, _INTERNAL_TO_2021)


def brats2025_to_internal(seg):
    """BraTS-2025 [0,1,2,3] → nnU-Net internal (the remap is an involution:
    1 NCR ↔ 2 internal-NCR, 2 ED ↔ 1 internal-ED, ET stays 3)."""
    return remap_labels(seg, _INTERNAL_TO_2025)


def brats2021_to_internal(seg):
    """BraTS-2021 [0,1,2,4] → nnU-Net internal [0,1,2,3]."""
    return brats2025_to_internal(brats2021_to_brats2025(seg))


def brats2021_to_brats2025(seg):
    return remap_labels(seg, _2021_TO_2025)


def brats2025_to_brats2021(seg):
    return remap_labels(seg, _2025_TO_2021)


def normalize_to_brats2025(seg):
    """BraTS labels of EITHER vintage → 2025 space, safely.

    2021 files spell ET as 4, 2025 files as 3; NCR(1)/ED(2) agree.  This
    map sends both ET spellings to 3, so it is correct when the vintage is
    unknown — e.g. evaluating against user-shipped ground truth, or
    normalizing a prediction already saved in the configured convention.
    The strict :func:`brats2021_to_brats2025` map sends label 3 to 0
    ("unused in 2021 space") and therefore ERASES ET from any 2025-space
    input — it must only ever see true 2021-space labels.
    """
    return remap_labels(seg, _ANY_TO_2025)
