"""Dice / IoU / sensitivity / specificity evaluation.

Reproduces the arithmetic of /root/reference/evaluate_segmentation.py:12-48
(per-label binary confusion with the 1e-8 smoothing constant) and its
compound BraTS regions WT=[1,2,3], TC=[1,3], ET=[3]
(ref lines 130-151), with the mean Dice over (WT, TC, ET) (ref line 161).

TPU-native design: ONE jitted pass computes the confusion counts for every
label and compound region simultaneously — a (V,) × (R,) one-hot contraction
instead of the reference's per-label full-volume re-scans.  The output is a
plain dict so the pipeline consumes structured numbers, not regex-scraped
stdout (the reference parses its own print output at
/root/reference/run_full_pipeline.py:252-270).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "COMPOUND_REGIONS",
    "SegMetrics",
    "confusion_counts",
    "metrics_from_counts",
    "evaluate_pair",
    "evaluate_segmentation",
]

_EPS = 1e-8

#: BraTS compound regions in 2025 label space (1=NCR, 2=ED, 3=ET).
COMPOUND_REGIONS: Dict[str, Tuple[int, ...]] = {
    "WT": (1, 2, 3),
    "TC": (1, 3),
    "ET": (3,),
}


@dataclass(frozen=True)
class SegMetrics:
    dice: float
    iou: float
    sensitivity: float
    specificity: float
    tp: int
    fp: int
    fn: int
    tn: int

    def as_dict(self) -> Dict[str, float]:
        return {
            "dice": self.dice,
            "iou": self.iou,
            "sensitivity": self.sensitivity,
            "specificity": self.specificity,
            "tp": self.tp,
            "fp": self.fp,
            "fn": self.fn,
            "tn": self.tn,
        }


def _region_masks(seg: jnp.ndarray, regions: Tuple[Tuple[int, ...], ...]) -> jnp.ndarray:
    """(R, V) boolean membership of each voxel in each region."""
    flat = seg.reshape(-1)
    rows = []
    for labels in regions:
        m = jnp.zeros(flat.shape, dtype=bool)
        for l in labels:
            m = m | (flat == l)
        rows.append(m)
    return jnp.stack(rows)


@partial(jax.jit, static_argnums=(2,))
def confusion_counts(
    pred: jnp.ndarray, gt: jnp.ndarray, regions: Tuple[Tuple[int, ...], ...]
) -> jnp.ndarray:
    """(R, 4) [tp, fp, fn, tn] per region, computed in one fused pass."""
    p = _region_masks(pred, regions).astype(jnp.float32)
    g = _region_masks(gt, regions).astype(jnp.float32)
    tp = (p * g).sum(axis=1)
    fp = (p * (1 - g)).sum(axis=1)
    fn = ((1 - p) * g).sum(axis=1)
    tn = ((1 - p) * (1 - g)).sum(axis=1)
    return jnp.stack([tp, fp, fn, tn], axis=1)


def _region_counts_np(
    pred: np.ndarray, gt: np.ndarray, regions: Tuple[Tuple[int, ...], ...]
) -> np.ndarray:
    """(R, 4) [tp, fp, fn, tn] per region from one bincount pass (numpy).

    Same integer counts as :func:`confusion_counts`: builds the (M, M)
    pred×gt label co-occurrence matrix in a single pass, then each
    region's counts are sums over its member/non-member blocks.
    """
    p = np.asarray(pred).reshape(-1)
    g = np.asarray(gt).reshape(-1)
    top = max(int(p.max(initial=0)), int(g.max(initial=0)),
              max((l for r in regions for l in r), default=0))
    M = top + 1
    if M * top + top < 256 and p.min(initial=0) >= 0 and g.min(initial=0) >= 0:
        # BraTS labels are tiny: build the pair index in uint8 (no overflow
        # for M*top+top < 256).  The previous int64 path allocated four
        # ~70 MB temporaries per 240³ case — first-touch page faults made
        # the one-pass bincount cost ~3 s in the pipeline; uint8 temporaries
        # are 9 MB and measure ~0.15 s for identical counts.
        idx = p.astype(np.uint8) * np.uint8(M)
        idx += g.astype(np.uint8)
        c = np.bincount(idx, minlength=M * M).reshape(M, M)
    else:
        c = np.bincount(
            p.astype(np.int64) * M + g.astype(np.int64), minlength=M * M
        ).reshape(M, M)
    V = int(c.sum())
    out = np.zeros((len(regions), 4), np.int64)
    for i, labels in enumerate(regions):
        m = np.zeros(M, bool)
        m[list(labels)] = True
        tp = int(c[m][:, m].sum())
        fp = int(c[m][:, ~m].sum())
        fn = int(c[~m][:, m].sum())
        out[i] = (tp, fp, fn, V - tp - fp - fn)
    return out


def metrics_from_counts(tp: float, fp: float, fn: float, tn: float) -> SegMetrics:
    dice = (2 * tp) / (2 * tp + fp + fn + _EPS)
    iou = tp / (tp + fp + fn + _EPS)
    sens = tp / (tp + fn + _EPS)
    spec = tn / (tn + fp + _EPS)
    return SegMetrics(
        float(dice), float(iou), float(sens), float(spec), int(tp), int(fp), int(fn), int(tn)
    )


def evaluate_pair(pred: np.ndarray, gt: np.ndarray, label) -> SegMetrics:
    """Metrics for a single label value (reference `calculate_metrics`)."""
    counts = confusion_counts(jnp.asarray(pred), jnp.asarray(gt), ((int(label),),))
    return metrics_from_counts(*np.asarray(counts[0]))


def evaluate_segmentation(
    pred: np.ndarray,
    gt: np.ndarray,
    labels: Sequence[int] = (1, 2, 3),
) -> Dict:
    """Full evaluation: per-label + WT/TC/ET compounds + mean Dice.

    Labels are in BraTS-2025 space by default.  Returns the structured dict
    the pipeline persists (`per_label`, `compound`, `mean_dice`).
    """
    region_keys = [f"label_{l}" for l in labels] + list(COMPOUND_REGIONS)
    region_defs = tuple([(int(l),) for l in labels]) + tuple(
        COMPOUND_REGIONS[k] for k in COMPOUND_REGIONS
    )
    if isinstance(pred, np.ndarray) and isinstance(gt, np.ndarray):
        # host fast path: ONE bincount label-pair pass instead of a device
        # round-trip (through the remote-dispatch tunnel the two uint8
        # uploads + sync cost seconds); every region's counts come from
        # tiny sums over the (M, M) confusion matrix — exact integers
        counts = _region_counts_np(pred, gt, region_defs)
    else:
        counts = np.asarray(
            confusion_counts(jnp.asarray(pred), jnp.asarray(gt), region_defs)
        )
    results = {k: metrics_from_counts(*c) for k, c in zip(region_keys, counts)}
    mean_dice = float(
        np.mean([results[k].dice for k in COMPOUND_REGIONS])
    )
    return {
        "per_label": {int(l): results[f"label_{l}"].as_dict() for l in labels},
        "compound": {k: results[k].as_dict() for k in COMPOUND_REGIONS},
        "mean_dice": mean_dice,
    }
