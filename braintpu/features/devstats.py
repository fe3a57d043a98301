"""On-device batched masked-intensity statistics for the feature layer.

The reference computes each region × sequence intensity summary as a
separate host pass — ``data[mask]`` gather + ``np.percentile`` per pair
(/root/reference/feature_extraction/utils.py:27-51, called ~16× per case
from step1_sequence_findings.py:71-135).  This module replaces all of
those passes with ONE jitted device program per case:

* **moments** (count / mean / std / min / max) for every tumor region ×
  modality via label segment-reductions — the masks NCR/ED/ET/TC/WT are
  unions of segmentation labels, so one ``segment_sum`` over the volume
  yields every region's sums at once;
* **exact masked quantiles** (q25 / median / q75, and the 5th-percentile
  brain threshold) from ONE shared ascending sort per modality: for any
  mask, ``cumsum(mask[perm])`` gives each element's rank *within the
  subset*, so the subset's k-th order statistic is a ``searchsorted`` into
  that cumulative count — no per-mask re-sort.  Interpolation follows
  ``np.percentile``'s linear rule, so values match the host path up to
  f32 rounding;
* the **normal-brain reference** (non-tumor voxels above the per-modality
  5th-percentile-of-nonzero threshold, utils.py:54-68) in the same
  program.

TPU shape notes: everything is a flat (V,) pass — segment sums, one radix
sort, cumsums and a handful of gathers; total device work for a 240³ case
is a few tens of ms vs ~1 s of host numpy.  This path is **opt-in**
(``BRAINTPU_DEVICE_FEATURES=1``): in dev environments where the device
sits behind a dispatch tunnel, shipping the raw volumes across the wire
costs more than the host math it replaces, so the numpy path stays the
default until measured on directly-attached hardware.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "device_features_enabled",
    "compute_case_stats",
    "compute_quality_stats",
    "REGIONS",
]

#: region name → segmentation labels composing it (BraTS space; ET
#: accepts both the 3 and 4 conventions — context.tumor_masks_from_seg)
REGIONS = {
    "ncr": (1,),
    "ed": (2,),
    "et": (3, 4),
    "tc": (1, 3, 4),
    "wt": (1, 2, 3, 4),
}

_QS = (0.25, 0.5, 0.75)
_NUM_LABELS = 5  # 0..4 after clipping


def device_features_enabled() -> bool:
    return os.environ.get("BRAINTPU_DEVICE_FEATURES", "0") == "1"


def _masked_quantiles(sorted_vals: jnp.ndarray, cum: jnp.ndarray, n, qs):
    """Quantiles of the masked subset from a shared global sort.

    ``sorted_vals`` (V,) ascending; ``cum`` (V,) = cumulative count of
    subset members in sort order; ``n`` = subset size.  The subset's
    0-based rank-``r`` element sits at the first index where ``cum ==
    r + 1``.  Uses np.percentile's linear interpolation between ranks.
    """
    out = []
    nm1 = jnp.maximum(n - 1, 0).astype(jnp.float32)
    for q in qs:
        pos = nm1 * q
        lo = jnp.floor(pos)
        frac = pos - lo
        i_lo = jnp.searchsorted(cum, lo.astype(jnp.int32) + 1)
        i_hi = jnp.searchsorted(cum, jnp.ceil(pos).astype(jnp.int32) + 1)
        out.append(sorted_vals[i_lo] * (1 - frac) + sorted_vals[i_hi] * frac)
    return out


@partial(jax.jit, static_argnames=("brain_pct",))
def _case_stats_kernel(data: jnp.ndarray, seg: jnp.ndarray, brain_pct: float = 5.0):
    """data (M, V) f32, seg (V,) int32 in [0, 4] → stat arrays.

    Returns a dict of small arrays:
      label_{count,sum,sumsq,min,max}: per segmentation label × modality,
      region quantiles per label-union handled by the host wrapper,
      normal_{count,sum,sumsq,min,max,q}: per modality.
    """
    M, V = data.shape
    seg = jnp.clip(seg, 0, _NUM_LABELS - 1)
    ones = jnp.ones((V,), jnp.float32)
    label_count = jax.ops.segment_sum(ones, seg, num_segments=_NUM_LABELS)

    def per_mod_moments(d):
        s = jax.ops.segment_sum(d, seg, num_segments=_NUM_LABELS)
        s2 = jax.ops.segment_sum(d * d, seg, num_segments=_NUM_LABELS)
        mn = jax.ops.segment_min(d, seg, num_segments=_NUM_LABELS)
        mx = jax.ops.segment_max(d, seg, num_segments=_NUM_LABELS)
        return s, s2, mn, mx

    sums, sqs, mins, maxs = jax.vmap(per_mod_moments)(data)  # each (M, L)

    # one shared sort per modality; seg labels carried through the perm
    perm = jnp.argsort(data, axis=1)  # (M, V)
    sorted_vals = jnp.take_along_axis(data, perm, axis=1)
    seg_sorted = seg[perm]  # (M, V)

    # per-label cumulative membership in sort order → exact subset quantiles
    label_q = []  # list over labels 1..4 of (M, len(_QS))
    for lab in range(1, _NUM_LABELS):
        cum = jnp.cumsum((seg_sorted == lab).astype(jnp.int32), axis=1)
        n = label_count[lab].astype(jnp.int32)
        qs = jax.vmap(lambda sv, cm: jnp.stack(_masked_quantiles(sv, cm, n, _QS)))(
            sorted_vals, cum
        )
        label_q.append(qs)
    label_q = jnp.stack(label_q, axis=0)  # (L-1, M, Q)

    # union-region quantiles (et/tc/wt span several labels)
    union_q = {}
    for name, labs in REGIONS.items():
        if len(labs) == 1:
            continue
        member = jnp.isin(seg_sorted, jnp.asarray(labs))
        cum = jnp.cumsum(member.astype(jnp.int32), axis=1)
        n = sum(label_count[l] for l in labs).astype(jnp.int32)
        union_q[name] = jax.vmap(
            lambda sv, cm: jnp.stack(_masked_quantiles(sv, cm, n, _QS))
        )(sorted_vals, cum)

    # normal-brain reference: data > 5th pct of nonzero AND seg == 0.
    # Strictly-positive entries are the sort's tail, so the nonzero
    # percentile reads straight off the shared sort.
    nz_count = (data > 0).sum(axis=1)  # (M,)
    pos = jnp.maximum(nz_count - 1, 0).astype(jnp.float32) * (brain_pct / 100.0)
    base = (V - nz_count).astype(jnp.int32)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.ceil(pos).astype(jnp.int32)
    frac = pos - jnp.floor(pos)
    g = jnp.arange(M)
    thr = sorted_vals[g, base + lo] * (1 - frac) + sorted_vals[g, base + hi] * frac

    normal_mask = (data > thr[:, None]) & (seg[None, :] == 0)  # (M, V)
    nmf = normal_mask.astype(jnp.float32)
    n_count = nmf.sum(axis=1)
    n_sum = (data * nmf).sum(axis=1)
    n_sumsq = (data * data * nmf).sum(axis=1)
    big = jnp.float32(jnp.inf)
    n_min = jnp.min(jnp.where(normal_mask, data, big), axis=1)
    n_max = jnp.max(jnp.where(normal_mask, data, -big), axis=1)
    normal_sorted_mask = jnp.take_along_axis(normal_mask, perm, axis=1)
    n_cum = jnp.cumsum(normal_sorted_mask.astype(jnp.int32), axis=1)
    n_q = jax.vmap(
        lambda sv, cm, n: jnp.stack(_masked_quantiles(sv, cm, n, _QS))
    )(sorted_vals, n_cum, n_count.astype(jnp.int32))

    return {
        "label_count": label_count,
        "label_sum": sums,
        "label_sumsq": sqs,
        "label_min": mins,
        "label_max": maxs,
        "label_q": label_q,
        "union_q": union_q,
        "normal_count": n_count,
        "normal_sum": n_sum,
        "normal_sumsq": n_sumsq,
        "normal_min": n_min,
        "normal_max": n_max,
        "normal_q": n_q,
        "brain_threshold": thr,
    }


def _summary(count, total, sumsq, mn, mx, q) -> Dict:
    n = int(count)
    if n == 0:
        return {
            "mean": None, "std": None, "min": None, "max": None,
            "median": None, "q25": None, "q75": None, "voxel_count": 0,
        }
    mean = float(total) / n
    var = max(float(sumsq) / n - mean * mean, 0.0)
    return {
        "mean": mean,
        "std": float(np.sqrt(var)),
        "min": float(mn),
        "max": float(mx),
        "median": float(q[1]),
        "q25": float(q[0]),
        "q75": float(q[2]),
        "voxel_count": n,
    }


def compute_case_stats(
    modalities: Dict[str, np.ndarray], seg: np.ndarray
) -> Dict[str, Dict[str, Dict]]:
    """One device pass → {region | 'normal'} → {modality} → stats dict.

    Same dict schema as :func:`braintpu.features.context.intensity_stats`
    for every REGIONS entry plus the 'normal' brain reference.
    """
    mods = list(modalities)
    data = jnp.asarray(
        np.stack([np.asarray(modalities[m], np.float32).ravel() for m in mods])
    )
    segf = jnp.asarray(np.round(np.asarray(seg)).astype(np.int32).ravel())
    raw = jax.device_get(_case_stats_kernel(data, segf))

    out: Dict[str, Dict[str, Dict]] = {}
    for name, labs in REGIONS.items():
        count = sum(raw["label_count"][l] for l in labs)
        out[name] = {}
        for mi, m in enumerate(mods):
            total = sum(raw["label_sum"][mi, l] for l in labs)
            sumsq = sum(raw["label_sumsq"][mi, l] for l in labs)
            mn = min(raw["label_min"][mi, l] for l in labs)
            mx = max(raw["label_max"][mi, l] for l in labs)
            q = (
                raw["label_q"][labs[0] - 1, mi]
                if len(labs) == 1
                else raw["union_q"][name][mi]
            )
            out[name][m] = _summary(count, total, sumsq, mn, mx, q)
    out["normal"] = {
        m: _summary(
            raw["normal_count"][mi],
            raw["normal_sum"][mi],
            raw["normal_sumsq"][mi],
            raw["normal_min"][mi],
            raw["normal_max"][mi],
            raw["normal_q"][mi],
        )
        for mi, m in enumerate(mods)
    }
    return out


@jax.jit
def _quality_kernel(data: jnp.ndarray, brain: jnp.ndarray):
    """Per-modality image-quality reductions (step5 SNR block semantics,
    step5_quality.py::assess_image_quality): brain-masked moments and
    q01/q25/q75/q99, 10th percentile of nonzero, background-noise std
    under ``~brain ∧ (0 < x < p10)``, zero/outlier counts — one program.

    data (M, V) f32, brain (V,) bool (the t1-derived mask, shared).
    """
    M, V = data.shape
    brainf = brain.astype(jnp.float32)
    n_brain = brainf.sum()

    b_sum = (data * brainf).sum(axis=1)
    b_sumsq = (data * data * brainf).sum(axis=1)
    mean = b_sum / jnp.maximum(n_brain, 1.0)
    var = jnp.maximum(b_sumsq / jnp.maximum(n_brain, 1.0) - mean * mean, 0.0)
    std = jnp.sqrt(var)

    perm = jnp.argsort(data, axis=1)
    sorted_vals = jnp.take_along_axis(data, perm, axis=1)
    brain_sorted = jnp.take_along_axis(
        jnp.broadcast_to(brain[None, :], (M, V)), perm, axis=1
    )
    cum = jnp.cumsum(brain_sorted.astype(jnp.int32), axis=1)
    nb = n_brain.astype(jnp.int32)
    qs = jax.vmap(
        lambda sv, cm: jnp.stack(
            _masked_quantiles(sv, cm, nb, (0.01, 0.25, 0.75, 0.99))
        )
    )(sorted_vals, cum)  # (M, 4)

    # 10th percentile of nonzero: strictly positive values are the sort tail
    nz_count = (data > 0).sum(axis=1)
    pos = jnp.maximum(nz_count - 1, 0).astype(jnp.float32) * 0.10
    base = (V - nz_count).astype(jnp.int32)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.ceil(pos).astype(jnp.int32)
    frac = pos - jnp.floor(pos)
    g = jnp.arange(M)
    p10 = sorted_vals[g, base + lo] * (1 - frac) + sorted_vals[g, base + hi] * frac

    bg = (~brain)[None, :] & (data > 0) & (data < p10[:, None])
    bgf = bg.astype(jnp.float32)
    bg_n = bgf.sum(axis=1)
    bg_mean = (data * bgf).sum(axis=1) / jnp.maximum(bg_n, 1.0)
    bg_var = jnp.maximum(
        (data * data * bgf).sum(axis=1) / jnp.maximum(bg_n, 1.0) - bg_mean**2, 0.0
    )

    zeros_in_brain = ((data == 0) & brain[None, :]).sum(axis=1)
    q01, q25, q75, q99 = qs[:, 0], qs[:, 1], qs[:, 2], qs[:, 3]
    iqr = q75 - q25
    hi_out = ((data > (q99 + 3 * iqr)[:, None]) & brain[None, :]).sum(axis=1)
    lo_out = ((data < (q01 - 3 * iqr)[:, None]) & brain[None, :]).sum(axis=1)

    return {
        "n_brain": n_brain,
        "mean": mean,
        "std": std,
        "bg_count": bg_n,
        "bg_std": jnp.sqrt(bg_var),
        "zeros_in_brain": zeros_in_brain,
        "outliers": hi_out + lo_out,
    }


def compute_quality_stats(
    modalities: Dict[str, np.ndarray], brain_mask: np.ndarray
) -> Dict[str, Dict[str, float]]:
    """{modality → quality reductions} from one device pass (step5 SNR)."""
    mods = list(modalities)
    data = jnp.asarray(
        np.stack([np.asarray(modalities[m], np.float32).ravel() for m in mods])
    )
    raw = jax.device_get(_quality_kernel(data, jnp.asarray(brain_mask.ravel())))
    out = {}
    for mi, m in enumerate(mods):
        out[m] = {
            "n_brain": int(raw["n_brain"]),
            "mean": float(raw["mean"][mi]),
            "std": float(raw["std"][mi]),
            "bg_count": int(raw["bg_count"][mi]),
            "bg_std": float(raw["bg_std"][mi]),
            "zeros_in_brain": int(raw["zeros_in_brain"][mi]),
            "outliers": int(raw["outliers"][mi]),
        }
    return out
