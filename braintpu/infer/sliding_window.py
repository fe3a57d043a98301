"""Sliding-window ensemble inference engine — the compute core.

The reference's hot loop (≈98 % of runtime) is a Python-level nest:
patch grid × 8 mirror flips × 5 folds × 2 models of torch CPU Conv3d
forwards with numpy Gaussian accumulation
(ref: /root/reference/run_brats2021_inference_singlethread.py:81-158 and
SURVEY.md §3.2).  Here the whole nest is ONE jit-compiled XLA program per
(volume-shape, model) pair:

* ``lax.scan`` over the patch grid (static length → static shapes),
* mirror TTA as a batch dimension (all 8 flips forwarded together — the
  MXU sees batch-8 convolutions instead of 8 sequential ones),
* fold ensemble as a ``lax.scan`` over stacked fold weights (weights stay
  resident in HBM; no per-fold reload),
* Gaussian-weighted accumulation on-chip via ``dynamic_update_slice`` on a
  scan-carried accumulator (never leaves the device),
* bf16 conv compute, f32 accumulation.

Patch start positions use the exact nnU-Net re-spacing formula
(:mod:`braintpu.infer.gaussian`), so region probabilities match the
reference's aggregation semantics.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.unet3d import UNetConfig, apply_unet
from .gaussian import gaussian_importance_map, patch_grid

__all__ = [
    "MIRROR_COMBOS",
    "stack_folds",
    "sliding_window_predict",
    "predict_probs",
    "region_probs_to_labels",
]

#: All 2^3 mirror combinations over the spatial axes (nnU-Net mirror_axes=(0,1,2)).
MIRROR_COMBOS: Tuple[Tuple[int, ...], ...] = (
    (),
    (0,),
    (1,),
    (2,),
    (0, 1),
    (0, 2),
    (1, 2),
    (0, 1, 2),
)


def stack_folds(fold_params: Sequence[Dict[str, Any]]) -> Dict[str, Any]:
    """Stack per-fold param pytrees along a new leading axis (fold ensemble)."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *fold_params)


def _mirror_batch(patch: jnp.ndarray, combos) -> jnp.ndarray:
    """(pd, ph, pw, C) → (len(combos), pd, ph, pw, C) of flipped copies."""
    return jnp.stack([jnp.flip(patch, axis=c) if c else patch for c in combos])


def _unmirror_mean(probs: jnp.ndarray, combos) -> jnp.ndarray:
    """Invert each flip and average over the TTA batch → (pd, ph, pw, K)."""
    parts = [
        jnp.flip(probs[i], axis=c) if c else probs[i] for i, c in enumerate(combos)
    ]
    return sum(parts) / len(parts)


@partial(
    jax.jit,
    static_argnames=("cfg", "num_mirror", "folded", "mirror_chunk"),
    donate_argnames=(),
)
def sliding_window_predict(
    params_stacked: Dict[str, Any],
    volume: jnp.ndarray,
    grid: jnp.ndarray,
    gaussian: jnp.ndarray,
    cfg: UNetConfig,
    num_mirror: int = 8,
    folded: bool = False,
    mirror_chunk: int = 8,
) -> jnp.ndarray:
    """Gaussian-blended, mirror-TTA, fold-averaged region probabilities.

    Args:
      params_stacked: pytree with leading fold axis F on every leaf.
      volume: (X, Y, Z, C) preprocessed volume, every axis >= patch.
      grid: (P, 3) int32 patch start corners.
      gaussian: (pd, ph, pw) f32 importance map.
      cfg: architecture config (static).
      num_mirror: 1 (no TTA) or 8 (full mirror TTA).
      folded: params have BatchNorm pre-folded into convs.
      mirror_chunk: mirrors forwarded per batch.  8 maximizes MXU batching;
        wide models (encoder_scale 2) need 4 to fit full-resolution decoder
        concat buffers in 16 GB HBM.

    Returns:
      (X, Y, Z, K) float32 probabilities (sigmoid regions, fold-averaged).
    """
    combos = MIRROR_COMBOS[:1] if num_mirror == 1 else MIRROR_COMBOS
    pd, ph, pw = cfg.patch_size
    K = cfg.num_classes
    X, Y, Z, _ = volume.shape
    num_folds = jax.tree_util.tree_leaves(params_stacked)[0].shape[0]
    chunks = [
        combos[i : i + mirror_chunk] for i in range(0, len(combos), mirror_chunk)
    ]

    gauss = gaussian.astype(jnp.float32)[..., None]  # (pd, ph, pw, 1)

    def patch_step(carry, start):
        acc, wsum = carry
        x0, y0, z0 = start[0], start[1], start[2]
        patch = jax.lax.dynamic_slice(
            volume, (x0, y0, z0, 0), (pd, ph, pw, volume.shape[3])
        )

        probs = jnp.zeros((pd, ph, pw, K), jnp.float32)
        for chunk in chunks:  # static unroll over mirror chunks
            batch = _mirror_batch(patch, chunk)  # (mc, pd, ph, pw, C)

            def fold_step(prob_sum, fold_params):
                logits = apply_unet(fold_params, batch, cfg, folded=folded)
                return prob_sum + jax.nn.sigmoid(logits), None

            prob_sum, _ = jax.lax.scan(
                fold_step,
                jnp.zeros((len(chunk), pd, ph, pw, K), jnp.float32),
                params_stacked,
            )
            # sum (not mean) of unflipped chunk members
            probs = probs + _unmirror_mean(prob_sum, chunk) * len(chunk)
        probs = probs / (num_folds * len(combos))

        acc_patch = jax.lax.dynamic_slice(acc, (x0, y0, z0, 0), (pd, ph, pw, K))
        acc = jax.lax.dynamic_update_slice(acc, acc_patch + probs * gauss, (x0, y0, z0, 0))
        w_patch = jax.lax.dynamic_slice(wsum, (x0, y0, z0, 0), (pd, ph, pw, 1))
        wsum = jax.lax.dynamic_update_slice(wsum, w_patch + gauss, (x0, y0, z0, 0))
        return (acc, wsum), None

    acc0 = jnp.zeros((X, Y, Z, K), jnp.float32)
    wsum0 = jnp.zeros((X, Y, Z, 1), jnp.float32)
    (acc, wsum), _ = jax.lax.scan(patch_step, (acc0, wsum0), grid)
    return acc / wsum


def default_mirror_chunk(cfg: UNetConfig) -> int:
    """Largest TTA batch that fits HBM for this architecture width."""
    return 8 if cfg.encoder_scale <= 1 else 4


def predict_probs(
    params_stacked: Dict[str, Any],
    volume_cxyz: jnp.ndarray,
    cfg: UNetConfig,
    step_size: float = 0.5,
    tta: bool = True,
    folded: bool = False,
    mirror_chunk: Optional[int] = None,
) -> jnp.ndarray:
    """Convenience wrapper: (C, X, Y, Z) volume → (X, Y, Z, K) probabilities.

    Host side computes the static patch grid + Gaussian map; device side runs
    the fused scan.  Compilations are cached per (volume shape, cfg).
    """
    vol = jnp.moveaxis(jnp.asarray(volume_cxyz), 0, -1)
    shape = vol.shape[:3]
    grid = jnp.asarray(patch_grid(shape, cfg.patch_size, step_size))
    gauss = jnp.asarray(gaussian_importance_map(tuple(cfg.patch_size)))
    return sliding_window_predict(
        params_stacked,
        vol,
        grid,
        gauss,
        cfg,
        num_mirror=8 if tta else 1,
        folded=folded,
        mirror_chunk=mirror_chunk or default_mirror_chunk(cfg),
    )


@partial(jax.jit, static_argnames=("region_class_order",))
def region_probs_to_labels(
    probs: jnp.ndarray,
    region_class_order: Tuple[int, ...] = (1, 2, 3),
    threshold: float = 0.5,
) -> jnp.ndarray:
    """Region probabilities → label map, later regions overwriting earlier.

    Channel k is painted with label ``region_class_order[k]`` wherever
    ``probs[..., k] > threshold`` — the documented critical
    ``regions_class_order=(1,2,3)`` semantics
    (ref: run_brats2021_inference_singlethread.py:144-156,
    PROJECT_DOCUMENTATION.md:325-344).
    """
    seg = jnp.zeros(probs.shape[:-1], jnp.uint8)
    for k, label in enumerate(region_class_order):
        seg = jnp.where(probs[..., k] > threshold, jnp.uint8(label), seg)
    return seg
