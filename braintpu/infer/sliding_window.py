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
    """Stack per-fold param pytrees along a new leading axis (fold ensemble).

    Host-resident folds (numpy / CPU-backed jax arrays — the checkpoint
    and random-init paths) stack on the host: per-leaf ``jnp.stack`` would
    ship every fold to the accelerator as its own transfer (10 × ~55 MB
    through a dispatch tunnel), while host-stacked params ride to the
    device in one batch at the first jit call.  Device-resident folds keep
    the on-device stack (no readback).
    """

    def on_host(x) -> bool:
        if isinstance(x, np.ndarray):
            return True
        dev = getattr(x, "devices", None)
        if dev is None:
            return False
        return all(d.platform == "cpu" for d in x.devices())

    leaves = jax.tree_util.tree_leaves(fold_params[0])
    if all(on_host(leaf) for leaf in leaves):
        return jax.tree_util.tree_map(
            lambda *xs: np.stack([np.asarray(x) for x in xs]), *fold_params
        )
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *fold_params)


def mirror_flag_groups(combos, group_size: int) -> np.ndarray:
    """(G, B, 3) boolean flip flags covering ``combos`` in groups of B.

    Flags make the flip configuration DATA rather than program structure, so
    mirror groups run under one `lax.scan` body — the network is compiled
    exactly once regardless of TTA setting (critical: each extra unrolled
    copy of the U-Net multiplies XLA compile time).
    """
    flags = np.zeros((len(combos), 3), bool)
    for i, axes in enumerate(combos):
        for ax in axes:
            flags[i, ax] = True
    g = max(1, group_size)
    if len(combos) % g:  # public HBM-tuning knob: real error, not an assert
        raise ValueError(
            f"mirror_chunk={g} must divide the mirror count {len(combos)}"
        )
    return flags.reshape(len(combos) // g, g, 3)


def _apply_flips(x: jnp.ndarray, flags: jnp.ndarray) -> jnp.ndarray:
    """Conditionally flip each batch element along each spatial axis.

    ``x``: (B, pd, ph, pw, C); ``flags``: (B, 3) bool (traced).  Flip-by-select
    is bandwidth-trivial next to the conv stack it feeds.
    """
    for ax in range(3):
        flag = flags[:, ax].reshape(-1, 1, 1, 1, 1)
        x = jnp.where(flag, jnp.flip(x, axis=ax + 1), x)
    return x


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
    if num_mirror not in (1, 8):
        raise ValueError(
            f"num_mirror={num_mirror} unsupported: 1 (no TTA) or 8 (full "
            "mirror TTA) — a partial subset would silently run all 8"
        )
    combos = MIRROR_COMBOS[:1] if num_mirror == 1 else MIRROR_COMBOS
    pd, ph, pw = cfg.patch_size
    K = cfg.num_classes
    X, Y, Z, _ = volume.shape
    num_folds = jax.tree_util.tree_leaves(params_stacked)[0].shape[0]
    B = min(mirror_chunk, len(combos))
    flag_groups = jnp.asarray(mirror_flag_groups(combos, B))  # (G, B, 3)

    gauss = gaussian.astype(jnp.float32)[..., None]  # (pd, ph, pw, 1)

    def patch_step(carry, start):
        acc, wsum = carry
        x0, y0, z0 = start[0], start[1], start[2]
        patch = jax.lax.dynamic_slice(
            volume, (x0, y0, z0, 0), (pd, ph, pw, volume.shape[3])
        )
        tiled = jnp.broadcast_to(patch, (B, pd, ph, pw, patch.shape[3]))

        def mirror_group_step(prob_sum, flags):
            batch = _apply_flips(tiled, flags)  # (B, pd, ph, pw, C)

            def fold_step(group_sum, fold_params):
                logits = apply_unet(fold_params, batch, cfg, folded=folded)
                return group_sum + jax.nn.sigmoid(logits), None

            group_sum, _ = jax.lax.scan(
                fold_step,
                jnp.zeros((B, pd, ph, pw, K), jnp.float32),
                params_stacked,
            )
            return prob_sum + _apply_flips(group_sum, flags).sum(axis=0), None

        probs, _ = jax.lax.scan(
            mirror_group_step, jnp.zeros((pd, ph, pw, K), jnp.float32), flag_groups
        )
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
