"""Whole-volume fully-convolutional inference (accelerated mode).

The canonical nnU-Net recipe (``infer.sliding_window``) tiles the volume
into 128³ patches at 50 % overlap, so every voxel is convolved up to 8
times and Gaussian-blended (ref:
/root/reference/run_brats2021_inference_singlethread.py:98-105).  That
redundancy is a *memory* workaround from GPU-VRAM-era nnU-Net, not part of
the model: the U-Net is fully convolutional, so with 16 GB of HBM the whole
cropped brain fits through one forward pass.

This module runs exactly that: pad the cropped volume to a multiple of
``2**num_pool`` (so all pool/up-conv stages divide evenly), then one
forward per mirror flip per fold over the entire volume — ~3× fewer
patch-FLOPs than the 50 %-overlap grid on a typical BraTS crop, and no
Gaussian accumulate passes.

Semantics deltas vs the sliding-window path (deliberate, documented):

* **Border context.** A sliding-window patch zero-pads at its own borders
  and relies on Gaussian down-weighting + overlap to wash that out; the
  whole-volume forward only zero-pads at the (background) volume border.
  For the BatchNorm model (folded at inference) the network is purely
  convolutional, so interior voxels see *more* true context here, not less.
* **GroupNorm statistics** are computed over the whole volume rather than
  per 128³ patch.  This is the fully-convolutional reading of the same
  model; outputs differ slightly from patch-wise statistics.
* No Gaussian importance weighting (nothing to blend).

The axial-attention variant has patch-shape-bound positional embeddings
(models/axial.py) and is rejected here — use the sliding-window path.

Volume shapes are bucketed to multiples of ``2**num_pool`` per axis (32 for
the default 5-pool presets), so XLA recompiles at most once per bucket
rather than once per exact crop shape.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.unet3d import UNetConfig, apply_unet
from .sliding_window import MIRROR_COMBOS, _apply_flips, mirror_flag_groups

__all__ = [
    "fullconv_predict",
    "fullconv_predict_sharded",
    "fullconv_predict_spatial",
    "predict_probs_fullconv",
]


@partial(jax.jit, static_argnames=("cfg", "num_mirror", "folded"))
def fullconv_predict(
    params_stacked: Dict[str, Any],
    volume: jnp.ndarray,
    cfg: UNetConfig,
    num_mirror: int = 8,
    folded: bool = False,
) -> jnp.ndarray:
    """Mirror-TTA, fold-averaged region probabilities over the whole volume.

    Args:
      params_stacked: pytree with leading fold axis F on every leaf.
      volume: (X, Y, Z, C) preprocessed volume — or a (B, X, Y, Z, C)
        batch of same-bucket volumes (multi-case throughput, BASELINE
        config 4) — every spatial axis a multiple of ``2**cfg.num_pool``.
      cfg: architecture config (static).
      num_mirror: 1 (no TTA) or 8 (full mirror TTA).
      folded: params have BatchNorm pre-folded into convs.

    Returns:
      (X, Y, Z, K) float32 probabilities (sigmoid regions, averaged over
      folds × mirrors).
    """
    if cfg.axial_attention:
        raise ValueError(
            "fullconv mode is incompatible with the axial-attention variant "
            "(patch-shape-bound positional embeddings); use sliding-window"
        )
    squeeze = volume.ndim == 4
    x = volume[None] if squeeze else volume  # (B, X, Y, Z, C)
    div = 2**cfg.num_pool
    B, X, Y, Z, _ = x.shape
    if any(s % div for s in (X, Y, Z)):
        raise ValueError(
            f"volume shape {(X, Y, Z)} must be a multiple of {div}; "
            "preprocess with preprocess_case(..., pad_multiple=2**num_pool)"
        )
    if num_mirror not in (1, 8):
        raise ValueError(
            f"num_mirror={num_mirror} unsupported: 1 (no TTA) or 8 (full "
            "mirror TTA) — a partial subset would silently run all 8"
        )
    combos = MIRROR_COMBOS[:1] if num_mirror == 1 else MIRROR_COMBOS
    flag_groups = jnp.asarray(mirror_flag_groups(combos, 1))  # (G, 1, 3)
    flag_groups = jnp.repeat(flag_groups, B, axis=1)  # same flips across batch
    num_folds = jax.tree_util.tree_leaves(params_stacked)[0].shape[0]
    K = cfg.num_classes

    def mirror_step(prob_sum, flags):
        batch = _apply_flips(x, flags)

        def fold_step(group_sum, fold_params):
            logits = apply_unet(fold_params, batch, cfg, folded=folded)
            return group_sum + jax.nn.sigmoid(logits), None

        group_sum, _ = jax.lax.scan(
            fold_step, jnp.zeros((B, X, Y, Z, K), jnp.float32), params_stacked
        )
        return prob_sum + _apply_flips(group_sum, flags), None

    probs, _ = jax.lax.scan(
        mirror_step, jnp.zeros((B, X, Y, Z, K), jnp.float32), flag_groups
    )
    probs = probs / (num_folds * len(combos))
    return probs[0] if squeeze else probs


def fullconv_predict_sharded(
    params_stacked: Dict[str, Any],
    volume: jnp.ndarray,
    cfg: UNetConfig,
    mesh,
    axis: str = "data",
    folded: bool = False,
) -> jnp.ndarray:
    """Mirror-TTA-parallel whole-volume ensemble over a device mesh.

    The 8 mirror orientations are independent whole-volume forwards, so on
    an 8-chip v5e slice each chip takes one orientation (folds scanned
    locally) and a single ``psum`` over ICI merges the probability maps —
    the spatial analog of the fold-sharded patch ensemble in
    ``parallel.distributed.make_fold_parallel_forward`` (SURVEY.md §2.2,
    "Ensemble parallelism").  Wall-clock approaches 1/n of the single-chip
    fullconv ensemble with one small collective at the end.

    ``mesh.shape[axis]`` must divide 8 (the mirror count).
    """
    if cfg.axial_attention:
        raise ValueError("fullconv is incompatible with the axial variant")
    n = mesh.shape[axis]
    if 8 % n:
        raise ValueError(f"mesh axis {axis}={n} must divide the 8 mirrors")
    div = 2**cfg.num_pool
    X, Y, Z, _ = volume.shape
    if any(s % div for s in (X, Y, Z)):
        raise ValueError(f"volume {(X, Y, Z)} must be a multiple of {div}")
    flag_groups = jnp.asarray(mirror_flag_groups(MIRROR_COMBOS, 1))  # (8, 1, 3)
    num_folds = jax.tree_util.tree_leaves(params_stacked)[0].shape[0]

    fwd = _sharded_mirror_fwd(cfg, mesh, axis, folded, (X, Y, Z))
    probs = fwd(params_stacked, volume, flag_groups)
    return probs / (num_folds * 8)


@lru_cache(maxsize=None)
def _sharded_mirror_fwd(cfg, mesh, axis: str, folded: bool, shape):
    """Jitted mirror-sharded ensemble forward, cached per
    (config, mesh, axis, folded, volume bucket).

    Building (and jitting) the closure inside ``fullconv_predict_sharded``
    keyed the jit cache on a fresh function object per call, so every case
    paid a full retrace + XLA compile — this cache restores one compile
    per bucket shape, like the unsharded module-level ``@jax.jit`` paths.
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    X, Y, Z = shape
    K = cfg.num_classes

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(axis)),
        out_specs=P(),
    )
    def fwd(params, vol, local_flags):
        x = vol[None]

        def mirror_step(prob_sum, flags):
            batch = _apply_flips(x, flags)

            def fold_step(group_sum, fold_params):
                logits = apply_unet(fold_params, batch, cfg, folded=folded)
                return group_sum + jax.nn.sigmoid(logits), None

            # inner carry varies per device (the flips do), the init must too
            g0 = jax.lax.pvary(jnp.zeros((1, X, Y, Z, K), jnp.float32), (axis,))
            group_sum, _ = jax.lax.scan(fold_step, g0, params)
            return prob_sum + _apply_flips(group_sum, flags)[0], None

        acc0 = jax.lax.pvary(jnp.zeros((X, Y, Z, K), jnp.float32), (axis,))
        local, _ = jax.lax.scan(mirror_step, acc0, local_flags)
        return jax.lax.psum(local, axis)

    return jax.jit(fwd)


def fullconv_predict_spatial(
    params_stacked: Dict[str, Any],
    volume: jnp.ndarray,
    cfg: UNetConfig,
    mesh,
    axis: str = "data",
    num_mirror: int = 8,
    folded: bool = False,
) -> jnp.ndarray:
    """Whole-volume ensemble with the volume SPATIALLY sharded over a mesh.

    The context-parallel analog for a single huge case (SURVEY.md §5
    "long-context"): the X axis of the (X, Y, Z, C) volume is partitioned
    across ``mesh.shape[axis]`` devices and the forward is jitted with that
    sharding — GSPMD then partitions every conv spatially, inserting the
    1-voxel halo exchanges for 3×3×3 convs and the cross-device reductions
    for whole-volume GroupNorm statistics automatically (the scaling-book
    recipe: pick a mesh, annotate shardings, let XLA place collectives on
    ICI).  Activation memory per chip drops ~1/n, so volumes that exceed
    one chip's HBM in fullconv mode still run whole-volume instead of
    falling back to sliding windows.

    Complements (not composes with) ``fullconv_predict_sharded``: that one
    shards the 8 independent mirror orientations (throughput), this one
    shards a single forward's spatial extent (memory + single-case
    latency).  Every shard keeps all pool stages aligned:
    ``X % (n * 2**num_pool) == 0`` is required so shard boundaries land on
    pool-grid boundaries at every depth.

    Returns replicated (X, Y, Z, K) probabilities on host-convertible form.
    """
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    if cfg.axial_attention:
        raise ValueError("fullconv is incompatible with the axial variant")
    n = mesh.shape[axis]
    div = 2**cfg.num_pool
    X, Y, Z, _ = volume.shape
    if any(s % div for s in (X, Y, Z)):
        raise ValueError(f"volume {(X, Y, Z)} must be a multiple of {div}")
    if X % (n * div):
        raise ValueError(
            f"X={X} must be a multiple of mesh axis {axis}={n} × {div} "
            f"(pad the bucket to {-(-X // (n * div)) * n * div})"
        )
    rep = NamedSharding(mesh, P())
    params = jax.device_put(params_stacked, rep)
    vol = jax.device_put(volume, NamedSharding(mesh, P(axis)))
    # same jitted program as the single-device path: the input sharding is
    # what turns it into a spatially-partitioned SPMD program; the result
    # is fetched replicated
    probs = fullconv_predict(params, vol, cfg, num_mirror=num_mirror, folded=folded)
    return jax.device_put(probs, rep)


def predict_probs_fullconv(
    params_stacked: Dict[str, Any],
    volume_cxyz: jnp.ndarray,
    cfg: UNetConfig,
    tta: bool = True,
    folded: bool = False,
) -> jnp.ndarray:
    """(C, X, Y, Z) volume (already multiple-of-2^pool) → (X, Y, Z, K) probs."""
    vol = jnp.moveaxis(jnp.asarray(volume_cxyz), 0, -1)
    return fullconv_predict(
        params_stacked, vol, cfg, num_mirror=8 if tta else 1, folded=folded
    )
