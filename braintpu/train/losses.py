"""Training losses: region-based soft Dice + BCE with deep supervision.

The KAIST BraTS trainers optimize sigmoid region maps (WT/TC/ET) with a
combined Dice + binary-cross-entropy loss and multi-scale deep supervision
(nnU-Net's ``DC_and_BCE_loss``; the reference ships only inference, so this
module reconstructs the documented training objective for the same
architecture — see PROJECT_DOCUMENTATION.md:35-63 for the region setup and
generic_UNet.py:442-444 for the deep-supervision outputs).

All functions are pure jnp and jit/pjit-safe.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "labels_to_region_targets",
    "soft_dice_loss",
    "bce_with_logits",
    "dice_bce_loss",
    "deep_supervision_weights",
    "deep_supervision_loss",
]

#: Region definitions in the INTERNAL nnU-Net label space the training
#: pipeline feeds (data.py converts GT to 1=ED, 2=NCR, 3=ET before the
#: loss): WT={1,2,3}, TC=NCR+ET={2,3}, ET={3}.  These must match the
#: inference painting (region_probs_to_labels channel k → internal label
#: k+1): the TC sigmoid channel is painted as internal 2 (NCR), so it must
#: be supervised on the internal-space tumor core.  (In BraTS-2025 space
#: the same regions read WT={1,2,3}, TC={1,3}, ET={3} — that spelling on
#: internal labels would train TC on edema+ET.)
REGION_LABELS: Tuple[Tuple[int, ...], ...] = ((1, 2, 3), (2, 3), (3,))


def labels_to_region_targets(labels: jnp.ndarray, regions=REGION_LABELS) -> jnp.ndarray:
    """Integer label map (N, D, H, W) → region one-hot (N, D, H, W, R) f32."""
    outs = []
    for region in regions:
        m = jnp.zeros(labels.shape, bool)
        for l in region:
            m = m | (labels == l)
        outs.append(m)
    return jnp.stack(outs, axis=-1).astype(jnp.float32)


def soft_dice_loss(logits: jnp.ndarray, targets: jnp.ndarray, smooth: float = 1e-5) -> jnp.ndarray:
    """1 - mean soft Dice over (batch, channel); reductions over spatial dims."""
    probs = jax.nn.sigmoid(logits.astype(jnp.float32))
    axes = tuple(range(1, probs.ndim - 1))
    intersect = (probs * targets).sum(axes)
    denom = probs.sum(axes) + targets.sum(axes)
    dice = (2 * intersect + smooth) / (denom + smooth)
    return 1.0 - dice.mean()


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable mean binary cross-entropy on logits."""
    logits = logits.astype(jnp.float32)
    per_voxel = (
        jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
    return per_voxel.mean()


def dice_bce_loss(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    return soft_dice_loss(logits, targets) + bce_with_logits(logits, targets)


def deep_supervision_weights(num_heads: int) -> jnp.ndarray:
    """nnU-Net scheme: weight 1/2^i per scale, with the coarsest head ZEROED
    before normalizing (nnU-Net mutes the lowest-resolution output rather
    than training it), then normalized to sum 1.
    """
    w = [1.0 / (2**i) for i in range(num_heads)]
    if num_heads > 1:
        w[-1] = 0.0
    w = jnp.asarray(w, jnp.float32)
    return w / w.sum()


def _downsample_targets(targets: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Max-pool region targets to a coarser supervision scale (membership
    survives pooling, matching nnU-Net's downsampled-GT supervision)."""
    if factor == 1:
        return targets
    return jax.lax.reduce_window(
        targets,
        -jnp.inf,
        jax.lax.max,
        (1, factor, factor, factor, 1),
        (1, factor, factor, factor, 1),
        "VALID",
    )


def deep_supervision_loss(
    head_logits: Sequence[jnp.ndarray], labels: jnp.ndarray
) -> jnp.ndarray:
    """Weighted Dice+BCE across all decoder heads (full resolution first)."""
    targets = labels_to_region_targets(labels)
    weights = deep_supervision_weights(len(head_logits))
    full = head_logits[0].shape[1]
    total = 0.0
    for w, logits in zip(weights, head_logits):
        factor = full // logits.shape[1]
        total = total + w * dice_bce_loss(logits, _downsample_targets(targets, factor))
    return total
