"""Modular 3D U-Net: decoupled encoder/decoder with per-stage plans.

TPU-native re-design of the reference's ``generic_modular_UNet.py``
(/root/reference/model_architecture/generic_modular_UNet.py:82-369):
``PlainConvUNetEncoder`` returns the per-stage skip list, the decoder
consumes it, and both expose approximate-memory estimators used for plan
selection.  Unlike the fixed KAIST topology in :mod:`braintpu.models.unet3d`
every stage is individually configurable — pool kernel (anisotropic allowed,
``(1,1,1)`` for no pooling), conv kernel size, and block count — matching
nnU-Net's experiment planner outputs.

Design notes (not a port):

* params are nested dicts; the encoder/decoder split is literal — separate
  init/apply functions with the skip list as the interface, so an encoder
  can be reused as a feature extractor or paired with a different decoder.
* pooling is a strided conv (first conv of each stage), upsampling is an
  einsum + pixel-shuffle (non-overlapping stride-k transposed conv is a pure
  MXU matmul; see unet3d._upconv).
* the memory estimator reports activation bytes for the TPU compute dtype —
  the analog of the reference's ``compute_approx_vram_consumption``
  (generic_modular_UNet.py:163-316) used to pick batch/patch sizes.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .unet3d import UNetConfig, _block_apply, _he_init, _seg_head, _upconv

__all__ = [
    "ModularUNetConfig",
    "REFERENCE_3D",
    "stage_features",
    "init_encoder",
    "apply_encoder",
    "init_decoder",
    "apply_decoder",
    "init_modular_unet",
    "apply_modular_unet",
    "estimate_activation_bytes",
]

Triple = Tuple[int, int, int]


@dataclass(frozen=True)
class ModularUNetConfig:
    """Static per-stage architecture plan (hashable -> jit static arg)."""

    in_channels: int = 4
    num_classes: int = 3
    base_features: int = 32
    max_features: int = 480
    feat_map_mul: int = 2
    #: stage 0 pool is applied before its convs; (1,1,1) = no pooling.
    pool_kernels: Tuple[Triple, ...] = (
        (1, 1, 1),
        (2, 2, 2),
        (2, 2, 2),
        (2, 2, 2),
        (2, 2, 2),
        (2, 2, 2),
    )
    conv_kernels: Tuple[Triple, ...] = ((3, 3, 3),) * 6
    blocks_per_stage_encoder: Tuple[int, ...] = (2, 2, 2, 2, 2, 2)
    #: decoder has one stage fewer (bottleneck belongs to the encoder);
    #: None mirrors the encoder (reference default, generic_modular_UNet.py:212).
    blocks_per_stage_decoder: Optional[Tuple[int, ...]] = None
    norm: str = "instance"
    #: GroupNorm group count (norm='group'); every stage's feature count
    #: must be a multiple of it — validated in __post_init__ so arbitrary
    #: experiment-planner widths fail at config time, not mid-forward
    group_norm_groups: int = 8
    negative_slope: float = 0.01
    compute_dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    final_nonlin: str = "softmax"

    def __post_init__(self):
        assert len(self.pool_kernels) == len(self.conv_kernels) == len(
            self.blocks_per_stage_encoder
        ), "per-stage plans must have equal length"
        if self.blocks_per_stage_decoder is not None:
            assert len(self.blocks_per_stage_decoder) == self.num_stages - 1
        if self.norm == "group":
            # inline (module-level stage_features isn't defined yet when
            # the REFERENCE_3D instance is built at import time)
            feats = [
                min(self.base_features * self.feat_map_mul**s, self.max_features)
                for s in range(self.num_stages)
            ]
            bad = [f for f in feats if f % self.group_norm_groups]
            if bad:
                raise ValueError(
                    f"stage feature counts {bad} are not multiples of "
                    f"group_norm_groups={self.group_norm_groups}; pick a "
                    "group count that divides every stage width"
                )

    @property
    def num_stages(self) -> int:
        return len(self.pool_kernels)

    def decoder_blocks(self) -> Tuple[int, ...]:
        if self.blocks_per_stage_decoder is not None:
            return self.blocks_per_stage_decoder
        return tuple(self.blocks_per_stage_encoder[:-1][::-1])

    def block_cfg(self, kernel: Triple) -> UNetConfig:
        """Per-stage shim reusing the unet3d block machinery."""
        return UNetConfig(
            norm=self.norm,
            group_norm_groups=self.group_norm_groups,
            negative_slope=self.negative_slope,
            compute_dtype=self.compute_dtype,
            param_dtype=self.param_dtype,
            conv_kernel=kernel,
        )


#: The reference's 3D memory-budget configuration
#: (generic_modular_UNet.py:356-369: patch 160x128x128, 32->512 features).
REFERENCE_3D = ModularUNetConfig(max_features=512)


def stage_features(cfg: ModularUNetConfig) -> List[int]:
    return [
        min(cfg.base_features * cfg.feat_map_mul**s, cfg.max_features)
        for s in range(cfg.num_stages)
    ]


def _init_block(key, cin, cout, kernel, cfg: ModularUNetConfig):
    block = {
        "w": _he_init(key, (*kernel, cin, cout), cfg.negative_slope, cfg.param_dtype),
        "b": jnp.zeros((cout,), cfg.param_dtype),
        "scale": jnp.ones((cout,), cfg.param_dtype),
        "shift": jnp.zeros((cout,), cfg.param_dtype),
    }
    if cfg.norm == "batch":
        block["mean"] = jnp.zeros((cout,), cfg.param_dtype)
        block["var"] = jnp.ones((cout,), cfg.param_dtype)
    return block


def init_encoder(cfg: ModularUNetConfig, key: jax.Array) -> List[List[Dict]]:
    """Per-stage lists of conv blocks; stage s downsamples by pool_kernels[s]."""
    feats = stage_features(cfg)
    stages = []
    cin = cfg.in_channels
    keys = iter(jax.random.split(key, sum(cfg.blocks_per_stage_encoder)))
    for s in range(cfg.num_stages):
        blocks = []
        for c in range(cfg.blocks_per_stage_encoder[s]):
            blocks.append(
                _init_block(
                    next(keys), cin if c == 0 else feats[s], feats[s], cfg.conv_kernels[s], cfg
                )
            )
        stages.append(blocks)
        cin = feats[s]
    return stages


def apply_encoder(
    params: Sequence[Sequence[Dict]], x: jnp.ndarray, cfg: ModularUNetConfig
) -> List[jnp.ndarray]:
    """(N, D, H, W, C) -> per-stage skips, bottleneck last
    (matching the reference's skip ordering, generic_modular_UNet.py:140-161)."""
    skips = []
    h = x
    for s, blocks in enumerate(params):
        bc = cfg.block_cfg(cfg.conv_kernels[s])
        for c, block in enumerate(blocks):
            stride = cfg.pool_kernels[s] if c == 0 else (1, 1, 1)
            h, _ = _block_apply(h, block, bc, stride)
        skips.append(h)
    return skips


def init_decoder(cfg: ModularUNetConfig, key: jax.Array) -> List[Dict]:
    """One stage per encoder skip below the bottleneck (deepest first)."""
    feats = stage_features(cfg)
    dec_blocks = cfg.decoder_blocks()
    stages = []
    n = cfg.num_stages - 1
    keys = iter(jax.random.split(key, n * (max(dec_blocks) + 2) + 1))
    for i, s in enumerate(range(n - 1, -1, -1)):
        below, skip = feats[s + 1], feats[s]
        up_w = _he_init(
            next(keys),
            (below, *cfg.pool_kernels[s + 1], skip),
            cfg.negative_slope,
            cfg.param_dtype,
        )
        blocks = [_init_block(next(keys), 2 * skip, skip, cfg.conv_kernels[s], cfg)]
        for _ in range(dec_blocks[i] - 1):
            blocks.append(_init_block(next(keys), skip, skip, cfg.conv_kernels[s], cfg))
        seg_w = _he_init(
            next(keys), (1, 1, 1, skip, cfg.num_classes), cfg.negative_slope, cfg.param_dtype
        )
        stages.append({"up": {"w": up_w}, "blocks": blocks, "seg": {"w": seg_w}})
    return stages


def apply_decoder(
    params: Sequence[Dict],
    skips: Sequence[jnp.ndarray],
    cfg: ModularUNetConfig,
    deep_supervision: bool = False,
):
    """Skips (bottleneck last) -> logits (full-resolution head; all heads when
    ``deep_supervision``, full-resolution first)."""
    h = skips[-1]
    heads = []
    n = cfg.num_stages - 1
    for i, stage in enumerate(params):
        s = n - 1 - i  # encoder stage whose skip we consume
        bc = cfg.block_cfg(cfg.conv_kernels[s])
        h = _upconv(h, stage["up"]["w"], cfg.compute_dtype)
        h = jnp.concatenate([h, skips[s]], axis=-1)
        for block in stage["blocks"]:
            h, _ = _block_apply(h, block, bc)
        heads.append(_seg_head(h, stage["seg"], cfg.compute_dtype))
    if deep_supervision:
        return [heads[-1]] + heads[:-1][::-1]
    return heads[-1]


def init_modular_unet(cfg: ModularUNetConfig, key: jax.Array) -> Dict[str, Any]:
    ke, kd = jax.random.split(key)
    return {"encoder": init_encoder(cfg, ke), "decoder": init_decoder(cfg, kd)}


@partial(jax.jit, static_argnames=("cfg", "deep_supervision"))
def apply_modular_unet(
    params: Dict[str, Any],
    x: jnp.ndarray,
    cfg: ModularUNetConfig,
    deep_supervision: bool = False,
):
    skips = apply_encoder(params["encoder"], x, cfg)
    return apply_decoder(params["decoder"], skips, cfg, deep_supervision)


def estimate_activation_bytes(
    cfg: ModularUNetConfig, patch_size: Triple, batch: int = 1
) -> int:
    """Approximate peak activation footprint of one forward pass (bytes).

    TPU analog of the reference's VRAM estimators
    (generic_modular_UNet.py:163-182, 288-316): sums stage feature maps
    (encoder blocks, decoder concat + blocks) at the compute dtype.
    """
    itemsize = jnp.dtype(cfg.compute_dtype).itemsize
    feats = stage_features(cfg)
    shape = np.asarray(patch_size, np.int64)
    total = 0
    shapes = []
    for s in range(cfg.num_stages):
        shape = shape // np.asarray(cfg.pool_kernels[s])
        shapes.append(shape.copy())
        total += int(shape.prod()) * feats[s] * cfg.blocks_per_stage_encoder[s]
    dec_blocks = cfg.decoder_blocks()
    for i, s in enumerate(range(cfg.num_stages - 2, -1, -1)):
        vox = int(shapes[s].prod())
        total += vox * feats[s] * (2 + dec_blocks[i])  # concat + conv blocks
    return total * batch * itemsize
