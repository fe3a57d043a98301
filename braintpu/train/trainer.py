"""Training loop primitives: train state, SGD schedule, jitted train step.

The reference is inference-only; this module provides the full nnU-Net-style
training recipe for the same architecture so the framework can (re)train and
fine-tune on TPU: SGD + Nesterov momentum 0.99, weight decay 3e-5, polynomial
LR decay (1 - t/T)^0.9, deep-supervised Dice+BCE on sigmoid regions, and
BatchNorm running-stat updates threaded through the functional state.

The step is a pure function of (state, batch) — it jits single-chip and
pjits over a `Mesh` unchanged (:mod:`braintpu.parallel`).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.unet3d import UNetConfig, apply_unet
from .losses import deep_supervision_loss

__all__ = ["TrainConfig", "TrainState", "create_train_state", "fit", "make_optimizer", "train_step"]


@dataclass(frozen=True)
class TrainConfig:
    """nnU-Net default hyperparameters (hashable; usable as a static arg)."""

    base_lr: float = 1e-2
    momentum: float = 0.99
    weight_decay: float = 3e-5
    max_steps: int = 1000 * 250  # 1000 epochs × 250 iterations
    poly_power: float = 0.9


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(tc: TrainConfig) -> optax.GradientTransformation:
    schedule = optax.polynomial_schedule(
        init_value=tc.base_lr,
        end_value=0.0,
        power=tc.poly_power,
        transition_steps=tc.max_steps,
    )
    return optax.chain(
        optax.add_decayed_weights(tc.weight_decay),
        optax.sgd(learning_rate=schedule, momentum=tc.momentum, nesterov=True),
    )


def create_train_state(params: Any, tc: TrainConfig) -> TrainState:
    opt = make_optimizer(tc)
    return TrainState(params=params, opt_state=opt.init(params), step=jnp.zeros((), jnp.int32))


def _merge_bn_stats(params: Any, new_stats: Dict[str, Any]) -> Any:
    """Write updated BatchNorm running stats back into the param tree."""

    def merge_block(block, stats):
        if stats is None or "mean" not in block:
            return block
        out = dict(block)
        out["mean"] = stats["mean"]
        out["var"] = stats["var"]
        return out

    def merge_attn(block, stats):
        """Attention block: running stats live under block['bn']."""
        if stats is None or "bn" not in block:
            return block
        return {**block, "bn": {**block["bn"],
                                "mean": stats["mean"], "var": stats["var"]}}

    merged = {
        # preserve extra subtrees (e.g. encoder_attn for AXIAL_UNET_FULL)
        **{k: v for k, v in params.items() if k not in ("encoder", "bottleneck", "decoder")},
        "encoder": [
            [merge_block(b, s) for b, s in zip(stage, stage_stats)]
            for stage, stage_stats in zip(params["encoder"], new_stats["encoder"])
        ],
        "bottleneck": [
            merge_block(b, s)
            for b, s in zip(params["bottleneck"], new_stats["bottleneck"])
        ],
        "decoder": [
            # dict(stage) preserves non-BN keys (e.g. "attn" on axial models)
            {
                **stage,
                "blocks": [
                    merge_block(b, s)
                    for b, s in zip(stage["blocks"], stage_stats)
                ],
            }
            for stage, stage_stats in zip(params["decoder"], new_stats["decoder"])
        ],
    }
    # AXIAL_UNET_FULL: the attention blocks' own BatchNorm running stats
    # (apply_axial_block(train=True) emits them under "encoder_attn" /
    # "decoder_attn")
    for d, st in (new_stats.get("encoder_attn") or {}).items():
        merged["encoder_attn"] = {
            **merged.get("encoder_attn", {}),
            d: merge_attn(merged["encoder_attn"][d], st),
        }
    for u, st in (new_stats.get("decoder_attn") or {}).items():
        ui = int(u)
        stage = merged["decoder"][ui]
        if "attn_block" in stage:
            merged["decoder"][ui] = {
                **stage, "attn_block": merge_attn(stage["attn_block"], st),
            }
    return merged


@partial(jax.jit, static_argnames=("cfg", "tc"), donate_argnames=("state",))
def train_step(
    state: TrainState,
    batch: Dict[str, jnp.ndarray],
    cfg: UNetConfig,
    tc: TrainConfig,
    rng: Optional[jax.Array] = None,
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One optimization step.

    ``batch``: {"image": (N, D, H, W, C) float, "labels": (N, D, H, W) int}.
    Returns (new_state, metrics).
    """
    opt = make_optimizer(tc)

    def loss_fn(params):
        heads, new_stats = apply_unet(
            params, batch["image"], cfg, train=True, deep_supervision=True, rng=rng
        )
        loss = deep_supervision_loss(heads, batch["labels"])
        return loss, new_stats

    (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    updates, opt_state = opt.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    if cfg.norm == "batch":
        params = _merge_bn_stats(params, new_stats)

    gnorm = optax.global_norm(grads)
    new_state = TrainState(params=params, opt_state=opt_state, step=state.step + 1)
    return new_state, {"loss": loss, "grad_norm": gnorm, "step": new_state.step}


def fit(
    state: TrainState,
    batches,
    cfg: UNetConfig,
    tc: TrainConfig,
    num_steps: int,
    checkpoint_dir: Optional[os.PathLike] = None,
    checkpoint_every: int = 250,
    resume: bool = True,
    rng: Optional[jax.Array] = None,
    step_fn=None,
    on_metrics=None,
) -> TrainState:
    """Checkpointed training loop (restart-safe).

    Resumes from the latest checkpoint under ``checkpoint_dir`` when
    ``resume`` (the restored step count shortens the remaining loop), saves
    every ``checkpoint_every`` steps and once at the end.  ``batches`` is
    any iterable of ``{"image", "labels"}`` dicts; ``step_fn`` defaults to
    the single-device jitted :func:`train_step` and may be replaced with a
    sharded step (``parallel.make_sharded_train_step``).
    """
    mgr = None
    if checkpoint_dir is not None:
        from .checkpoint import CheckpointManager

        mgr = CheckpointManager(checkpoint_dir)
        if resume:
            restored = mgr.restore(state)
            if restored is not None:
                state = restored
    if step_fn is None:
        # call the already-jitted train_step directly: re-wrapping it in an
        # outer jax.jit would discard its donate_argnames buffer donation
        # and double peak HBM for params + optimizer state
        step_fn = lambda st, b, key: train_step(st, b, cfg, tc, rng=key)
    try:
        it = iter(batches)
        # host-side step counter (seeded from the restored checkpoint):
        # reading int(state.step) every iteration would block on the
        # device result each step and serialize dispatch against host-side
        # batch prep.  (on_metrics still syncs per step when provided —
        # pass None for maximum throughput.)
        step = int(state.step)
        while step < num_steps:
            try:
                batch = next(it)
            except StopIteration:
                break  # finite dataset exhausted — stop cleanly (checkpoint below)
            key = None
            if rng is not None:
                rng, key = jax.random.split(rng)
            state, metrics = step_fn(state, batch, key)
            step += 1
            if on_metrics is not None:
                on_metrics({k: float(v) for k, v in metrics.items()})
            if mgr is not None and step % checkpoint_every == 0:
                mgr.save(state)
        if mgr is not None and mgr.latest_step() != step:
            mgr.save(state)
    finally:
        if mgr is not None:
            mgr.close()
    return state
