"""Sharded training step and multi-case/data-parallel inference.

Multi-chip execution goes through ``jax.jit`` with `NamedSharding`
constraints over the :mod:`braintpu.parallel.mesh` axes: XLA/GSPMD inserts
the all-reduces (gradients over 'data'), all-gathers/reduce-scatters
(channel-TP over 'model'), and halo exchanges (spatially sharded convs).
Nothing here issues a collective by hand — the layout IS the program.

The single-case inference path deliberately needs no collective at all
(SURVEY.md §5 requirement); multi-chip is for throughput (many cases /
patch batches) and training.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.unet3d import UNetConfig, apply_unet
from ..train.trainer import TrainConfig, TrainState, create_train_state, train_step
from .mesh import batch_sharding, param_shardings, replicated

__all__ = [
    "shard_train_state",
    "make_sharded_train_step",
    "DataParallelPatchRunner",
    "make_fold_parallel_forward",
    "pad_folds_for_axis",
]


def make_fold_parallel_forward(
    cfg: UNetConfig,
    mesh: Mesh,
    num_folds: int,
    axis: str = "data",
    folded: bool = False,
) -> Callable:
    """Ensemble parallelism: shard the fold axis over ``axis``, psum the maps.

    The reference runs its 5 folds back-to-back on one core
    (run_brats2021_inference_singlethread.py:109-127); on a TPU slice the
    fold ensemble is embarrassingly parallel — each chip forwards its local
    folds and one ``psum`` over ICI merges the sigmoid maps (SURVEY.md §2.2
    "Ensemble parallelism").  Folds that don't divide the axis evenly are
    padded with zero-weight replicas so the weighted mean stays exact.

    Returns ``fwd(params_padded, weights, patches) -> (B, pd, ph, pw, K)``
    where ``params_padded`` has leading axis ``ceil(F/n)*n`` (see
    :func:`pad_folds_for_axis`) and ``weights`` is the matching per-fold
    weight vector summing to 1.
    """
    from jax.experimental.shard_map import shard_map

    n = mesh.shape[axis]

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P()),
        out_specs=P(),
    )
    def fwd(local_params, local_w, patches):
        def fold_step(acc, fold):
            fp, w = fold
            logits = apply_unet(fp, patches, cfg, folded=folded)
            acc = acc + w.astype(jnp.float32) * jax.nn.sigmoid(logits).astype(jnp.float32)
            return acc.astype(jnp.float32), None

        acc0 = jnp.zeros(patches.shape[:-1] + (cfg.num_classes,), jnp.float32)
        # the carry varies per-shard (each device owns different folds)
        acc0 = jax.lax.pvary(acc0, (axis,))
        local, _ = jax.lax.scan(fold_step, acc0, (local_params, local_w))
        return jax.lax.psum(local, axis)

    jfwd = jax.jit(fwd)

    def call(params_padded, weights, patches):
        lead = jax.tree_util.tree_leaves(params_padded)[0].shape[0]
        if lead % n != 0 or weights.shape[0] != lead or lead < num_folds:
            raise ValueError(
                f"fold axis {lead} must be a multiple of mesh axis {n}, match "
                f"weights ({weights.shape[0]}) and cover num_folds={num_folds} "
                "— pad with pad_folds_for_axis first"
            )
        return jfwd(params_padded, weights, patches)

    return call


def pad_folds_for_axis(
    params_stacked: Any, num_folds: int, axis_size: int
) -> Tuple[Any, jnp.ndarray]:
    """Pad the fold axis to a multiple of ``axis_size``; zero-weight the pads."""
    pad = (-num_folds) % axis_size
    if pad:
        # tile existing folds as padding (pad may exceed num_folds, e.g.
        # 5 folds on a 16-device axis → 11 pad entries)
        reps = -(-pad // num_folds)
        params_stacked = jax.tree_util.tree_map(
            lambda x: jnp.concatenate([x] + [x] * reps, axis=0)[: num_folds + pad],
            params_stacked,
        )
    w = jnp.concatenate(
        [jnp.full((num_folds,), 1.0 / num_folds), jnp.zeros((pad,))]
    )
    return params_stacked, w


def shard_train_state(
    state: TrainState, cfg: UNetConfig, mesh: Mesh
) -> Tuple[TrainState, Any]:
    """Place a train state onto the mesh (params TP-sharded, rest replicated).

    Momentum buffers mirror the parameter layout (same shapes → same
    shardings); scalar optimizer state and the step counter are replicated.
    Returns (sharded_state, state_shardings_pytree).
    """
    p_sh = param_shardings(state.params, cfg, mesh)
    param_struct = jax.tree_util.tree_structure(state.params)

    def _is_params_like(sub) -> bool:
        return jax.tree_util.tree_structure(sub) == param_struct

    def opt_item_shardings(item):
        # Optax chain states nest (e.g. (EmptyState, (TraceState, ...)));
        # any params-structured sub-tree is a momentum-like buffer and
        # mirrors the parameter layout; everything else is replicated.
        return jax.tree_util.tree_map(
            lambda sub: p_sh if _is_params_like(sub) else replicated(mesh),
            item,
            is_leaf=_is_params_like,
        )

    opt_sh = tuple(opt_item_shardings(item) for item in state.opt_state)
    shardings = TrainState(params=p_sh, opt_state=opt_sh, step=replicated(mesh))
    sharded = jax.device_put(state, shardings)
    return sharded, shardings


def make_sharded_train_step(
    mesh: Mesh, cfg: UNetConfig, tc: TrainConfig, state_shardings: Any
) -> Callable:
    """jit the train step with explicit in/out shardings over the mesh.

    Batch is sharded over 'data' (DP); params follow ``state_shardings``
    (TP over 'model' for wide channels).  Gradient all-reduce over 'data'
    and TP collectives over 'model' are inserted by GSPMD.
    """
    batch_sh = {
        "image": batch_sharding(mesh, 5),
        "labels": batch_sharding(mesh, 4),
    }
    metrics_sh = {
        "loss": replicated(mesh),
        "grad_norm": replicated(mesh),
        "step": replicated(mesh),
    }

    def step_fn(state, batch, key):
        return train_step(state, batch, cfg, tc, rng=key)

    jitted = jax.jit(
        step_fn,
        # key is replicated host PRNG data (or None) — leave unspecified
        in_shardings=(state_shardings, batch_sh, None),
        out_shardings=(state_shardings, metrics_sh),
        donate_argnums=(0,),
    )

    def wrapped(state, batch, key=None):
        # matches trainer.fit's step_fn contract (state, batch, key) while
        # keeping existing 2-arg callers working
        return jitted(state, batch, key)

    return wrapped


class DataParallelPatchRunner:
    """Multi-case throughput runner: fold all cases' sliding-window patches
    into 'data'-sharded batches, forward once per batch, blend on host.

    Keeps every chip busy across case boundaries — the spatial analog of
    cross-request batching in serving systems.
    """

    def __init__(
        self,
        params_stacked: Any,
        cfg: UNetConfig,
        mesh: Mesh,
        batch_size: int = 8,
        folded: bool = False,
    ):
        from ..infer.gaussian import gaussian_importance_map

        self.cfg = cfg
        self.mesh = mesh
        self.batch_size = batch_size
        self.params = jax.device_put(params_stacked, replicated(mesh))
        self.folded = folded
        self.gaussian = np.asarray(gaussian_importance_map(tuple(cfg.patch_size)))
        self._fwd = self._build_forward()

    def _build_forward(self):
        cfg, folded = self.cfg, self.folded
        mesh = self.mesh

        @partial(
            jax.jit,
            in_shardings=(None, batch_sharding(mesh, 5)),
            out_shardings=batch_sharding(mesh, 5),
        )
        def fwd(params_stacked, patches):
            def fold_step(acc, fold_params):
                logits = apply_unet(fold_params, patches, cfg, folded=folded)
                return acc + jax.nn.sigmoid(logits), None

            num_folds = jax.tree_util.tree_leaves(params_stacked)[0].shape[0]
            acc0 = jnp.zeros(patches.shape[:-1] + (cfg.num_classes,), jnp.float32)
            acc, _ = jax.lax.scan(fold_step, acc0, params_stacked)
            return acc / num_folds

        return fwd

    def run(self, volumes: Sequence[np.ndarray], step_size: float = 0.5) -> List[np.ndarray]:
        """(C, X, Y, Z) preprocessed volumes → per-case (X, Y, Z, K) probs."""
        from ..infer.gaussian import patch_grid

        pd, ph, pw = self.cfg.patch_size
        jobs = []  # (case_idx, start, patch_array)
        for ci, vol in enumerate(volumes):
            v = np.moveaxis(np.asarray(vol), 0, -1)
            for start in patch_grid(v.shape[:3], self.cfg.patch_size, step_size):
                x0, y0, z0 = map(int, start)
                jobs.append((ci, (x0, y0, z0), v[x0 : x0 + pd, y0 : y0 + ph, z0 : z0 + pw]))

        acc = [
            np.zeros(np.moveaxis(v, 0, -1).shape[:3] + (self.cfg.num_classes,), np.float32)
            for v in volumes
        ]
        wsum = [np.zeros(a.shape[:3] + (1,), np.float32) for a in acc]
        g = self.gaussian[..., None]

        B = self.batch_size
        for i in range(0, len(jobs), B):
            chunk = jobs[i : i + B]
            batch = np.stack([p for _, _, p in chunk])
            if len(chunk) < B:  # pad to static batch
                pad = np.zeros((B - len(chunk),) + batch.shape[1:], batch.dtype)
                batch = np.concatenate([batch, pad])
            probs = np.asarray(self._fwd(self.params, jnp.asarray(batch)))
            for (ci, (x0, y0, z0), _), p in zip(chunk, probs):
                acc[ci][x0 : x0 + pd, y0 : y0 + ph, z0 : z0 + pw] += p * g
                wsum[ci][x0 : x0 + pd, y0 : y0 + ph, z0 : z0 + pw] += g
        # NOTE: no epsilon floor — the Gaussian importance weight at patch
        # corners is ~1e-15..1e-21 and a floor would zero those voxels.
        # Every covered voxel has w > 0 exactly.
        return [np.divide(a, w, out=np.zeros_like(a), where=w > 0) for a, w in zip(acc, wsum)]
