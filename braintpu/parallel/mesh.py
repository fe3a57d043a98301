"""Device mesh construction and sharding rules.

The reference has no distributed story at all (SURVEY.md §2.2: deliberately
serial, subprocess fan-out only).  Here multi-chip scaling is first-class and
TPU-native: a `jax.sharding.Mesh` with ``('data', 'model')`` axes, parameter
sharding via `NamedSharding`, and XLA-inserted collectives over ICI — no
NCCL/MPI analog, no process pipelines.

Axis roles:
* ``data``  — batch/case/patch parallelism (DP); gradients all-reduce here.
* ``model`` — tensor parallelism: output-channel sharding of wide conv
  weights (TP), which XLA turns into all-gather/reduce-scatter around the
  channel-contracting matmuls.  Spatial-axis sharding of activations (the
  context-parallel analog for volumetric data; XLA inserts halo exchanges for
  convs) is exposed via :func:`spatial_sharding`.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.unet3d import UNetConfig

__all__ = [
    "make_mesh",
    "batch_sharding",
    "spatial_sharding",
    "replicated",
    "param_shardings",
]


def make_mesh(
    devices: Optional[Sequence] = None,
    data: Optional[int] = None,
    model: Optional[int] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices.

    Defaults: use all devices; give TP 2 ways when there are ≥4 devices,
    otherwise pure DP.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if model is None:
        model = 2 if (data is None and n >= 4 and n % 2 == 0) else 1
    if data is None:
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} needs more than {n} devices")
    arr = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'; rest replicated."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def spatial_sharding(mesh: Mesh, ndim: int, axis: int = 1) -> NamedSharding:
    """Shard a spatial axis over 'model' (halo exchange handled by XLA)."""
    spec = [None] * ndim
    spec[0] = "data"
    spec[axis] = "model"
    return NamedSharding(mesh, P(*spec))


def _shard_block(block: Dict[str, Any], mesh: Mesh, model_size: int, min_ch: int):
    """Channel-shard one conv block's tensors over 'model' when divisible."""
    out = {}
    for name, arr in block.items():
        cout = arr.shape[-1]
        if cout >= min_ch and cout % model_size == 0:
            spec = P(*([None] * (arr.ndim - 1)), "model")
        else:
            spec = P()
        out[name] = NamedSharding(mesh, spec)
    return out


def param_shardings(
    params: Any, cfg: UNetConfig, mesh: Mesh, min_ch: int = 64
) -> Any:
    """NamedSharding pytree for a U-Net param tree: TP on wide channels.

    Output channels of every conv/norm tensor with ≥ ``min_ch`` channels are
    split over the 'model' axis; narrow tensors and seg heads stay
    replicated.  With mesh model=1 everything is replicated (pure DP).
    """
    model_size = mesh.shape["model"]
    if model_size == 1:
        return jax.tree_util.tree_map(lambda _: replicated(mesh), params)

    def conv_block(block):
        return _shard_block(block, mesh, model_size, min_ch)

    def rep_tree(subtree):
        return jax.tree_util.tree_map(lambda _: replicated(mesh), subtree)

    def decoder_stage(stage):
        sh = {
            "up": _shard_block(stage["up"], mesh, model_size, min_ch),
            "blocks": [conv_block(b) for b in stage["blocks"]],
        }
        # replicate anything else the stage carries (seg heads, the axial
        # 'attn' blocks, …) — the sharding tree must mirror the param tree
        # exactly or device_put fails with a structure mismatch
        for k in stage:
            if k not in sh:
                sh[k] = rep_tree(stage[k])
        return sh

    out = {
        "encoder": [[conv_block(b) for b in stage] for stage in params["encoder"]],
        "bottleneck": [conv_block(b) for b in params["bottleneck"]],
        "decoder": [decoder_stage(stage) for stage in params["decoder"]],
    }
    for k in params:  # e.g. 'encoder_attn' in the full axial family
        if k not in out:
            out[k] = rep_tree(params[k])
    return out
