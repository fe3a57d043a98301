"""Checkpoint conversion: PyTorch nnU-Net ``.model`` files → braintpu pytrees.

The reference loads 10 torch checkpoints (2 models × 5 folds,
``fold_{0..4}/model_final_checkpoint.model``) via nnU-Net's
``load_model_and_checkpoint_files``
(ref: /root/reference/run_brats2021_inference_singlethread.py:178-183,
PROJECT_DOCUMENTATION.md:505-519).  This module maps their ``state_dict``
naming onto the :mod:`braintpu.models.unet3d` pytree layout, with the layout
transposes required by the NDHWC/DHWIO convention:

==============================================  =============================
torch name                                       braintpu path
==============================================  =============================
conv_blocks_context.{d}.blocks.{c}.conv.*        encoder[d][c].w/.b
conv_blocks_context.{P}.{0|1}.blocks.{c}.conv.*  bottleneck[c'].w/.b
conv_blocks_context...instnorm.*                 …scale/shift(/mean/var)
tu.{u}.weight                                    decoder[u].up.w
conv_blocks_localization.{u}.{0|1}.blocks...     decoder[u].blocks[c']
seg_outputs.{u}.weight                           decoder[REV(u)].seg.w
==============================================  =============================

Weight transposes: Conv3d ``(O, I, kd, kh, kw) → (kd, kh, kw, I, O)``;
ConvTranspose3d ``(I, O, kd, kh, kw) → (I, kd, kh, kw, O)``;
seg 1×1×1 ``(O, I, 1, 1, 1) → (1, 1, 1, I, O)``.

Note ``seg_outputs`` is indexed by decoder build order in torch (deepest
first), same as our decoder list, so no reversal is actually needed; kept
explicit in :func:`convert_state_dict` for clarity.

Torch is only needed for ingesting legacy checkpoints; the framework's own
checkpoints are plain ``.npz`` pytrees (:func:`save_pytree_npz`).
"""

from __future__ import annotations

import io
import os
import re
from typing import Any, Dict, List, Mapping, Optional

import numpy as np

from ..models.unet3d import UNetConfig, decoder_channels, encoder_features

__all__ = [
    "convert_state_dict",
    "load_torch_checkpoint",
    "convert_torch_checkpoint",
    "save_pytree_npz",
    "load_pytree_npz",
    "flatten_pytree",
    "unflatten_pytree",
]


def _np(x) -> np.ndarray:
    """torch.Tensor | ndarray → float32 ndarray (no torch import required)."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def _conv_block_from(sd: Mapping[str, Any], prefix: str, has_bn_stats: bool) -> Dict[str, np.ndarray]:
    block = {
        "w": _np(sd[f"{prefix}.conv.weight"]).transpose(2, 3, 4, 1, 0),
        "b": _np(sd[f"{prefix}.conv.bias"]),
        "scale": _np(sd[f"{prefix}.instnorm.weight"]),
        "shift": _np(sd[f"{prefix}.instnorm.bias"]),
    }
    if has_bn_stats:
        block["mean"] = _np(sd[f"{prefix}.instnorm.running_mean"])
        block["var"] = _np(sd[f"{prefix}.instnorm.running_var"])
    return block


def _axial_params_from(
    sd: Mapping[str, Any], emb_prefix: str, attn_prefix: str
) -> Dict[str, Any]:
    """AxialPositionalEmbedding + AxialAttention state → braintpu axial params.

    The reference wraps the ``axial_attention`` pip package
    (ref generic_UNet.py:24, 377-387, 489-511), whose state_dict layout is:
    ``<emb>.param_{0,1,2}`` — (1, C, D, 1, 1)/(1, C, 1, H, 1)/(1, C, 1, 1, W)
    additive positional embeddings; ``<attn>.axial_attentions.{i}.fn.to_q/
    to_kv/to_out`` — per-axis SelfAttention Linears in D, H, W axis order
    (``calculate_permutations`` with dim_index=1 iterates dims 2, 3, 4).
    braintpu fuses q and kv into one (C, 3*inner) projection.
    """
    pos = {}
    for i, name in enumerate("dhw"):
        p = _np(sd[f"{emb_prefix}.param_{i}"])
        pos[name] = p.reshape(p.shape[1], -1).T  # (1,C,…axis…) → (axis, C)
    axes = []
    for i in range(3):
        base = f"{attn_prefix}.axial_attentions.{i}.fn"
        q = _np(sd[f"{base}.to_q.weight"])  # (inner, C), torch Linear layout
        kv = _np(sd[f"{base}.to_kv.weight"])  # (2*inner, C), k then v
        ax = {
            "qkv": np.concatenate([q.T, kv.T], axis=1),  # (C, 3*inner) q|k|v
            "out": _np(sd[f"{base}.to_out.weight"]).T,  # (inner, C)
        }
        if f"{base}.to_out.bias" in sd:
            ax["out_b"] = _np(sd[f"{base}.to_out.bias"])
        axes.append(ax)
    return {"pos": pos, "axes": axes}


def _axial_bn_from(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {
        "scale": _np(sd[f"{prefix}.weight"]),
        "shift": _np(sd[f"{prefix}.bias"]),
        "mean": _np(sd[f"{prefix}.running_mean"]),
        "var": _np(sd[f"{prefix}.running_var"]),
    }


def convert_state_dict(sd: Mapping[str, Any], cfg: UNetConfig) -> Dict[str, Any]:
    """Map a ``Generic_UNet``/``Axial_UNet`` state_dict onto the braintpu
    param pytree.

    Axial families: ``axial_mode='full'`` maps the Axial_UNet namespace
    (``axial_attention_down.{j}`` / ``axial_attention_up.{j}`` holding
    pos-emb → attention → BatchNorm sequentials, ref generic_UNet.py:489-799);
    ``axial_mode='decoder'`` maps Generic_UNet's ``axial_embedding.{j}`` +
    ``axial_attention.{j}`` decoder lists (ref generic_UNet.py:377-387).
    No axial checkpoints ship with the reference, so these mappings are
    validated against synthetic state_dicts in tests/test_axial_convert.py
    (naming read from the reference + the axial_attention package source),
    not against trained weights.
    """
    sd = {k.replace("module.", "", 1) if k.startswith("module.") else k: v for k, v in sd.items()}
    has_bn = cfg.norm == "batch"
    P = cfg.num_pool

    encoder: List[List[dict]] = []
    for d in range(P):
        stage = [
            _conv_block_from(sd, f"conv_blocks_context.{d}.blocks.{c}", has_bn)
            for c in range(cfg.conv_per_stage)
        ]
        encoder.append(stage)

    # bottleneck = Sequential(Stacked(conv_per_stage-1), Stacked(1))
    bottleneck: List[dict] = []
    for c in range(cfg.conv_per_stage - 1):
        bottleneck.append(_conv_block_from(sd, f"conv_blocks_context.{P}.0.blocks.{c}", has_bn))
    bottleneck.append(_conv_block_from(sd, f"conv_blocks_context.{P}.1.blocks.0", has_bn))

    decoder: List[dict] = []
    for u in range(P):
        up_w = _np(sd[f"tu.{u}.weight"]).transpose(0, 2, 3, 4, 1)
        blocks = [
            _conv_block_from(sd, f"conv_blocks_localization.{u}.0.blocks.{c}", has_bn)
            for c in range(cfg.conv_per_stage - 1)
        ]
        blocks.append(_conv_block_from(sd, f"conv_blocks_localization.{u}.1.blocks.0", has_bn))
        seg_w = _np(sd[f"seg_outputs.{u}.weight"]).transpose(2, 3, 4, 1, 0)
        decoder.append({"up": {"w": up_w}, "blocks": blocks, "seg": {"w": seg_w}})

    params = {"encoder": encoder, "bottleneck": bottleneck, "decoder": decoder}

    if cfg.axial_attention and cfg.axial_mode == "full":
        att_levels = [d for d in range(P) if d not in cfg.no_attention_levels]
        encoder_attn: Dict[str, Any] = {}
        for j, d in enumerate(att_levels):
            base = f"axial_attention_down.{j}.axial_attention"
            blk = {"attn": _axial_params_from(sd, f"{base}.0", f"{base}.1")}
            if f"{base}.2.running_mean" in sd:
                blk["bn"] = _axial_bn_from(sd, f"{base}.2")
            encoder_attn[str(d)] = blk
        if encoder_attn:
            params["encoder_attn"] = encoder_attn
        k = 0
        for u in range(P):
            if (P - u - 1) in cfg.no_attention_levels:
                continue
            base = f"axial_attention_up.{k}.axial_attention"
            blk = {"attn": _axial_params_from(sd, f"{base}.0", f"{base}.1")}
            if f"{base}.2.running_mean" in sd:
                blk["bn"] = _axial_bn_from(sd, f"{base}.2")
            decoder[u]["attn_block"] = blk
            k += 1
    elif cfg.axial_attention:
        j = 0
        for u in range(P):
            if u in cfg.no_attention_levels:
                continue
            decoder[u]["attn"] = _axial_params_from(
                sd, f"axial_embedding.{j}", f"axial_attention.{j}"
            )
            j += 1

    _validate_shapes(params, cfg)
    return params


def _validate_shapes(params: Dict[str, Any], cfg: UNetConfig) -> None:
    enc = encoder_features(cfg)
    for d, stage in enumerate(params["encoder"]):
        for c, blk in enumerate(stage):
            cin = (cfg.in_channels if d == 0 else enc[d - 1]) if c == 0 else enc[d]
            expect = (*cfg.conv_kernel, cin, enc[d])
            if blk["w"].shape != expect:
                raise ValueError(
                    f"encoder[{d}][{c}].w shape {blk['w'].shape} != {expect} "
                    f"(checkpoint does not match config {cfg.name})"
                )
    for u, ch in enumerate(decoder_channels(cfg)):
        got = params["decoder"][u]["up"]["w"].shape
        expect = (ch["from_down"], *cfg.pool_kernel, ch["skip"])
        if got != expect:
            raise ValueError(f"decoder[{u}].up.w shape {got} != {expect}")


def load_torch_checkpoint(path: os.PathLike) -> Dict[str, Any]:
    """Load an nnU-Net ``.model`` file's state_dict (handles old pickles)."""
    import torch

    ckpt = torch.load(os.fspath(path), map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        return ckpt["state_dict"]
    return ckpt


def convert_torch_checkpoint(path: os.PathLike, cfg: UNetConfig) -> Dict[str, Any]:
    return convert_state_dict(load_torch_checkpoint(path), cfg)


# ---------------------------------------------------------------------------
# Native pytree persistence (.npz with path keys)
# ---------------------------------------------------------------------------

_INDEX = re.compile(r"^\d+$")
_ESCAPED = re.compile(r"^K+\d+$")


def _escape_key(k: str) -> str:
    """Dict keys that could be mistaken for list indices get a 'K' prefix.

    Bare digits in a flattened path mean "list index"; dict keys that are
    digit strings (e.g. the ``encoder_attn`` level map of the full axial
    family, keyed '0'..'4') — or that already look escaped — gain one
    leading ``K`` so :func:`unflatten_pytree` can tell them apart.
    Without this, a digit-keyed dict either crashed densify (keys not
    starting at 0) or silently became a list, dropping every encoder
    attention block on reload.
    """
    if _INDEX.match(k) or _ESCAPED.match(k) or _SENTINEL.match(k):
        return "K" + k
    return k


def _unescape_key(k: str) -> str:
    if _ESCAPED.match(k) or (k.startswith("K") and _SENTINEL.match(k)):
        return k[1:]
    return k


#: empty containers flatten to no keys at all, so without explicit markers a
#: save/load round-trip would silently drop them (and downstream indexing
#: would KeyError far from the save site)
_EMPTY_DICT, _EMPTY_LIST = "__EMPTY_DICT__", "__EMPTY_LIST__"
_SENTINEL = re.compile(r"^K*__EMPTY_(DICT|LIST)__$")


def flatten_pytree(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, Mapping):
        if not tree:
            out[f"{prefix}{_EMPTY_DICT}"] = np.zeros(0, np.bool_)
            return out
        for k, v in tree.items():
            out.update(flatten_pytree(v, f"{prefix}{_escape_key(str(k))}/"))
    elif isinstance(tree, (list, tuple)):
        if not tree:
            out[f"{prefix}{_EMPTY_LIST}"] = np.zeros(0, np.bool_)
            return out
        for i, v in enumerate(tree):
            out.update(flatten_pytree(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def unflatten_pytree(flat: Mapping[str, np.ndarray]) -> Any:
    root: Dict[str, Any] = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    def densify(node):
        if not isinstance(node, dict):
            return node
        if set(node) == {_EMPTY_DICT}:
            return {}
        if set(node) == {_EMPTY_LIST}:
            return []
        if node and all(_INDEX.match(k) for k in node):
            return [densify(node[str(i)]) for i in range(len(node))]
        return {_unescape_key(k): densify(v) for k, v in node.items()}

    return densify(root)


def save_pytree_npz(params: Any, path: os.PathLike) -> None:
    flat = flatten_pytree(params)
    os.makedirs(os.path.dirname(os.fspath(path)) or ".", exist_ok=True)
    np.savez_compressed(os.fspath(path), **flat)


def load_pytree_npz(path: os.PathLike) -> Any:
    with np.load(os.fspath(path)) as z:
        return unflatten_pytree({k: z[k] for k in z.files})
