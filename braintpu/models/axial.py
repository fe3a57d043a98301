"""Axial attention for 3D volumes (the KAIST Axial_UNet ingredient).

Functional JAX re-design of the reference's axial-attention option
(/root/reference/model_architecture/generic_UNet.py:377-387, 489-799, which
wraps the ``axial_attention`` PyTorch package): factorized self-attention
applied along each spatial axis in turn — the conv-world analog of
blockwise/sequence-parallel attention (SURVEY.md §5) — plus additive per-axis
positional embeddings, used residually in the decoder
(``x = attn(pos_emb(x)) + x``, ref :436-437).

TPU notes: each axis pass folds the other two axes into the batch dimension,
so the QK^T / PV contractions are large dense matmuls over sequence lengths
≤ patch size (128) — ideal MXU shapes without any custom kernel.  Attention
math runs in f32 (softmax stability) with bf16 activations in/out.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "init_axial_params",
    "apply_axial_attention",
    "init_axial_block",
    "apply_axial_block",
    "axial_stage_shapes",
]


def _he(key, shape, dtype):
    fan_in = shape[0] if len(shape) == 2 else int(np.prod(shape[:-1]))
    return jax.random.normal(key, shape, dtype) * np.sqrt(2.0 / fan_in)


def init_axial_params(
    key: jax.Array,
    channels: int,
    shape_dhw: Tuple[int, int, int],
    heads: int,
    dim_head: int,
    param_dtype=jnp.float32,
) -> Dict[str, Any]:
    """Parameters for one axial-attention block at one decoder scale.

    Per spatial axis: fused QKV projection and output projection (separate
    per-axis attentions, matching the reference package's structure), plus
    additive positional embeddings per axis.
    """
    inner = heads * dim_head
    keys = jax.random.split(key, 7)
    d, h, w = shape_dhw
    return {
        "pos": {
            "d": jnp.zeros((d, channels), param_dtype),
            "h": jnp.zeros((h, channels), param_dtype),
            "w": jnp.zeros((w, channels), param_dtype),
        },
        "axes": [
            {
                "qkv": _he(keys[2 * i], (channels, 3 * inner), param_dtype),
                "out": _he(keys[2 * i + 1], (inner, channels), param_dtype),
            }
            for i in range(3)
        ],
        # NOTE: head count is derived statically from qkv's shape at apply
        # time (inner // dim_head) — ints must not live in the pytree, they
        # would become traced leaves under jit/vmap/scan.
    }


#: HBM budget for one chunk's f32 attention logits.  Folding two spatial axes
#: into the batch makes the folded batch huge at fine decoder stages (e.g.
#: 8·128·128 = 131072 rows at the 128³ stage → 16 GB of logits if
#: materialized at once, past the 15.75 GB v5e HBM).  Chunking the folded
#: batch through lax.map bounds the temp while keeping each chunk's
#: contractions MXU-sized; per-row math is unchanged, so results are
#: identical to the unchunked path.
_MAX_LOGIT_BYTES = 512 * 1024 * 1024


def _axis_attention(
    x: jnp.ndarray, wqkv, wout, heads: int, dim_head: int, bout=None
) -> jnp.ndarray:
    """Self-attention along the second-to-last axis of (B, L, C)."""
    B, L, C = x.shape
    inner = heads * dim_head

    def attend(xc: jnp.ndarray) -> jnp.ndarray:
        n = xc.shape[0]
        qkv = jnp.einsum("blc,ck->blk", xc, wqkv.astype(xc.dtype))
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(t):
            return t.reshape(n, L, heads, dim_head).transpose(0, 2, 1, 3)

        q, k, v = split_heads(q), split_heads(k), split_heads(v)
        logits = jnp.einsum(
            "bhld,bhmd->bhlm", q, k, preferred_element_type=jnp.float32
        ) * (dim_head**-0.5)
        weights = jax.nn.softmax(logits, axis=-1).astype(xc.dtype)
        out = jnp.einsum("bhlm,bhmd->bhld", weights, v)
        out = out.transpose(0, 2, 1, 3).reshape(n, L, inner)
        y = jnp.einsum("blk,kc->blc", out, wout.astype(xc.dtype))
        if bout is not None:
            # the reference package's to_out Linear carries a bias
            # (axial_attention SelfAttention.to_out); present only on
            # converted checkpoints
            y = y + bout.astype(y.dtype)
        return y

    row_bytes = heads * L * L * 4
    if B * row_bytes <= _MAX_LOGIT_BYTES:
        return attend(x)
    # Largest power-of-two chunk dividing B that fits the logit budget.
    chunk = 1
    while B % (chunk * 2) == 0 and (chunk * 2) * row_bytes <= _MAX_LOGIT_BYTES:
        chunk *= 2
    y = jax.lax.map(attend, x.reshape(B // chunk, chunk, L, C))
    return y.reshape(B, L, C)


def _one_axis(params_axis, x, axis, heads, dim_head):
    """Attention along spatial ``axis`` (0=D, 1=H, 2=W) of (N, D, H, W, C)."""
    N, D, H, W, C = x.shape
    bout = params_axis.get("out_b")
    if axis == 0:
        y = x.transpose(0, 2, 3, 1, 4).reshape(N * H * W, D, C)
        y = _axis_attention(
            y, params_axis["qkv"], params_axis["out"], heads, dim_head, bout
        )
        return y.reshape(N, H, W, D, C).transpose(0, 3, 1, 2, 4)
    if axis == 1:
        y = x.transpose(0, 1, 3, 2, 4).reshape(N * D * W, H, C)
        y = _axis_attention(
            y, params_axis["qkv"], params_axis["out"], heads, dim_head, bout
        )
        return y.reshape(N, D, W, H, C).transpose(0, 1, 3, 2, 4)
    y = x.reshape(N * D * H, W, C)
    y = _axis_attention(
        y, params_axis["qkv"], params_axis["out"], heads, dim_head, bout
    )
    return y.reshape(N, D, H, W, C)


def apply_axial_attention(
    params: Dict[str, Any],
    x: jnp.ndarray,
    dim_head: int = 32,
    sum_axial_out: bool = False,
) -> jnp.ndarray:
    """(N, D, H, W, C) → (N, D, H, W, C): pos-embed + per-axis attention.

    ``sum_axial_out=False``: sequential composition — each axis attends on
    the previous axis's output (the decoder variant, generic_UNet.py:387).
    ``sum_axial_out=True``: all three axes attend on the same input and the
    outputs are summed (the Axial_UNet/AxialAttention3D default,
    generic_UNet.py:490-498).
    """
    inner = params["axes"][0]["qkv"].shape[1] // 3
    heads = max(1, inner // dim_head)
    pos = params["pos"]
    x = (
        x
        + pos["d"].astype(x.dtype)[None, :, None, None, :]
        + pos["h"].astype(x.dtype)[None, None, :, None, :]
        + pos["w"].astype(x.dtype)[None, None, None, :, :]
    )
    if sum_axial_out:
        return sum(
            _one_axis(params["axes"][i], x, i, heads, dim_head) for i in range(3)
        )
    for i in range(3):
        x = _one_axis(params["axes"][i], x, i, heads, dim_head)
    return x


def init_axial_block(
    key: jax.Array,
    channels: int,
    shape_dhw: Tuple[int, int, int],
    heads: int,
    dim_head: int,
    bn: bool = True,
    param_dtype=jnp.float32,
) -> Dict[str, Any]:
    """AxialAttention3D block (ref generic_UNet.py:489-511): positional
    embedding + summed axial attention + optional BatchNorm + LeakyReLU."""
    out = {"attn": init_axial_params(key, channels, shape_dhw, heads, dim_head, param_dtype)}
    if bn:
        out["bn"] = {
            "scale": jnp.ones((channels,), param_dtype),
            "shift": jnp.zeros((channels,), param_dtype),
            "mean": jnp.zeros((channels,), param_dtype),
            "var": jnp.ones((channels,), param_dtype),
        }
    return out


def apply_axial_block(
    params: Dict[str, Any],
    x: jnp.ndarray,
    dim_head: int,
    negative_slope: float = 0.01,
    sum_axial_out: bool = True,
    residual: bool = False,
    eps: float = 1e-5,
    train: bool = False,
    bn_momentum: float = 0.1,
):
    """AxialAttention3D block: attn → BN → LeakyReLU, optionally residual
    (ref generic_UNet.py:505-511).

    Inference (``train=False``, the default) normalizes with the running
    statistics and returns ``y``.  Training mode normalizes with the
    batch statistics and returns ``(y, new_bn_stats|None)`` where
    ``new_bn_stats`` carries the momentum-updated running mean/var
    (same convention as the conv blocks' BatchNorm in
    ``unet3d._norm``: biased variance normalizes, unbiased updates the
    running estimate — torch ``BatchNorm3d`` semantics).
    """
    y = apply_axial_attention(params["attn"], x, dim_head, sum_axial_out)
    new_bn = None
    if "bn" in params:
        bn = params["bn"]
        yf = y.astype(jnp.float32)
        if train:
            mean = yf.mean(axis=(0, 1, 2, 3))
            var = yf.var(axis=(0, 1, 2, 3))
            n = yf.size // yf.shape[-1]
            unbiased = var * (n / max(n - 1, 1))
            m = bn_momentum
            new_bn = {
                "mean": (1 - m) * bn["mean"].astype(jnp.float32) + m * mean,
                "var": (1 - m) * bn["var"].astype(jnp.float32) + m * unbiased,
            }
        else:
            mean = bn["mean"].astype(jnp.float32)
            var = bn["var"].astype(jnp.float32)
        yf = (yf - mean) * jax.lax.rsqrt(var + eps) * bn["scale"].astype(
            jnp.float32
        ) + bn["shift"].astype(jnp.float32)
        yf = jnp.where(yf >= 0, yf, yf * negative_slope)
        y = yf.astype(y.dtype)
    if residual:
        y = (x + y).astype(y.dtype)
    if train:
        return y, new_bn
    return y


def axial_stage_shapes(
    patch_size: Tuple[int, int, int], num_pool: int, no_attention: Sequence[int]
) -> Dict[int, Tuple[int, int, int]]:
    """Decoder-stage index → feature-map shape where attention applies.

    Matches the reference's per-level shapes: decoder stage ``u`` operates at
    ``patch / 2^(num_pool - u - 1)`` (generic_UNet.py:379-381).
    """
    out = {}
    for u in range(num_pool):
        if u in no_attention:
            continue
        d = num_pool - u - 1
        out[u] = tuple(int(s // (2**d)) for s in patch_size)
    return out
