"""Axial-family checkpoint conversion parity (VERDICT round-1 item 6).

No axial checkpoints ship with the reference, so these tests build
synthetic state_dicts with the exact torch naming/layout the reference
would produce — ``Generic_UNet``'s decoder lists ``axial_embedding.{j}`` /
``axial_attention.{j}`` (ref generic_UNet.py:377-387) and ``Axial_UNet``'s
``axial_attention_down/up.{j}.axial_attention.{0,1,2}`` sequentials
(ref generic_UNet.py:489-799) — plus a clean-room torch oracle of the
``axial_attention`` pip package's math (AxialPositionalEmbedding additive
``param_{i}`` tensors; per-axis SelfAttention with fused-batch heads,
``dim_head**-0.5`` scaling, biased ``to_out``), and assert the converted
pytree reproduces the oracle's full-model forward.

Naming notes baked into the converter and checked here:
- package axis order is D, H, W (``calculate_permutations`` with
  dim_index=1 iterates dims 2, 3, 4);
- ``to_q``/``to_kv`` Linears are bias-free, ``to_out`` carries a bias;
- ``AxialAttention3D`` sequential indices: 0=pos-emb, 1=attention, 2=BN
  (when ``axial_bn``), then the non-parametric LeakyReLU;
- the reference *forward* indexes the decoder lists by stage ``u``
  directly (generic_UNet.py:437), which misindexes whenever a skipped
  stage precedes an attending one — dead-code bug for any
  ``no_attention != [0]``-style prefix skip.  The converter (and
  braintpu's apply) use as-built sequential order, the only
  interpretation under which the reference model is runnable.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from braintpu.ckpt import convert_state_dict
from braintpu.models import UNetConfig, apply_unet, init_params

from test_unet_parity import make_torch_state_dict, tiny_cfg, torch_forward

torch = pytest.importorskip("torch")
F = torch.nn.functional


def axial_cfg(mode):
    base = tiny_cfg("batch")
    return UNetConfig(**{
        **base.__dict__,
        "axial_attention": True,
        "axial_mode": mode,
        "attn_heads": 2,
        "attn_dim_head": 4,
        "no_attention_levels": (0,),
    })


def add_axial_sd(sd, emb_prefix, attn_prefix, C, shape_dhw, heads, dim_head, g):
    """Append one pos-emb + AxialAttention block's keys in torch layout."""
    inner = heads * dim_head
    D, H, W = shape_dhw
    sd[f"{emb_prefix}.param_0"] = torch.randn(1, C, D, 1, 1, generator=g) * 0.1
    sd[f"{emb_prefix}.param_1"] = torch.randn(1, C, 1, H, 1, generator=g) * 0.1
    sd[f"{emb_prefix}.param_2"] = torch.randn(1, C, 1, 1, W, generator=g) * 0.1
    for i in range(3):
        base = f"{attn_prefix}.axial_attentions.{i}.fn"
        sd[f"{base}.to_q.weight"] = torch.randn(inner, C, generator=g) * 0.2
        sd[f"{base}.to_kv.weight"] = torch.randn(2 * inner, C, generator=g) * 0.2
        sd[f"{base}.to_out.weight"] = torch.randn(C, inner, generator=g) * 0.2
        sd[f"{base}.to_out.bias"] = torch.randn(C, generator=g) * 0.1


def torch_axial_attention(sd, emb_prefix, attn_prefix, x, heads, dim_head, sum_out):
    """Oracle of the axial_attention package on (N, C, D, H, W)."""
    x = (
        x
        + sd[f"{emb_prefix}.param_0"]
        + sd[f"{emb_prefix}.param_1"]
        + sd[f"{emb_prefix}.param_2"]
    )

    def one_axis(x, i):
        N, C, D, H, W = x.shape
        if i == 0:
            y, L = x.permute(0, 3, 4, 2, 1).reshape(-1, D, C), D
        elif i == 1:
            y, L = x.permute(0, 2, 4, 3, 1).reshape(-1, H, C), H
        else:
            y, L = x.permute(0, 2, 3, 4, 1).reshape(-1, W, C), W
        base = f"{attn_prefix}.axial_attentions.{i}.fn"
        q = y @ sd[f"{base}.to_q.weight"].T
        k, v = (y @ sd[f"{base}.to_kv.weight"].T).chunk(2, dim=-1)
        b = q.shape[0]

        def mh(t):
            return (
                t.reshape(b, L, heads, dim_head)
                .permute(0, 2, 1, 3)
                .reshape(b * heads, L, dim_head)
            )

        q, k, v = mh(q), mh(k), mh(v)
        dots = torch.einsum("bie,bje->bij", q, k) * dim_head**-0.5
        out = torch.einsum("bij,bje->bie", dots.softmax(-1), v)
        out = (
            out.reshape(b, heads, L, dim_head)
            .permute(0, 2, 1, 3)
            .reshape(b, L, heads * dim_head)
        )
        out = out @ sd[f"{base}.to_out.weight"].T + sd[f"{base}.to_out.bias"]
        if i == 0:
            return out.reshape(N, H, W, D, C).permute(0, 4, 3, 1, 2)
        if i == 1:
            return out.reshape(N, D, W, H, C).permute(0, 4, 1, 3, 2)
        return out.reshape(N, D, H, W, C).permute(0, 4, 1, 2, 3)

    if sum_out:
        return one_axis(x, 0) + one_axis(x, 1) + one_axis(x, 2)
    for i in range(3):
        x = one_axis(x, i)
    return x


def torch_axial_block(sd, prefix, x, heads, dim_head, eps=1e-5, slope=0.01):
    """AxialAttention3D sequential: pos-emb -> summed attn -> BN -> LeakyReLU."""
    y = torch_axial_attention(
        sd, f"{prefix}.0", f"{prefix}.1", x, heads, dim_head, sum_out=True
    )
    y = F.batch_norm(
        y,
        sd[f"{prefix}.2.running_mean"],
        sd[f"{prefix}.2.running_var"],
        sd[f"{prefix}.2.weight"],
        sd[f"{prefix}.2.bias"],
        training=False,
        eps=eps,
    )
    return F.leaky_relu(y, slope)


def test_decoder_axial_convert_parity():
    """Generic_UNet decoder-attention namespace -> braintpu, full forward."""
    cfg = axial_cfg("decoder")
    g = torch.Generator().manual_seed(11)
    sd = dict(make_torch_state_dict(cfg, seed=11))
    # attention only at decoder stage u=1 (stage 0 excluded); d = P-u-1 = 0
    heads, dim_head = cfg.attn_heads, cfg.attn_dim_head  # 2**0 scaling
    add_axial_sd(sd, "axial_embedding.0", "axial_attention.0",
                 C=4, shape_dhw=(16, 16, 16), heads=heads, dim_head=dim_head, g=g)

    x_t = torch.randn(1, cfg.in_channels, 16, 16, 16,
                      generator=torch.Generator().manual_seed(5))

    # torch oracle: plain forward with attention spliced in after tu[1]
    def oracle(x):
        def block(prefix, h, stride=1):
            h = F.conv3d(h, sd[f"{prefix}.conv.weight"], sd[f"{prefix}.conv.bias"], stride, 1)
            h = F.batch_norm(
                h, sd[f"{prefix}.instnorm.running_mean"], sd[f"{prefix}.instnorm.running_var"],
                sd[f"{prefix}.instnorm.weight"], sd[f"{prefix}.instnorm.bias"],
                training=False, eps=cfg.norm_eps,
            )
            return F.leaky_relu(h, cfg.negative_slope)

        skips, h = [], x
        for d in range(cfg.num_pool):
            for c in range(cfg.conv_per_stage):
                stride = 2 if (d > 0 and c == 0) else 1
                h = block(f"conv_blocks_context.{d}.blocks.{c}", h, stride)
            skips.append(h)
        h = block(f"conv_blocks_context.{cfg.num_pool}.0.blocks.0", h, 2)
        h = block(f"conv_blocks_context.{cfg.num_pool}.1.blocks.0", h, 1)
        seg = None
        for u in range(cfg.num_pool):
            h = F.conv_transpose3d(h, sd[f"tu.{u}.weight"], stride=2)
            if u == 1:  # residual sequential attention (generic_UNet.py:437)
                h = torch_axial_attention(
                    sd, "axial_embedding.0", "axial_attention.0",
                    h, heads, dim_head, sum_out=False,
                ) + h
            h = torch.cat([h, skips[-(u + 1)]], dim=1)
            h = block(f"conv_blocks_localization.{u}.0.blocks.0", h)
            h = block(f"conv_blocks_localization.{u}.1.blocks.0", h)
            seg = F.conv3d(h, sd[f"seg_outputs.{u}.weight"])
        return seg

    with torch.no_grad():
        ref = oracle(x_t).numpy()

    params = convert_state_dict(sd, cfg)
    assert "attn" in params["decoder"][1] and "attn" not in params["decoder"][0]
    assert params["decoder"][1]["attn"]["axes"][0]["out_b"].shape == (4,)
    x_j = jnp.asarray(x_t.numpy().transpose(0, 2, 3, 4, 1))
    out = np.asarray(apply_unet(params, x_j, cfg)).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(out, ref, rtol=3e-4, atol=3e-4)


def test_full_axial_convert_parity():
    """Axial_UNet namespace (attention_down/up + BN) -> braintpu, full fwd."""
    cfg = axial_cfg("full")
    g = torch.Generator().manual_seed(13)
    sd = dict(make_torch_state_dict(cfg, seed=13))
    # level-indexed: d=1 attends (encoder stage 1 + decoder u=0), d=0 skipped
    heads, dim_head = cfg.attn_heads * 2, cfg.attn_dim_head * 2
    for prefix, C in (("axial_attention_down.0.axial_attention", 8),
                      ("axial_attention_up.0.axial_attention", 8)):
        add_axial_sd(sd, f"{prefix}.0", f"{prefix}.1", C=C, shape_dhw=(8, 8, 8),
                     heads=heads, dim_head=dim_head, g=g)
        sd[f"{prefix}.2.weight"] = torch.rand(C, generator=g) + 0.5
        sd[f"{prefix}.2.bias"] = torch.randn(C, generator=g) * 0.1
        sd[f"{prefix}.2.running_mean"] = torch.randn(C, generator=g) * 0.2
        sd[f"{prefix}.2.running_var"] = torch.rand(C, generator=g) + 0.5

    x_t = torch.randn(1, cfg.in_channels, 16, 16, 16,
                      generator=torch.Generator().manual_seed(6))

    def oracle(x):
        def block(prefix, h, stride=1):
            h = F.conv3d(h, sd[f"{prefix}.conv.weight"], sd[f"{prefix}.conv.bias"], stride, 1)
            h = F.batch_norm(
                h, sd[f"{prefix}.instnorm.running_mean"], sd[f"{prefix}.instnorm.running_var"],
                sd[f"{prefix}.instnorm.weight"], sd[f"{prefix}.instnorm.bias"],
                training=False, eps=cfg.norm_eps,
            )
            return F.leaky_relu(h, cfg.negative_slope)

        skips, h = [], x
        for d in range(cfg.num_pool):
            for c in range(cfg.conv_per_stage):
                stride = 2 if (d > 0 and c == 0) else 1
                h = block(f"conv_blocks_context.{d}.blocks.{c}", h, stride)
            if d == 1:  # AxialAttention3D after stage convs, feeds the skip
                h = torch_axial_block(
                    sd, "axial_attention_down.0.axial_attention", h, heads, dim_head
                )
            skips.append(h)
        h = block(f"conv_blocks_context.{cfg.num_pool}.0.blocks.0", h, 2)
        h = block(f"conv_blocks_context.{cfg.num_pool}.1.blocks.0", h, 1)
        seg = None
        for u in range(cfg.num_pool):
            h = F.conv_transpose3d(h, sd[f"tu.{u}.weight"], stride=2)
            if u == 0:  # level d=1: block after up-conv, before concat
                h = torch_axial_block(
                    sd, "axial_attention_up.0.axial_attention", h, heads, dim_head
                )
            h = torch.cat([h, skips[-(u + 1)]], dim=1)
            h = block(f"conv_blocks_localization.{u}.0.blocks.0", h)
            h = block(f"conv_blocks_localization.{u}.1.blocks.0", h)
            seg = F.conv3d(h, sd[f"seg_outputs.{u}.weight"])
        return seg

    with torch.no_grad():
        ref = oracle(x_t).numpy()

    params = convert_state_dict(sd, cfg)
    assert sorted(params["encoder_attn"].keys()) == ["1"]
    assert "bn" in params["encoder_attn"]["1"]
    assert "attn_block" in params["decoder"][0]
    assert "attn_block" not in params["decoder"][1]
    x_j = jnp.asarray(x_t.numpy().transpose(0, 2, 3, 4, 1))
    out = np.asarray(apply_unet(params, x_j, cfg)).transpose(0, 4, 1, 2, 3)
    # two stacked attention blocks + BN + convs accumulate f32 op-order
    # noise (XLA vs torch) up to ~1e-3 on a few elements
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("mode", ["decoder", "full"])
def test_converted_shapes_match_init(mode):
    """Converted axial pytrees are structurally identical to init_params —
    guards converter/init drift (sans out_b, absent at init: the package's
    to_out bias only exists on real checkpoints)."""
    cfg = axial_cfg(mode)
    g = torch.Generator().manual_seed(17)
    sd = dict(make_torch_state_dict(cfg, seed=17))
    if mode == "decoder":
        add_axial_sd(sd, "axial_embedding.0", "axial_attention.0",
                     C=4, shape_dhw=(16, 16, 16),
                     heads=cfg.attn_heads, dim_head=cfg.attn_dim_head, g=g)
    else:
        for prefix, C in (("axial_attention_down.0.axial_attention", 8),
                          ("axial_attention_up.0.axial_attention", 8)):
            add_axial_sd(sd, f"{prefix}.0", f"{prefix}.1", C=C,
                         shape_dhw=(8, 8, 8),
                         heads=cfg.attn_heads * 2, dim_head=cfg.attn_dim_head * 2, g=g)
            sd[f"{prefix}.2.weight"] = torch.ones(C)
            sd[f"{prefix}.2.bias"] = torch.zeros(C)
            sd[f"{prefix}.2.running_mean"] = torch.zeros(C)
            sd[f"{prefix}.2.running_var"] = torch.ones(C)
    converted = convert_state_dict(sd, cfg)
    initialized = init_params(cfg, jax.random.PRNGKey(0))

    def shapes(tree):
        return {
            k: v.shape
            for k, v in _flat(tree).items()
            if not k.endswith("out_b")
        }

    def _flat(tree, prefix=""):
        out = {}
        if isinstance(tree, dict):
            for k, v in tree.items():
                out.update(_flat(v, f"{prefix}{k}/"))
        elif isinstance(tree, (list, tuple)):
            for i, v in enumerate(tree):
                out.update(_flat(v, f"{prefix}{i}/"))
        else:
            out[prefix[:-1]] = np.asarray(tree)
        return out

    assert shapes(converted) == shapes(initialized)
