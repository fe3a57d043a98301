"""U-Net forward parity vs a clean-room PyTorch functional oracle.

Builds a random nnU-Net-style state_dict (torch naming/layout), runs it
through (a) a minimal torch.nn.functional forward implementing the
Generic_UNet semantics (conv pooling, eval BatchNorm/GroupNorm, transposed
conv upsampling, per-stage seg heads) and (b) braintpu's converter + JAX
forward, and asserts agreement.  This is the SURVEY.md §4(b) "numerical
parity vs a PyTorch oracle" layer.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from braintpu.ckpt import (
    convert_state_dict,
    load_pytree_npz,
    save_pytree_npz,
)
from braintpu.models import (
    UNetConfig,
    apply_unet,
    decoder_channels,
    encoder_features,
    bottleneck_features,
    fold_batchnorm,
    init_params,
    param_count,
)

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow  # full-topology forwards at production feature widths
F = torch.nn.functional


def tiny_cfg(norm="batch", encoder_scale=1):
    return UNetConfig(
        in_channels=2,
        num_classes=3,
        base_features=4,
        max_features=16,
        num_pool=2,
        conv_per_stage=2,
        encoder_scale=encoder_scale,
        norm=norm,
        group_norm_groups=2,
        patch_size=(16, 16, 16),
        compute_dtype=jnp.float32,
    )


def make_torch_state_dict(cfg, seed=0):
    """Random weights with nnU-Net Generic_UNet naming and torch layouts."""
    g = torch.Generator().manual_seed(seed)
    sd = {}

    def conv_block(prefix, cin, cout):
        sd[f"{prefix}.conv.weight"] = torch.randn(cout, cin, 3, 3, 3, generator=g) * 0.2
        sd[f"{prefix}.conv.bias"] = torch.randn(cout, generator=g) * 0.1
        sd[f"{prefix}.instnorm.weight"] = torch.rand(cout, generator=g) + 0.5
        sd[f"{prefix}.instnorm.bias"] = torch.randn(cout, generator=g) * 0.1
        if cfg.norm == "batch":
            sd[f"{prefix}.instnorm.running_mean"] = torch.randn(cout, generator=g) * 0.2
            sd[f"{prefix}.instnorm.running_var"] = torch.rand(cout, generator=g) + 0.5

    enc = encoder_features(cfg)
    cin = cfg.in_channels
    for d in range(cfg.num_pool):
        for c in range(cfg.conv_per_stage):
            conv_block(f"conv_blocks_context.{d}.blocks.{c}", cin if c == 0 else enc[d], enc[d])
        cin = enc[d]
    bneck = bottleneck_features(cfg)
    conv_block(f"conv_blocks_context.{cfg.num_pool}.0.blocks.0", cin, bneck)
    conv_block(f"conv_blocks_context.{cfg.num_pool}.1.blocks.0", bneck, bneck)

    for u, ch in enumerate(decoder_channels(cfg)):
        sd[f"tu.{u}.weight"] = torch.randn(ch["from_down"], ch["skip"], 2, 2, 2, generator=g) * 0.2
        conv_block(f"conv_blocks_localization.{u}.0.blocks.0", 2 * ch["skip"], ch["skip"])
        conv_block(f"conv_blocks_localization.{u}.1.blocks.0", ch["skip"], ch["out"])
        sd[f"seg_outputs.{u}.weight"] = torch.randn(cfg.num_classes, ch["out"], 1, 1, 1, generator=g) * 0.2
    return sd


def torch_forward(sd, cfg, x):
    """Eval-mode forward with Generic_UNet semantics (torch functional)."""

    def block(prefix, h, stride=1):
        h = F.conv3d(h, sd[f"{prefix}.conv.weight"], sd[f"{prefix}.conv.bias"], stride, 1)
        if cfg.norm == "batch":
            h = F.batch_norm(
                h,
                sd[f"{prefix}.instnorm.running_mean"],
                sd[f"{prefix}.instnorm.running_var"],
                sd[f"{prefix}.instnorm.weight"],
                sd[f"{prefix}.instnorm.bias"],
                training=False,
                eps=cfg.norm_eps,
            )
        elif cfg.norm == "group":
            h = F.group_norm(
                h,
                cfg.group_norm_groups,
                sd[f"{prefix}.instnorm.weight"],
                sd[f"{prefix}.instnorm.bias"],
                eps=cfg.norm_eps,
            )
        else:
            h = F.instance_norm(
                h,
                weight=sd[f"{prefix}.instnorm.weight"],
                bias=sd[f"{prefix}.instnorm.bias"],
                eps=cfg.norm_eps,
            )
        return F.leaky_relu(h, cfg.negative_slope)

    skips = []
    h = x
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
        h = torch.cat([h, skips[-(u + 1)]], dim=1)
        h = block(f"conv_blocks_localization.{u}.0.blocks.0", h)
        h = block(f"conv_blocks_localization.{u}.1.blocks.0", h)
        seg = F.conv3d(h, sd[f"seg_outputs.{u}.weight"])
    return seg


@pytest.mark.parametrize("norm,scale", [("batch", 1), ("group", 2), ("instance", 1)])
def test_forward_parity_vs_torch(norm, scale):
    cfg = tiny_cfg(norm, scale)
    sd = make_torch_state_dict(cfg)
    x_t = torch.randn(1, cfg.in_channels, 16, 16, 16, generator=torch.Generator().manual_seed(7))
    with torch.no_grad():
        ref = torch_forward(sd, cfg, x_t).numpy()  # (N, C, D, H, W)

    params = convert_state_dict(sd, cfg)
    x_j = jnp.asarray(x_t.numpy().transpose(0, 2, 3, 4, 1))  # NDHWC
    out = np.asarray(apply_unet(params, x_j, cfg))
    out_nchw = out.transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(out_nchw, ref, rtol=2e-4, atol=2e-4)


def test_fold_batchnorm_equivalence():
    cfg = tiny_cfg("batch")
    sd = make_torch_state_dict(cfg, seed=2)
    params = convert_state_dict(sd, cfg)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 16, 16, 16, 2)).astype(np.float32))
    ref = np.asarray(apply_unet(params, x, cfg))
    folded = fold_batchnorm(params, cfg)
    out = np.asarray(apply_unet(folded, x, cfg, folded=True))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_deep_supervision_heads():
    cfg = tiny_cfg("batch")
    params = init_params(cfg, jax.random.PRNGKey(0))
    x = jnp.zeros((1, 16, 16, 16, 2), jnp.float32)
    heads, _ = apply_unet(params, x, cfg, deep_supervision=True)
    assert len(heads) == cfg.num_pool
    # head 0 = full resolution, then decreasing
    assert heads[0].shape == (1, 16, 16, 16, 3)
    assert heads[1].shape == (1, 8, 8, 8, 3)


def test_real_config_channel_plan():
    """The production configs reproduce the documented channel progression."""
    from braintpu.models import MODEL1_BN, MODEL2_GN_LARGE

    assert encoder_features(MODEL1_BN) == [32, 64, 128, 256, 320]
    assert bottleneck_features(MODEL1_BN) == 320
    plan1 = decoder_channels(MODEL1_BN)
    assert [p["skip"] for p in plan1] == [320, 256, 128, 64, 32]
    assert [p["out"] for p in plan1] == [320, 256, 128, 64, 32]

    assert encoder_features(MODEL2_GN_LARGE) == [64, 128, 256, 320, 320]
    plan2 = decoder_channels(MODEL2_GN_LARGE)
    assert [p["out"] for p in plan2] == [160, 160, 128, 64, 32]
    assert [p["from_down"] for p in plan2] == [320, 160, 160, 128, 64]


def test_npz_roundtrip(tmp_path):
    cfg = tiny_cfg("batch")
    params = init_params(cfg, jax.random.PRNGKey(1))
    path = tmp_path / "ckpt.npz"
    save_pytree_npz(params, path)
    loaded = load_pytree_npz(path)
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(loaded)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert param_count(loaded) == param_count(params)


@pytest.mark.parametrize("no_attn", [(0,), (1,)], ids=["skip0", "skip1"])
def test_npz_roundtrip_axial_full(tmp_path, no_attn):
    """encoder_attn is a DICT keyed by digit strings ('0'..'4' levels) —
    the densify heuristic must not confuse it with a list.  Regression:
    keys not starting at 0 crashed the loader; keys 0..n-1 silently became
    a list, and apply_unet then skipped every encoder attention block."""
    cfg = UNetConfig(
        norm="batch", base_features=8, num_pool=2, patch_size=(16, 16, 16),
        axial_attention=True, axial_mode="full", attn_heads=2,
        attn_dim_head=4, no_attention_levels=no_attn,
        compute_dtype=jnp.float32,
    )
    params = init_params(cfg, jax.random.PRNGKey(2))
    assert isinstance(params["encoder_attn"], dict)
    path = tmp_path / "axial.npz"
    save_pytree_npz(params, path)
    loaded = load_pytree_npz(path)
    assert isinstance(loaded["encoder_attn"], dict)
    assert set(loaded["encoder_attn"]) == set(params["encoder_attn"])
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 16, 16, 16, 4)).astype(np.float32)
    )
    np.testing.assert_array_equal(
        np.asarray(apply_unet(loaded, x, cfg)),
        np.asarray(apply_unet(params, x, cfg)),
    )


def test_init_shapes_match_converted_shapes():
    cfg = tiny_cfg("group", 2)
    sd = make_torch_state_dict(cfg)
    converted = convert_state_dict(sd, cfg)
    initialized = init_params(cfg, jax.random.PRNGKey(0))
    ca = jax.tree_util.tree_map(lambda a: a.shape, converted)
    cb = jax.tree_util.tree_map(lambda a: a.shape, initialized)
    assert ca == cb


def test_axial_attention_variant():
    """Axial_UNet variant: shapes, determinism, and residual behavior."""
    import jax
    import jax.numpy as jnp
    from braintpu.models import init_params as ip, apply_unet as au

    cfg = tiny_cfg("batch")
    cfg = cfg.__class__(**{**cfg.__dict__, "axial_attention": True,
                           "attn_heads": 2, "attn_dim_head": 4,
                           "no_attention_levels": (0,)})
    params = ip(cfg, jax.random.PRNGKey(0))
    # attention present only at decoder stage 1 (stage 0 excluded)
    assert "attn" not in params["decoder"][0]
    assert "attn" in params["decoder"][1]
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 16, 16, 16, 2)).astype(np.float32))
    out = au(params, x, cfg)
    assert out.shape == (1, 16, 16, 16, 3)
    out2 = au(params, x, cfg)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    # zeroed attention output-projection == plain U-Net (residual identity)
    zeroed = jax.tree_util.tree_map(lambda a: a, params)
    import copy
    zeroed = copy.deepcopy(jax.tree_util.tree_map(np.asarray, params))
    for ax in zeroed["decoder"][1]["attn"]["axes"]:
        ax["out"] = np.zeros_like(ax["out"])
    for k in ("d", "h", "w"):
        zeroed["decoder"][1]["attn"]["pos"][k] = np.zeros_like(
            zeroed["decoder"][1]["attn"]["pos"][k]
        )
    plain_params = {
        "encoder": zeroed["encoder"],
        "bottleneck": zeroed["bottleneck"],
        "decoder": [
            {k: v for k, v in st.items() if k != "attn"} for st in zeroed["decoder"]
        ],
    }
    plain_cfg = tiny_cfg("batch")
    a = np.asarray(au(zeroed, x, cfg))
    b = np.asarray(au(plain_params, x, plain_cfg))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_axial_attention_chunked_matches_unchunked(monkeypatch):
    """Batch-chunked lax.map path (HBM-bounded) is bit-identical per row."""
    import jax
    import jax.numpy as jnp
    from braintpu.models import axial

    key = jax.random.PRNGKey(3)
    params = axial.init_axial_params(key, channels=8, shape_dhw=(8, 8, 8), heads=2, dim_head=4)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 8, 8, 8, 8), jnp.float32)
    full = axial.apply_axial_attention(params, x, dim_head=4)
    # Budget small enough to force chunking on every axis pass (folded batch
    # 2*8*8=128 rows; row_bytes=2*8*8*4=512 → chunk 16 rows at 8KiB budget).
    monkeypatch.setattr(axial, "_MAX_LOGIT_BYTES", 8 * 1024)
    chunked = axial.apply_axial_attention(params, x, dim_head=4)
    np.testing.assert_allclose(np.asarray(full), np.asarray(chunked), rtol=0, atol=1e-6)


def test_config_from_plans_rejects_anisotropic_kernels():
    """Uniform-kernel UNetConfig must not silently adopt stage-0 kernels from
    an anisotropic plan; per-stage topologies belong to the modular U-Net."""
    import pytest
    from braintpu.models.plans import config_from_plans

    plans = {
        "plans_per_stage": {
            0: {
                "patch_size": (128, 128, 128),
                "pool_op_kernel_sizes": [[1, 2, 2], [2, 2, 2]],
                "conv_kernel_sizes": [[1, 3, 3], [3, 3, 3], [3, 3, 3]],
                "current_spacing": (1.0, 1.0, 1.0),
                "batch_size": 2,
            }
        },
        "num_modalities": 4,
        "num_classes": 3,
        "base_num_features": 32,
        "all_classes": [1, 2, 3],
        "normalization_schemes": {},
        "use_mask_for_norm": {},
        "transpose_forward": [0, 1, 2],
        "transpose_backward": [0, 1, 2],
    }
    with pytest.raises(ValueError, match="anisotropic"):
        config_from_plans(plans)


def test_axial_unet_full_variant():
    """Axial_UNet family (ref generic_UNet.py:513-799): AxialAttention3D
    blocks (pos-emb -> summed axial attention -> BN -> LeakyReLU) after
    encoder stages and decoder up-convs, level-indexed skip list, heads and
    dim_heads scaled by 2^level."""
    import braintpu.models.unet3d as u3

    cfg = u3.UNetConfig(
        norm="batch", base_features=8, num_pool=2, patch_size=(16, 16, 16),
        axial_attention=True, axial_mode="full", attn_heads=2, attn_dim_head=4,
    )
    params = u3.init_params(cfg, jax.random.PRNGKey(0))
    # level 0 (finest) skipped by default: encoder stage 0 has no attention,
    # decoder u=1 (level 0) has none; stage 1 / u=0 (level 1) do.
    assert sorted(params["encoder_attn"].keys()) == ["1"]
    assert "attn_block" in params["decoder"][0]
    assert "attn_block" not in params["decoder"][1]
    # BN inside the attention block
    assert "bn" in params["encoder_attn"]["1"]
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 16, 16, 16, 4)).astype(np.float32)
    )
    y = u3.apply_unet(params, x, cfg)
    assert y.shape == (1, 16, 16, 16, 3)
    assert bool(jnp.all(jnp.isfinite(y)))


def test_axial_sum_vs_sequential_differ():
    """sum_axial_out=True (Axial_UNet) vs False (decoder variant) are
    different compositions of the same per-axis attentions."""
    from braintpu.models import axial

    key = jax.random.PRNGKey(3)
    params = axial.init_axial_params(key, channels=8, shape_dhw=(4, 4, 4), heads=2, dim_head=4)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(1, 4, 4, 4, 8)).astype(np.float32))
    seq = axial.apply_axial_attention(params, x, dim_head=4, sum_axial_out=False)
    summed = axial.apply_axial_attention(params, x, dim_head=4, sum_axial_out=True)
    assert seq.shape == summed.shape == x.shape
    assert float(jnp.max(jnp.abs(seq - summed))) > 1e-4


def test_fold_batchnorm_preserves_encoder_attn():
    """fold_batchnorm and _merge_bn_stats must carry the encoder_attn
    subtree of the full Axial_UNet through (review finding: both rebuilt the
    tree with only encoder/bottleneck/decoder keys, silently dropping it)."""
    import braintpu.models.unet3d as u3

    cfg = u3.UNetConfig(
        norm="batch", base_features=8, num_pool=2, patch_size=(16, 16, 16),
        axial_attention=True, axial_mode="full", attn_heads=2, attn_dim_head=4,
        compute_dtype=jnp.float32,
    )
    params = u3.init_params(cfg, jax.random.PRNGKey(0))
    folded = u3.fold_batchnorm(params, cfg)
    assert "encoder_attn" in folded
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 16, 16, 16, 4)).astype(np.float32)
    )
    y_ref = u3.apply_unet(params, x, cfg)
    y_fold = u3.apply_unet(folded, x, cfg, folded=True)
    np.testing.assert_allclose(
        np.asarray(y_fold), np.asarray(y_ref), atol=2e-4
    )

    # one training step keeps the tree structure intact
    from braintpu.train import TrainConfig, create_train_state, train_step

    tc = TrainConfig(base_lr=1e-3, max_steps=10)
    state = create_train_state(params, tc)
    batch = {
        "image": x,
        "labels": jnp.zeros((1, 16, 16, 16), jnp.int32),
    }
    state, _ = train_step(state, batch, cfg, tc)
    assert "encoder_attn" in state.params
    state, _ = train_step(state, batch, cfg, tc)  # second step must not crash


def test_dropout_is_channelwise_between_conv_and_norm():
    """Training dropout reproduces nn.Dropout3d semantics (ref
    generic_UNet.py:69-72): whole channels of the conv output masked
    BEFORE normalization, per conv, only in cfg.dropout_levels stages."""
    from braintpu.models.unet3d import UNetConfig, apply_unet, init_params

    cfg = UNetConfig(
        in_channels=2, num_classes=2, base_features=4, max_features=8,
        num_pool=1, conv_per_stage=2, norm="instance",
        dropout_levels=(0,), dropout_rate=0.5,
        patch_size=(8, 8, 8), compute_dtype=jnp.float32,
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 8, 8, 8, 2)),
                    jnp.float32)

    # inference path: dropout must be inert
    y_infer = apply_unet(params, x, cfg)
    np.testing.assert_array_equal(np.asarray(y_infer), np.asarray(apply_unet(params, x, cfg)))

    # train path: different rng keys → different masks → different outputs
    out_a, _ = apply_unet(params, x, cfg, train=True, rng=jax.random.PRNGKey(1))
    out_b, _ = apply_unet(params, x, cfg, train=True, rng=jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(out_a[0]), np.asarray(out_b[0]))

    # no dropout-enabled stages -> train output deterministic across keys
    cfg_nd = UNetConfig(
        in_channels=2, num_classes=2, base_features=4, max_features=8,
        num_pool=1, conv_per_stage=2, norm="instance",
        dropout_levels=(), dropout_rate=0.5,
        patch_size=(8, 8, 8), compute_dtype=jnp.float32,
    )
    na, _ = apply_unet(params, x, cfg_nd, train=True, rng=jax.random.PRNGKey(1))
    nb, _ = apply_unet(params, x, cfg_nd, train=True, rng=jax.random.PRNGKey(2))
    np.testing.assert_array_equal(np.asarray(na[0]), np.asarray(nb[0]))


def test_modular_unet_group_norm_groups_validated():
    """norm='group' widths must divide the group count at CONFIG time,
    not crash mid-forward in a reshape (regression)."""
    from braintpu.models.modular_unet import ModularUNetConfig

    with pytest.raises(ValueError, match="group_norm_groups"):
        ModularUNetConfig(norm="group", base_features=20, group_norm_groups=8)
    cfg = ModularUNetConfig(norm="group", base_features=20, group_norm_groups=5)
    assert cfg.block_cfg((3, 3, 3)).group_norm_groups == 5


def test_convert_state_dict_error_paths():
    """Wrong-topology checkpoints fail with a clear shape message; missing
    keys raise KeyError naming the torch key (not garbage params)."""
    from braintpu.ckpt.convert import convert_state_dict
    from braintpu.models.unet3d import UNetConfig

    cfg = UNetConfig(
        in_channels=2, num_classes=2, base_features=4, max_features=8,
        num_pool=1, conv_per_stage=1, norm="instance",
        patch_size=(8, 8, 8), compute_dtype=jnp.float32,
    )
    with pytest.raises(KeyError, match="conv_blocks_context"):
        convert_state_dict({}, cfg)

    # assemble a structurally-complete dict but with a wrong conv width
    def t(*shape):
        return np.zeros(shape, np.float32)

    sd = {}
    # encoder stage 0 (1 conv), WRONG in_channels: 3 instead of 2
    sd["conv_blocks_context.0.blocks.0.conv.weight"] = t(4, 3, 3, 3, 3)
    sd["conv_blocks_context.0.blocks.0.conv.bias"] = t(4)
    sd["conv_blocks_context.0.blocks.0.instnorm.weight"] = t(4)
    sd["conv_blocks_context.0.blocks.0.instnorm.bias"] = t(4)
    # bottleneck = Sequential(Stacked(0 -> still 1 block? conv_per_stage-1=0), Stacked(1))
    sd["conv_blocks_context.1.1.blocks.0.conv.weight"] = t(8, 4, 3, 3, 3)
    sd["conv_blocks_context.1.1.blocks.0.conv.bias"] = t(8)
    sd["conv_blocks_context.1.1.blocks.0.instnorm.weight"] = t(8)
    sd["conv_blocks_context.1.1.blocks.0.instnorm.bias"] = t(8)
    sd["tu.0.weight"] = t(8, 4, 2, 2, 2)
    sd["conv_blocks_localization.0.1.blocks.0.conv.weight"] = t(4, 8, 3, 3, 3)
    sd["conv_blocks_localization.0.1.blocks.0.conv.bias"] = t(4)
    sd["conv_blocks_localization.0.1.blocks.0.instnorm.weight"] = t(4)
    sd["conv_blocks_localization.0.1.blocks.0.instnorm.bias"] = t(4)
    sd["seg_outputs.0.weight"] = t(2, 4, 1, 1, 1)
    with pytest.raises(ValueError, match="does not match config"):
        convert_state_dict(sd, cfg)
