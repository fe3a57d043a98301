"""Modular encoder/decoder U-Net tests (reference: generic_modular_UNet.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from braintpu.models.modular_unet import (
    ModularUNetConfig,
    apply_decoder,
    apply_encoder,
    apply_modular_unet,
    estimate_activation_bytes,
    init_modular_unet,
    stage_features,
)


def small_cfg(**kw):
    defaults = dict(
        in_channels=2,
        num_classes=3,
        base_features=4,
        max_features=16,
        pool_kernels=((1, 1, 1), (2, 2, 2), (2, 2, 2)),
        conv_kernels=((3, 3, 3),) * 3,
        blocks_per_stage_encoder=(1, 1, 1),
        compute_dtype=jnp.float32,
    )
    defaults.update(kw)
    return ModularUNetConfig(**defaults)


def test_feature_progression_caps_at_max():
    cfg = ModularUNetConfig(base_features=32, max_features=480)
    # 32, 64, 128, 256, 480, 480 — growth doubles then saturates
    assert stage_features(cfg) == [32, 64, 128, 256, 480, 480]


def test_encoder_returns_skips_bottleneck_last():
    cfg = small_cfg()
    params = init_modular_unet(cfg, jax.random.PRNGKey(0))
    x = jnp.zeros((1, 8, 8, 8, 2))
    skips = apply_encoder(params["encoder"], x, cfg)
    assert [tuple(s.shape) for s in skips] == [
        (1, 8, 8, 8, 4),
        (1, 4, 4, 4, 8),
        (1, 2, 2, 2, 16),
    ]


def test_forward_and_deep_supervision_shapes():
    cfg = small_cfg()
    params = init_modular_unet(cfg, jax.random.PRNGKey(1))
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 8, 2))
    y = apply_modular_unet(params, x, cfg)
    assert y.shape == (2, 8, 8, 8, 3)
    heads = apply_modular_unet(params, x, cfg, deep_supervision=True)
    # full-resolution head first, then decreasing resolution
    assert [tuple(h.shape) for h in heads] == [
        (2, 8, 8, 8, 3),
        (2, 4, 4, 4, 3),
    ]
    np.testing.assert_allclose(np.asarray(heads[0]), np.asarray(y), atol=1e-5)


def test_anisotropic_pooling():
    cfg = small_cfg(pool_kernels=((1, 1, 1), (1, 2, 2), (2, 2, 2)))
    params = init_modular_unet(cfg, jax.random.PRNGKey(3))
    x = jnp.zeros((1, 4, 8, 8, 2))
    skips = apply_encoder(params["encoder"], x, cfg)
    assert tuple(skips[1].shape) == (1, 4, 4, 4, 8)  # depth untouched by (1,2,2)
    y = apply_modular_unet(params, x, cfg)
    assert y.shape == (1, 4, 8, 8, 3)


def test_decoder_mirrors_encoder_blocks_by_default():
    cfg = small_cfg(blocks_per_stage_encoder=(2, 1, 2))
    # reference default: encoder blocks without the bottleneck, reversed
    assert cfg.decoder_blocks() == (1, 2)


def test_gradients_flow():
    cfg = small_cfg()
    params = init_modular_unet(cfg, jax.random.PRNGKey(4))
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 8, 8, 8, 2))

    def loss(p):
        return jnp.mean(apply_modular_unet(p, x, cfg) ** 2)

    grads = jax.grad(loss)(params)
    norms = [float(jnp.abs(g).max()) for g in jax.tree_util.tree_leaves(grads)]
    assert all(np.isfinite(n) for n in norms)
    assert any(n > 0 for n in norms)


def test_memory_estimator_monotonic():
    cfg = small_cfg()
    small = estimate_activation_bytes(cfg, (8, 8, 8), batch=1)
    big = estimate_activation_bytes(cfg, (16, 16, 16), batch=1)
    assert 0 < small < big
    assert estimate_activation_bytes(cfg, (8, 8, 8), batch=4) == 4 * small


def test_reference_3d_config_buildable():
    from braintpu.models.modular_unet import REFERENCE_3D

    assert REFERENCE_3D.num_stages == 6
    assert stage_features(REFERENCE_3D)[-1] == 512
