"""Fused stage-conv kernel (ops/stage_pallas) and deferred-norm forward path.

Exact-arithmetic tests: inputs are small integers and weights powers of two,
so bf16 compute is exact and any nonzero difference vs the XLA reference is
a real indexing/combine bug (not rounding).  The kernel runs in interpret
mode on CPU; the TPU compile path is exercised by the fullconv benchmarks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import braintpu.models.unet3d as u3
from braintpu.ops.stage_pallas import conv_stage, _xla_reference, conv_stage_supported


def _int_vals(rng, shape, lo=-3, hi=4):
    return jnp.asarray(rng.integers(lo, hi, shape).astype(np.float32))


def _pow2(rng, shape):
    return jnp.asarray(
        (2.0 ** rng.integers(-3, 0, shape) * rng.choice([-1, 1], shape)).astype(
            np.float32
        )
    )


@pytest.mark.parametrize(
    "D,H,W,ci1,ci2,co,stats,out_slope,affine",
    [
        (5, 16, 16, 8, 0, 8, False, 0.5, False),
        (6, 16, 16, 8, 8, 8, True, None, True),
        (4, 24, 16, 16, 0, 8, True, None, True),
        (7, 40, 24, 8, 8, 16, True, None, True),
        # ci > 64 exercises the per-tap dot accumulation branch (the 9-way
        # lane concat is only 128-aligned for power-of-two ci)
        (4, 16, 16, 72, 0, 8, True, None, True),
        (4, 16, 16, 64, 64, 8, False, 0.5, False),
    ],
)
def test_conv_stage_exact(D, H, W, ci1, ci2, co, stats, out_slope, affine):
    rng = np.random.default_rng(0)
    ci = ci1 + ci2
    assert conv_stage_supported((1, D, H, W, ci), co)
    x = _int_vals(rng, (1, D, H, W, ci1)).astype(jnp.bfloat16)
    x2 = _int_vals(rng, (1, D, H, W, ci2)).astype(jnp.bfloat16) if ci2 else None
    w = _pow2(rng, (3, 3, 3, ci, co))
    b = _int_vals(rng, (co,))
    a1, c1 = _pow2(rng, (ci1,)), _int_vals(rng, (ci1,))
    a2, c2 = _pow2(rng, (max(ci2, 1),)), _int_vals(rng, (max(ci2, 1),))
    slope = 0.5 if affine else None
    kw = dict(
        in1_affine=affine, in1_slope=slope,
        in2_affine=affine and ci2 > 0, in2_slope=slope if ci2 else None,
        out_slope=out_slope, stats=stats,
    )
    got = conv_stage(
        x, w, b, x2=x2, a1=a1, c1=c1,
        a2=a2 if ci2 else None, c2=c2 if ci2 else None,
        interpret=True, **kw,
    )
    cfgd = dict(
        in1_affine=kw["in1_affine"], in1_slope=kw["in1_slope"],
        in2_affine=kw["in2_affine"], in2_slope=kw["in2_slope"],
        out_slope=out_slope,
    )
    ref, rs1, rs2 = _xla_reference(x, x2, w, b, a1, c1, a2, c2, cfgd)
    if stats:
        got, s1, s2 = got
        # f32 sums of exact values: only summation-order noise remains
        np.testing.assert_allclose(np.asarray(s1), np.asarray(rs1), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(s2), np.asarray(rs2), rtol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(ref, np.float32)
    )


@pytest.mark.parametrize("norm,folded", [("group", False), ("instance", False), ("batch", True)])
def test_fused_forward_matches_reference_path(norm, folded, monkeypatch):
    """_apply_unet_fused (deferred norms + stage kernel) tracks the plain
    eval path to bf16 tolerance on a small U-Net."""
    cfg = u3.UNetConfig(
        norm=norm, base_features=8, num_pool=2,
        patch_size=(16, 16, 16), group_norm_groups=4,
    )
    params = u3.init_params(cfg, jax.random.PRNGKey(0))
    if folded:
        params = u3.fold_batchnorm(params, cfg)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 16, 4)).astype(np.float32))
    ref = u3.apply_unet(params, x, cfg, folded=folded)
    monkeypatch.setattr(u3, "_on_tpu", lambda: True)
    got = u3._apply_unet_fused(params, x, cfg, folded)
    scale = float(jnp.max(jnp.abs(ref)))
    d = float(jnp.max(jnp.abs(got - ref)))
    assert d <= 0.03 * scale, (d, scale)


def test_fused_supported_gating():
    cfg = u3.UNetConfig(norm="group")
    x1 = jnp.zeros((1, 16, 16, 16, 4))
    x8 = jnp.zeros((8, 16, 16, 16, 4))
    # CPU → never
    assert not u3._fused_supported(cfg, x1, False, False, False)
    real = u3._on_tpu
    try:
        u3._on_tpu = lambda: True
        assert u3._fused_supported(cfg, x1, False, False, False)
        # GroupNorm stats are per-sample → batched inputs stay on the old path
        assert not u3._fused_supported(cfg, x8, False, False, False)
        assert not u3._fused_supported(cfg, x1, True, False, False)  # train
        bn = u3.UNetConfig(norm="batch")
        assert u3._fused_supported(bn, x1, False, False, True)  # folded, N==1
        # batched forwards (sliding-window TTA) stay on the XLA path until
        # the kernel is benchmarked at patch scale
        assert not u3._fused_supported(bn, x8, False, False, True)
        assert not u3._fused_supported(bn, x8, False, False, False)
    finally:
        u3._on_tpu = real
