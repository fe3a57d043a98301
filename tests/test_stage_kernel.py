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


@pytest.mark.parametrize(
    "cfg,folded",
    [(u3.MODEL1_BN, True), (u3.MODEL2_GN_LARGE, False)],
    ids=["model1-bn-folded", "model2-gn-large"],
)
def test_fused_forward_production_topology(cfg, folded, monkeypatch):
    """Fused path at the REAL topologies (5 pools, base 32/64, channel
    widths to 320/640-lane decoder concats) on a 32^3 volume: every stage
    shape the flagship models emit goes through the tile planner and the
    deferred-norm dataflow, not just the toy 2-pool config above.

    Retires the risk that a channel-width edge case (e.g. the ci>64 tap
    accumulation or a (CH, RS) plan at bottleneck H=W=1) only surfaces on
    first TPU run. ~80 s interpret-mode on CPU for both params together.
    """
    params = u3.init_params(cfg, jax.random.PRNGKey(0))
    if folded:
        params = u3.fold_batchnorm(params, cfg)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 32, 4)).astype(np.float32))
    ref = u3.apply_unet(params, x, cfg, folded=folded)
    monkeypatch.setattr(u3, "_on_tpu", lambda: True)
    got = u3._apply_unet_fused(params, x, cfg, folded)
    scale = float(jnp.max(jnp.abs(ref)))
    d = float(jnp.max(jnp.abs(got - ref)))
    assert d <= 0.03 * scale, (d, scale)


def test_conv_stage_exact_batched_folded():
    """N > 1 without stats (the folded-BN sliding-window TTA batch case):
    per-sample grid walks must not bleed accumulator state across n."""
    rng = np.random.default_rng(11)
    N, D, H, W, ci, co = 2, 4, 16, 16, 8, 8
    x = _int_vals(rng, (N, D, H, W, ci)).astype(jnp.bfloat16)
    w = _pow2(rng, (3, 3, 3, ci, co))
    b = _int_vals(rng, (co,))
    got = conv_stage(x, w, b, out_slope=0.5, stats=False, interpret=True)
    cfgd = dict(
        in1_affine=False, in1_slope=None, in2_affine=False, in2_slope=None,
        out_slope=0.5,
    )
    ref, _, _ = _xla_reference(x, None, w, b, None, None, None, None, cfgd)
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(ref, np.float32)
    )
    # per-sample outputs must also match a per-sample kernel call exactly
    for n in range(N):
        one = conv_stage(x[n : n + 1], w, b, out_slope=0.5, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(got[n : n + 1], np.float32), np.asarray(one, np.float32)
        )


def test_fused_batched_gating(monkeypatch):
    """BRAINTPU_FUSED_BATCHED=1 admits batches to the fused path (still
    gated behind the primary opt-in) — folded BN and per-sample-stats
    GroupNorm alike."""
    monkeypatch.setenv("BRAINTPU_FUSED_STAGES", "1")
    bn = u3.UNetConfig(norm="batch")
    gn = u3.UNetConfig(norm="group")
    x8 = jnp.zeros((8, 16, 16, 16, 4))
    real = u3._on_tpu
    try:
        u3._on_tpu = lambda: True
        monkeypatch.delenv("BRAINTPU_FUSED_BATCHED", raising=False)
        assert not u3._fused_supported(bn, x8, False, False, True)
        assert not u3._fused_supported(gn, x8, False, False, False)
        monkeypatch.setenv("BRAINTPU_FUSED_BATCHED", "1")
        assert u3._fused_supported(bn, x8, False, False, True)
        assert u3._fused_supported(gn, x8, False, False, False)
    finally:
        u3._on_tpu = real


def test_conv_stage_per_sample_stats():
    """Batched stats: each sample's Σy/Σy² equals its own single-sample
    kernel call exactly (the running Σ must reset between samples)."""
    rng = np.random.default_rng(21)
    N, D, H, W, ci, co = 3, 4, 16, 16, 8, 8
    x = _int_vals(rng, (N, D, H, W, ci)).astype(jnp.bfloat16)
    w = _pow2(rng, (3, 3, 3, ci, co))
    b = _int_vals(rng, (co,))
    y, s1, s2 = conv_stage(x, w, b, out_slope=None, stats=True, interpret=True)
    assert s1.shape == (N, co) and s2.shape == (N, co)
    for n in range(N):
        y1, s1n, s2n = conv_stage(
            x[n : n + 1], w, b, out_slope=None, stats=True, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(s1[n]), np.asarray(s1n[0]))
        np.testing.assert_array_equal(np.asarray(s2[n]), np.asarray(s2n[0]))
        np.testing.assert_array_equal(
            np.asarray(y[n : n + 1], np.float32), np.asarray(y1, np.float32)
        )


def test_conv_stage_per_sample_affines():
    """(N, ci) input affines apply row-wise: batched call == per-sample
    calls with each sample's own affine."""
    rng = np.random.default_rng(22)
    N, D, H, W, ci, co = 2, 4, 16, 16, 8, 8
    x = _int_vals(rng, (N, D, H, W, ci)).astype(jnp.bfloat16)
    w = _pow2(rng, (3, 3, 3, ci, co))
    b = _int_vals(rng, (co,))
    a1 = _pow2(rng, (N, ci))
    c1 = _int_vals(rng, (N, ci))
    got = conv_stage(
        x, w, b, a1=a1, c1=c1, in1_affine=True, in1_slope=0.5,
        out_slope=0.5, interpret=True,
    )
    for n in range(N):
        one = conv_stage(
            x[n : n + 1], w, b, a1=a1[n], c1=c1[n], in1_affine=True,
            in1_slope=0.5, out_slope=0.5, interpret=True,
        )
        np.testing.assert_array_equal(
            np.asarray(got[n : n + 1], np.float32), np.asarray(one, np.float32)
        )


def test_fused_forward_batched_groupnorm(monkeypatch):
    """_apply_unet_fused on an N=2 GroupNorm batch (per-sample deferred
    norms end-to-end) tracks the plain eval path per sample."""
    cfg = u3.UNetConfig(
        norm="group", base_features=8, num_pool=2,
        patch_size=(16, 16, 16), group_norm_groups=4,
    )
    params = u3.init_params(cfg, jax.random.PRNGKey(4))
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 16, 4)).astype(np.float32))
    ref = u3.apply_unet(params, x, cfg)
    monkeypatch.setattr(u3, "_on_tpu", lambda: True)
    got = u3._apply_unet_fused(params, x, cfg, folded=False)
    scale = float(jnp.max(jnp.abs(ref)))
    d = float(jnp.max(jnp.abs(got - ref)))
    assert d <= 0.03 * scale, (d, scale)
    # per-sample independence: batch result == each sample alone
    for n in range(2):
        one = u3._apply_unet_fused(params, x[n : n + 1], cfg, folded=False)
        dn = float(jnp.max(jnp.abs(got[n : n + 1] - one)))
        assert dn <= 1e-5 * max(scale, 1.0), dn


def test_plan_stage_tiles_decision_space():
    """Fuzz the (CH, RS) planner across its decision space: every plan it
    returns must satisfy the divisibility + VMEM invariants the kernel
    assumes, and every production layer shape must be plannable."""
    from braintpu.ops.stage_pallas import (
        _VMEM_BUDGET,
        _pad_lanes,
        plan_stage_tiles,
    )

    def check_plan(H, W, ci, co):
        plan = plan_stage_tiles(H, W, ci, co)
        if plan is None:
            return None
        ch, rs = plan
        assert H % ch == 0 and ch % rs == 0, (H, W, ci, co, plan)
        assert ch in (64, 32, 16, 8) and rs in (16, 8, 4)
        chp = min(ch + 2, H)
        fixed = (
            2 * chp * W * _pad_lanes(ci) * 2
            + 2 * ch * W * _pad_lanes(co) * 2
            + 2 * ch * W * _pad_lanes(co) * 4
            + 9 * ci * _pad_lanes(3 * co) * 2
        )
        per_chunk = rs * W * _pad_lanes(9 * ci) * 2 + rs * W * _pad_lanes(3 * co) * 4
        assert fixed + per_chunk <= _VMEM_BUDGET, (H, W, ci, co, plan)
        return plan

    for H in (8, 16, 24, 32, 40, 48, 64, 96, 128, 160, 192):
        for W in (8, 16, 24, 40, 64, 128, 160, 192):
            for ci in (8, 16, 32, 64, 72, 96, 128, 256, 320, 512, 640):
                for co in (8, 16, 32, 64, 128, 256, 320):
                    check_plan(H, W, ci, co)

    # every full-res-capable production stage must get a plan: fullconv
    # bucket 192x192x160 and the 128^3 sliding patch, all layer widths of
    # MODEL1 (32-base) and MODEL2 (64-base, concat up to 640 lanes)
    production = [
        # fullconv bucket 192x192x160: levels 0-2 (levels 3-4 are 24x20 /
        # 12x10 — H indivisible, correctly unplanned -> XLA fallback)
        (192, 160, 32, 32), (192, 160, 64, 32), (192, 160, 64, 64),
        (192, 160, 128, 64), (96, 80, 64, 64), (96, 80, 128, 64),
        (96, 80, 128, 128), (96, 80, 256, 128), (48, 40, 128, 128),
        (48, 40, 256, 256), (48, 40, 512, 256),
        # sliding-window 128^3 patch: levels 0-2
        (128, 128, 32, 32), (128, 128, 64, 64), (128, 128, 128, 64),
        (64, 64, 128, 128), (64, 64, 256, 128), (32, 32, 256, 256),
        (32, 32, 512, 256),
    ]
    for H, W, ci, co in production:
        assert check_plan(H, W, ci, co) is not None, (H, W, ci, co)
    # deep narrow slabs stay unplannable -> conv_stage_supported gates them
    assert plan_stage_tiles(12, 10, 640, 320) is None


@pytest.mark.parametrize("D,H,W,ci,co", [(5, 24, 40, 16, 16), (4, 40, 24, 8, 24)])
def test_stats_match_flat_reduce_irregular_w(D, H, W, ci, co):
    """The kernel's running Σy/Σy² (accumulated band-by-band across the
    (CH, RS) tiling) must equal a whole-tensor flat reduce of the f32
    pre-activation output at non-lane-aligned W — the stats path never
    sees a contiguous volume, so tiling bugs show up here first."""
    rng = np.random.default_rng(7)
    x = _int_vals(rng, (1, D, H, W, ci)).astype(jnp.bfloat16)
    w = _pow2(rng, (3, 3, 3, ci, co))
    b = _int_vals(rng, (co,))
    _, s1, s2 = conv_stage(x, w, b, out_slope=None, stats=True, interpret=True)
    cfgd = dict(
        in1_affine=False, in1_slope=None, in2_affine=False, in2_slope=None,
        out_slope=None,
    )
    _, rs1, rs2 = _xla_reference(x, None, w, b, None, None, None, None, cfgd)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(rs1), rtol=1e-5)
    # y² products round in f32, so Σy² carries summation-order noise
    np.testing.assert_allclose(np.asarray(s2), np.asarray(rs2), rtol=2e-4)


def test_fused_fallback_boundary(monkeypatch):
    """_apply_unet_fused must route kernel-unsupported blocks through the
    XLA fallback mid-network and still match the reference path."""
    from braintpu.ops import stage_pallas

    cfg = u3.UNetConfig(
        norm="group", base_features=8, num_pool=2,
        patch_size=(16, 16, 16), group_norm_groups=4,
    )
    params = u3.init_params(cfg, jax.random.PRNGKey(2))
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 16, 4)).astype(np.float32))
    ref = u3.apply_unet(params, x, cfg)
    monkeypatch.setattr(u3, "_on_tpu", lambda: True)

    # the 4-channel input layer is already below the kernel's ci % 8 floor
    assert not stage_pallas.conv_stage_supported((1, 16, 16, 16, 4), 8)

    # additionally reject every co == 16 block → encoder stage 1 and the
    # matching decoder blocks take the fallback, surrounded by kernel blocks
    real_supported = stage_pallas.conv_stage_supported
    rejected = []

    def selective(shape, co, ci2=0):
        if co == 16:
            rejected.append(shape)
            return False
        return real_supported(shape, co, ci2=ci2)

    monkeypatch.setattr(stage_pallas, "conv_stage_supported", selective)
    got = u3._apply_unet_fused(params, x, cfg, folded=False)
    assert rejected, "the selective rejection never fired"
    scale = float(jnp.max(jnp.abs(ref)))
    d = float(jnp.max(jnp.abs(got - ref)))
    assert d <= 0.03 * scale, (d, scale)


def test_fused_supported_gating(monkeypatch):
    cfg = u3.UNetConfig(norm="group")
    x1 = jnp.zeros((1, 16, 16, 16, 4))
    x8 = jnp.zeros((8, 16, 16, 16, 4))
    # opt-in: without BRAINTPU_FUSED_STAGES=1 the fused path never engages
    # (ADVICE round 1: default off until the TPU compile probe passes)
    monkeypatch.delenv("BRAINTPU_FUSED_STAGES", raising=False)
    real = u3._on_tpu
    try:
        u3._on_tpu = lambda: True
        assert not u3._fused_supported(cfg, x1, False, False, False)
    finally:
        u3._on_tpu = real
    monkeypatch.setenv("BRAINTPU_FUSED_STAGES", "1")
    # CPU → never
    assert not u3._fused_supported(cfg, x1, False, False, False)
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
