"""Conv lowering parity tests: pallas kernel (interpret mode) and merged2d.

The three TPU lowerings of the stride-1 3x3x3 conv must agree with the
native XLA Conv3D reference to accumulation precision
(ref semantics: generic_UNet.py:56-72 conv blocks; SURVEY.md §2.3).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from braintpu.models.unet3d import (
    _choose_impl,
    _conv3d_decomp2d,
    _conv3d_merged2d,
    _conv3d_xla,
)
from braintpu.ops.conv3d_pallas import (
    conv3d_tap_merged,
    pallas_conv_supported,
    plan_tiles,
)


def _rand(key, shape, scale=1.0):
    return jax.random.normal(key, shape, jnp.float32) * scale


@pytest.mark.parametrize(
    "N,D,H,W,ci,co",
    [(1, 5, 8, 128, 8, 8), (2, 6, 16, 128, 8, 16), (1, 3, 8, 128, 16, 8)],
)
def test_pallas_kernel_matches_xla(N, D, H, W, ci, co):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    x = _rand(k1, (N, D, H, W, ci))
    w = _rand(k2, (3, 3, 3, ci, co), 0.1)
    b = _rand(k3, (co,), 0.1)
    ref = _conv3d_xla(x, w, b, (1, 1, 1), jnp.float32)
    got = conv3d_tap_merged(x, w, b, interpret=True).astype(jnp.float32)
    # kernel computes in bf16 -> tolerance is bf16 resolution of the output
    tol = 0.02 * float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=tol)


def test_pallas_kernel_fused_leaky_relu():
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    x = _rand(k1, (1, 4, 8, 128, 8))
    w = _rand(k2, (3, 3, 3, 8, 8), 0.1)
    b = jnp.zeros((8,), jnp.float32)
    plain = conv3d_tap_merged(x, w, b, interpret=True).astype(jnp.float32)
    fused = conv3d_tap_merged(x, w, b, negative_slope=0.01, interpret=True).astype(
        jnp.float32
    )
    expect = jnp.where(plain >= 0, plain, plain * 0.01)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(expect), atol=1e-2)


@pytest.mark.parametrize("ci,co", [(8, 8), (16, 8), (8, 16)])
def test_merged2d_matches_xla(ci, co):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(2), 3)
    x = _rand(k1, (2, 6, 8, 8, ci))
    w = _rand(k2, (3, 3, 3, ci, co), 0.1)
    b = _rand(k3, (co,), 0.1)
    ref = _conv3d_xla(x, w, b, (1, 1, 1), jnp.float32)
    got = _conv3d_merged2d(x, w, b, (1, 1, 1), jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_decomp2d_matches_xla_strided():
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    x = _rand(k1, (1, 8, 8, 8, 4))
    w = _rand(k2, (3, 3, 3, 4, 8), 0.1)
    b = jnp.zeros((8,), jnp.float32)
    for stride in [(1, 1, 1), (2, 2, 2)]:
        ref = _conv3d_xla(x, w, b, stride, jnp.float32)
        got = _conv3d_decomp2d(x, w, b, stride, jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_eligibility_and_planning():
    assert pallas_conv_supported((1, 8, 64, 128, 32), (3, 3, 3), (1, 1, 1))
    assert not pallas_conv_supported((1, 8, 64, 128, 32), (3, 3, 3), (2, 2, 2))
    assert not pallas_conv_supported((1, 2, 64, 128, 32), (3, 3, 3), (1, 1, 1))
    assert pallas_conv_supported((1, 8, 64, 100, 32), (3, 3, 3), (1, 1, 1))
    assert not pallas_conv_supported((1, 8, 64, 4, 32), (3, 3, 3), (1, 1, 1))
    assert plan_tiles(64, 64, 64, 64) is not None
    # full-res co=64 accumulators exceed VMEM -> planner refuses
    assert plan_tiles(128, 128, 64, 64) is None


def test_choose_impl_on_cpu_is_decomp():
    # dispatch never selects TPU-only paths on the CPU backend
    assert _choose_impl((8, 128, 128, 128, 32), (3, 3, 3), (1, 1, 1), 32) == "decomp2d"


def test_merged2d_kd5_matches_xla():
    """Depth-shift algebra must hold for any odd kd, not just 3."""
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(7), 3)
    x = _rand(k1, (1, 8, 8, 8, 8))
    w = _rand(k2, (5, 3, 3, 8, 8), 0.1)
    b = _rand(k3, (8,), 0.1)
    ref = _conv3d_xla(x, w, b, (1, 1, 1), jnp.float32)
    got = _conv3d_merged2d(x, w, b, (1, 1, 1), jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_pallas_conv_grad_matches_xla():
    """custom_vjp backward (XLA reference) vs direct XLA grads."""
    from braintpu.ops.conv3d_pallas import _xla_reference

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(8), 3)
    x = _rand(k1, (1, 4, 8, 128, 8))
    w = _rand(k2, (3, 3, 3, 8, 8), 0.1)
    b = _rand(k3, (8,), 0.1)

    # Linear loss + no fused activation: the cotangent is independent of the
    # (bf16) forward values, so the custom backward must match the reference
    # VJP exactly up to f32 rounding.
    cot = _rand(jax.random.PRNGKey(10), (1, 4, 8, 128, 8))

    def loss_pallas(x, w, b):
        return jnp.sum(conv3d_tap_merged(x, w, b, None, True).astype(jnp.float32) * cot)

    def loss_ref(x, w, b):
        return jnp.sum(_xla_reference(x, w, b, None).astype(jnp.float32) * cot)

    gx, gw, gb = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, w, b)
    rx, rw, rb = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw), atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(rb), atol=1e-3, rtol=1e-3)


def test_explicit_pallas_impl_falls_back_safely():
    """conv_impl='pallas' with stride-2 / f32 / non-3^3 kernels must compute
    the CORRECT conv via fallback (stride was previously discarded)."""
    from braintpu.models.unet3d import _conv3d_pallas

    k1, k2 = jax.random.split(jax.random.PRNGKey(9))
    x = _rand(k1, (1, 8, 8, 8, 4))
    w = _rand(k2, (3, 3, 3, 4, 8), 0.1)
    b = jnp.zeros((8,), jnp.float32)
    for stride in [(2, 2, 2), (1, 1, 1)]:
        ref = _conv3d_xla(x, w, b, stride, jnp.float32)
        got = _conv3d_pallas(x, w, b, stride, jnp.float32)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


@pytest.mark.parametrize(
    "N,D,H,W,ci,co",
    [(1, 8, 12, 10, 8, 16), (2, 16, 16, 16, 4, 8), (1, 6, 10, 8, 16, 8)],
)
def test_merged2d_stride2_matches_xla(N, D, H, W, ci, co):
    """Strided pooling-conv lowering (tap-merged stride-2 conv2d +
    depth-parity shift-add) is exact vs native XLA Conv3D."""
    from braintpu.models.unet3d import _conv3d_merged2d_s2

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(7), 3)
    x = _rand(k1, (N, D, H, W, ci))
    w = _rand(k2, (3, 3, 3, ci, co), 0.1)
    b = _rand(k3, (co,), 0.1)
    ref = _conv3d_xla(x, w, b, (2, 2, 2), jnp.float32)
    got = _conv3d_merged2d_s2(x, w, b, (2, 2, 2), jnp.float32)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_merged2d_dispatch_handles_stride2():
    """conv_impl='merged2d' with a stride the s2 path can't take (odd depth)
    falls back to decomp2d rather than asserting."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(8))
    x = _rand(k1, (1, 7, 8, 8, 8))  # odd D
    w = _rand(k2, (3, 3, 3, 8, 8), 0.1)
    b = jnp.zeros((8,), jnp.float32)
    ref = _conv3d_xla(x, w, b, (2, 2, 2), jnp.float32)
    got = _conv3d_merged2d(x, w, b, (2, 2, 2), jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_spatial_group_stats_matches_direct():
    """Flat-reduce group/instance statistics equal the direct grouped
    mean/var to f32 precision (E[x^2]-E[x]^2 is safe at activation scale)."""
    from braintpu.models.unet3d import _spatial_group_stats

    x = _rand(jax.random.PRNGKey(9), (2, 6, 8, 10, 16), 1.5) + 0.3
    for g in (4, 16):
        mean, var = _spatial_group_stats(x, g)
        xg = np.asarray(x).reshape(2, 6 * 8 * 10, g, 16 // g)
        ref_mean = xg.transpose(0, 2, 1, 3).reshape(2, g, -1).mean(axis=2)
        ref_var = xg.transpose(0, 2, 1, 3).reshape(2, g, -1).var(axis=2)
        np.testing.assert_allclose(np.asarray(mean), ref_mean, atol=1e-5)
        np.testing.assert_allclose(np.asarray(var), ref_var, atol=1e-4)


def test_upconv_phase_peel_matches_pixel_shuffle():
    """The per-axis phase-peel upconv equals einsum + rank-8 shuffle."""
    from braintpu.models.unet3d import _upconv

    k1, k2 = jax.random.split(jax.random.PRNGKey(10))
    x = _rand(k1, (2, 4, 6, 5, 8))
    w = _rand(k2, (8, 2, 2, 2, 16), 0.1)
    got = _upconv(x, w, jnp.float32)
    wm = np.asarray(w).reshape(8, 16 * 8)
    y = np.einsum("ndhwc,ck->ndhwk", np.asarray(x), wm).reshape(2, 4, 6, 5, 2, 2, 2, 16)
    ref = y.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(2, 8, 12, 10, 16)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4)
