"""Fused pixel-shuffle upconv kernel (ops/upconv_pallas) — exact parity.

Integer-exact inputs (bf16-representable) so any mismatch vs the einsum +
phase-peel lowering (models/unet3d.py::_upconv) is an indexing bug, not
rounding.  Both in-VMEM interleave strategies are checked; interpret mode
on CPU (the TPU compile probe is a PERF.md checklist item).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import braintpu.models.unet3d as u3
from braintpu.ops.upconv_pallas import upconv2x, upconv2x_supported


def _int_vals(rng, shape, lo=-3, hi=4):
    return jnp.asarray(rng.integers(lo, hi, shape).astype(np.float32))


def _pow2(rng, shape):
    return jnp.asarray(
        (2.0 ** rng.integers(-3, 0, shape) * rng.choice([-1, 1], shape)).astype(
            np.float32
        )
    )


@pytest.mark.parametrize("strategy", ["lanes", "reshape", "select"])
@pytest.mark.parametrize(
    "N,D,H,W,ci,co",
    [
        (1, 3, 16, 16, 8, 8),
        (2, 2, 8, 24, 16, 8),   # irregular W, batched
        (1, 4, 40, 16, 32, 16),  # multi-band H
    ],
)
def test_upconv_kernel_exact(strategy, N, D, H, W, ci, co):
    rng = np.random.default_rng(5)
    assert upconv2x_supported((N, D, H, W, ci), co)
    x = _int_vals(rng, (N, D, H, W, ci)).astype(jnp.bfloat16)
    w = _pow2(rng, (ci, 2, 2, 2, co))
    ref = u3._upconv(x, w, jnp.float32)  # einsum + phase peel, f32-exact
    got = upconv2x(x, w, strategy=strategy, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(ref, np.float32)
    )


def test_plan_band_decision_space():
    """_plan_band picks the largest H-band that divides H and fits VMEM,
    shrinking under lane pressure and refusing impossible shapes."""
    from braintpu.ops.upconv_pallas import _VMEM_BUDGET, _plan_band

    # small planes: largest divisor band wins
    assert _plan_band(64, 16, 8, 8) == 64
    assert _plan_band(40, 16, 8, 8) == 8   # 40 = 8·5: only 8 divides
    assert _plan_band(48, 16, 8, 8) == 16  # 64 ∤ 48, 32 ∤ 48
    # H=12 has no admissible band (none of 64/32/16/8 divides)
    assert _plan_band(12, 16, 8, 8) is None
    # production decoder shapes stay plannable
    assert _plan_band(64, 64, 64, 32) is not None      # patch l1
    assert _plan_band(96, 80, 64, 32) is not None      # bucket l0
    # wide channels force smaller bands before giving up
    wide = _plan_band(64, 128, 128, 64)
    assert wide is not None and wide < 64
    # the planner honors the budget exactly: replaying its arithmetic for
    # the chosen band must fit, and the next band up must not
    from braintpu.ops.stage_pallas import _pad_lanes

    def cost(ch, W, ci, co):
        # pipelined in/out/weight blocks are double-buffered (leading 2s);
        # the dot intermediate is a single transient
        return (
            2 * ch * W * _pad_lanes(ci) * 2
            + ch * W * _pad_lanes(8 * co) * 4
            + 2 * (2 * 2 * ch * 2 * W * _pad_lanes(co) * 2)
            + 2 * ci * _pad_lanes(8 * co) * 2
        )

    assert cost(wide, 128, 128, 64) <= _VMEM_BUDGET
    assert cost(wide * 2, 128, 128, 64) > _VMEM_BUDGET


@pytest.mark.parametrize("strategy", ["lanes", "reshape", "select"])
def test_upconv_exact_production_band_shapes(strategy):
    """Exactness at (scaled-down) decoder geometry where H needs multiple
    bands AND W is irregular — the BlockSpec/grid interplay the production
    shapes exercise."""
    rng = np.random.default_rng(11)
    N, D, H, W, ci, co = 1, 3, 96, 20, 64, 32
    assert upconv2x_supported((N, D, H, W, ci), co)
    x = _int_vals(rng, (N, D, H, W, ci)).astype(jnp.bfloat16)
    w = _pow2(rng, (ci, 2, 2, 2, co))
    ref = u3._upconv(x, w, jnp.float32)
    got = upconv2x(x, w, strategy=strategy, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(ref, np.float32)
    )


def test_upconv_strategy_env(monkeypatch):
    from braintpu.ops.upconv_pallas import upconv_strategy

    monkeypatch.delenv("BRAINTPU_UPCONV_STRATEGY", raising=False)
    assert upconv_strategy() == "lanes"
    monkeypatch.setenv("BRAINTPU_UPCONV_STRATEGY", "select")
    assert upconv_strategy() == "select"
    monkeypatch.setenv("BRAINTPU_UPCONV_STRATEGY", "bogus")
    assert upconv_strategy() == "lanes"


def test_upconv_gating(monkeypatch):
    """The Pallas path engages only when opted in AND on TPU; the default
    _upconv lowering is unchanged otherwise.  The gate is exercised by
    faking _on_tpu()=True and recording whether the kernel is invoked —
    a pure shape check on CPU never reaches the gate at all."""
    rng = np.random.default_rng(6)
    x = _int_vals(rng, (1, 2, 8, 8, 8)).astype(jnp.bfloat16)
    w = _pow2(rng, (8, 2, 2, 2, 8))
    monkeypatch.delenv("BRAINTPU_PALLAS_UPCONV", raising=False)
    base = u3._upconv(x, w, jnp.bfloat16)
    assert base.shape == (1, 4, 16, 16, 8)
    # unsupported tiny shapes refuse the kernel
    assert not upconv2x_supported((1, 2, 4, 4, 8), 8)

    import braintpu.ops.upconv_pallas as up

    calls = []
    real_upconv2x = up.upconv2x

    def fake_upconv2x(xx, ww, strategy="reshape"):
        calls.append(strategy)
        return real_upconv2x(xx, ww, strategy=strategy, interpret=True)

    monkeypatch.setattr(u3, "_on_tpu", lambda: True)
    monkeypatch.setattr(up, "upconv2x", fake_upconv2x)

    # on "TPU" but NOT opted in: the kernel must stay dormant
    out_default = u3._upconv(x, w, jnp.bfloat16)
    assert calls == []
    np.testing.assert_array_equal(
        np.asarray(out_default, np.float32), np.asarray(base, np.float32)
    )

    # opted in on "TPU": the kernel engages (interpret-mode exactness)
    monkeypatch.setenv("BRAINTPU_PALLAS_UPCONV", "1")
    monkeypatch.setenv("BRAINTPU_UPCONV_STRATEGY", "select")
    out_kernel = u3._upconv(x, w, jnp.bfloat16)
    assert calls == ["select"]
    np.testing.assert_array_equal(
        np.asarray(out_kernel, np.float32), np.asarray(base, np.float32)
    )
