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


@pytest.mark.parametrize("strategy", ["reshape", "select"])
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


def test_upconv_gating(monkeypatch):
    """The Pallas path engages only when opted in AND on TPU; the default
    _upconv lowering is unchanged otherwise."""
    rng = np.random.default_rng(6)
    x = _int_vals(rng, (1, 2, 8, 8, 8)).astype(jnp.bfloat16)
    w = _pow2(rng, (8, 2, 2, 2, 8))
    monkeypatch.delenv("BRAINTPU_PALLAS_UPCONV", raising=False)
    base = u3._upconv(x, w, jnp.bfloat16)
    assert base.shape == (1, 4, 16, 16, 8)
    # unsupported tiny shapes refuse the kernel
    assert not upconv2x_supported((1, 2, 4, 4, 8), 8)
