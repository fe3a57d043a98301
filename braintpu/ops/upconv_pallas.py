"""Pallas TPU kernel: fused 2×2×2 stride-2 transposed conv (pixel shuffle).

The decoder up-convolutions (ref generic_UNet.py:710-712: ConvTranspose3d,
kernel = stride = 2, no bias) are non-overlapping, so each output voxel is
exactly one tap: ``out[2d+kd, 2h+kh, 2w+kw] = x[d,h,w] · w[:,kd,kh,kw,:]``.
The XLA lowering (models/unet3d.py::_upconv) runs one einsum producing all
8 phases on lanes, then three rank-6 interleave reshapes — measured at
~54 ms (BN) / ~93 ms (GN) per 5-fold forward, pure layout traffic.

This kernel fuses the phase einsum with the interleaved write: one H-band
of the input is read, one (2·CH, 2W) band of each output depth pair is
written, and the interleave happens on VMEM-resident tiles — the three
whole-tensor shuffle passes never touch HBM.

Three in-VMEM interleave strategies are provided (``strategy=``), because
their Mosaic legality differs and must be probed on hardware
(jax 0.9.0 notes: no lane→sublane reshapes; dual-axis strided stores can
hang the compiler — all strategies below avoid strided stores entirely):

* ``"lanes"`` (default) — **no interleave ops at all**: the phase GEMM
  already produces ``(kw, co)`` adjacent on lanes, so each ``(kd, kh)``
  phase pair is written as one contiguous ``2co``-lane range slice into a
  rank-6 output block ``(1, 2, CH, 2, W, 2co)`` whose dims are
  ``(kd, h, kh, w, kw·co)``; the final
  ``(N, 2D, H, 2, W, 2co) → (N, 2D, 2H, 2W, co)`` reshape outside the
  kernel is a free row-major bitcast
  (``(((2h+kh)·2W)+(2w+kw))·co + c`` is exactly the flat index of both
  views).  This is the only strategy Mosaic accepts at the production
  co=32 shapes: the other two both lower a
  ``(CH, W, co) → (CH, W, 1, co)`` unit-dim insert that Mosaic rejects
  for sub-128-lane minors ("unsupported shape cast",
  round-3 probes in tools/tpu_probe_results.jsonl).
* ``"reshape"`` — stack the two W-phases on a fresh minor-adjacent axis
  and merge ``(W, 2) → 2W``.
* ``"select"`` — ``repeat`` each phase ×2 along W and pick by parity of a
  ``broadcasted_iota``.

Integration is opt-in (``BRAINTPU_PALLAS_UPCONV=1``) pending the e2e
benchmark (PERF.md).
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["upconv2x", "upconv2x_supported"]

from .stage_pallas import _pad_lanes  # one lane-padding rule across kernels

#: this kernel's own working-set bound (smaller than stage_pallas's: no
#: halo double-buffering, but a wide 8co f32 dot output)
_VMEM_BUDGET = 10 * 1024 * 1024


def _plan_band(H: int, W: int, ci: int, co: int):
    for ch in (64, 32, 16, 8):
        if ch > H or H % ch:
            continue
        # in/out/weight blocks are Pallas-pipelined => Mosaic allocates TWO
        # buffers of each (grid-step double-buffering); the leading 2 on
        # outb's block is its kd dim, not the double-buffer
        inb = 2 * ch * W * _pad_lanes(ci) * 2
        dot = ch * W * _pad_lanes(8 * co) * 4
        outb = 2 * (2 * 2 * ch * 2 * W * _pad_lanes(co) * 2)
        wm = 2 * ci * _pad_lanes(8 * co) * 2
        if inb + dot + outb + wm <= _VMEM_BUDGET:
            return ch
    return None


def upconv2x_supported(shape: Tuple[int, ...], co: int) -> bool:
    N, D, H, W, ci = shape
    if H < 8 or W < 8:
        return False
    return _plan_band(H, W, ci, co) is not None


def _interleave_w(p0: jnp.ndarray, p1: jnp.ndarray, strategy: str) -> jnp.ndarray:
    """(CH, W, co) × 2 → (CH, 2W, co) with p0 on even, p1 on odd columns."""
    CH, W, co = p0.shape
    if strategy == "reshape":
        return jnp.concatenate(
            [p0[:, :, None, :], p1[:, :, None, :]], axis=2
        ).reshape(CH, 2 * W, co)
    rep0 = jnp.repeat(p0, 2, axis=1)
    rep1 = jnp.repeat(p1, 2, axis=1)
    wi = jax.lax.broadcasted_iota(jnp.int32, (CH, 2 * W, co), 1)
    return jnp.where(wi % 2 == 0, rep0, rep1)


def _kernel(x_ref, wm_ref, out_ref, *, co: int, strategy: str):
    # x_ref: (1, 1, CH, W, ci); wm_ref: (ci, 8co) [kd,kh,kw,co lanes-major];
    # out_ref: (1, 2, 2CH, 2W, co)
    CH, W, ci = x_ref.shape[2], x_ref.shape[3], x_ref.shape[4]
    a = x_ref[0, 0].reshape(CH * W, ci)
    g = jnp.dot(a, wm_ref[:], preferred_element_type=jnp.float32)
    g = g.reshape(CH, W, 8 * co).astype(out_ref.dtype)

    for kd in range(2):
        rows = []  # per kh: (CH, 2W, co)
        for kh in range(2):
            base = (kd * 4 + kh * 2) * co
            p0 = g[:, :, base : base + co]
            p1 = g[:, :, base + co : base + 2 * co]
            rows.append(_interleave_w(p0, p1, strategy))
        # H interleave: (CH, 2, 2W, co) → (2CH, 2W, co) — major-axis merge
        band = jnp.concatenate(
            [rows[0][:, None], rows[1][:, None]], axis=1
        ).reshape(2 * CH, 2 * W, co)
        out_ref[0, kd] = band


def _kernel_lanes(x_ref, wm_ref, out_ref, *, co: int):
    # x_ref: (1, 1, CH, W, ci); wm_ref: (ci, 8co) [kd,kh,kw,co lanes-major];
    # out_ref: (1, 2, CH, 2, W, 2co) with dims (n, kd, h, kh, w, kw·co) —
    # every store is a full-(W, 2co) contiguous tile at a static (kd, kh).
    CH, W, ci = x_ref.shape[2], x_ref.shape[3], x_ref.shape[4]
    a = x_ref[0, 0].reshape(CH * W, ci)
    g = jnp.dot(a, wm_ref[:], preferred_element_type=jnp.float32)
    g = g.reshape(CH, W, 8 * co).astype(out_ref.dtype)
    for kd in range(2):
        for kh in range(2):
            base = (kd * 4 + kh * 2) * co
            out_ref[0, kd, :, kh] = g[:, :, base : base + 2 * co]


@functools.partial(jax.jit, static_argnames=("strategy", "interpret"))
def upconv2x(
    x: jnp.ndarray,
    w: jnp.ndarray,
    strategy: str = "lanes",
    interpret: bool = False,
) -> jnp.ndarray:
    """(N, D, H, W, ci) × (ci, 2, 2, 2, co) → (N, 2D, 2H, 2W, co) bf16."""
    N, D, H, W, ci = x.shape
    co = w.shape[4]
    CH = _plan_band(H, W, ci, co)
    assert CH is not None, "use upconv2x_supported before calling"
    # lane order must match the kernel's phase slicing: kd major, kh, kw, co
    wm = w.reshape(ci, 8 * co)

    in_specs = [
        pl.BlockSpec(
            (1, 1, CH, W, ci),
            lambda n, d, hb: (n, d, hb, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (ci, 8 * co), lambda n, d, hb: (0, 0), memory_space=pltpu.VMEM
        ),
    ]
    params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "parallel"),
        # headroom above the planner's working-set estimate (interleave
        # transients); without this Mosaic falls back to its default
        # limit and may refuse bands the planner approved
        vmem_limit_bytes=64 * 1024 * 1024,
    )
    if strategy == "lanes":
        out6 = pl.pallas_call(
            functools.partial(_kernel_lanes, co=co),
            grid=(N, D, H // CH),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, 2, CH, 2, W, 2 * co),
                lambda n, d, hb: (n, d, hb, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (N, 2 * D, H, 2, W, 2 * co), jnp.bfloat16
            ),
            compiler_params=params,
            interpret=interpret,
        )(x.astype(jnp.bfloat16), wm.astype(jnp.bfloat16))
        # free bitcast: (n, 2d, h, kh, w, kw·co) is row-major-identical
        # to (n, 2d, 2h, 2w, co)
        return out6.reshape(N, 2 * D, 2 * H, 2 * W, co)

    out = pl.pallas_call(
        functools.partial(_kernel, co=co, strategy=strategy),
        grid=(N, D, H // CH),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 2, 2 * CH, 2 * W, co),
            lambda n, d, hb: (n, d, hb, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((N, 2 * D, 2 * H, 2 * W, co), jnp.bfloat16),
        compiler_params=params,
        interpret=interpret,
    )(x.astype(jnp.bfloat16), wm.astype(jnp.bfloat16))
    return out


def pallas_upconv_enabled() -> bool:
    return os.environ.get("BRAINTPU_PALLAS_UPCONV", "0") == "1"


def upconv_strategy() -> str:
    """Interleave strategy for the integrated path.

    ``BRAINTPU_UPCONV_STRATEGY`` ∈ {lanes, reshape, select} — all exact
    (tests/test_upconv_kernel.py); ``lanes`` is the only one Mosaic
    compiles at the production co=32 shapes (module docstring), so it is
    the default; the probe/capture tooling can still pin another.
    """
    s = os.environ.get("BRAINTPU_UPCONV_STRATEGY", "lanes")
    return s if s in ("lanes", "reshape", "select") else "lanes"
