"""Pallas TPU kernel: fused stride-1 3x3x3 convolution (tap-merged).

The U-Net's hot layers (SURVEY.md §3.2; reference forward at
/root/reference/model_architecture/generic_UNet.py:423-446) run 3x3x3
convolutions with 32-64 output channels at 128^3 resolution.  On the MXU the
GEMM lane dimension is the output-channel count, so ``co=32`` caps
utilization at 32/128 lanes — measured 27 TF/s on v5e where the same
arithmetic at 96 lanes runs at 61+ TF/s.

This kernel restores lane occupancy by merging the three DEPTH taps of the
kernel into the GEMM N dimension:

    G[s] = sum_{ky,kx} shift(x[s], ky, kx) @ W[ky, kx]      # [M, 3*co]

i.e. one input depth slice produces the partial products for all three
output slices it feeds (``out[s+1], out[s], out[s-1]``).  A rolling bank of
three f32 accumulators in VMEM combines them as the grid walks the depth
axis (TPU grids execute sequentially, so scratch carries across steps) —
each input slice is read from HBM exactly once and each output slice is
written exactly once, with bias + LeakyReLU fused into the output cast.

Grid is ``(N, D+2)`` with one full (H, W) depth slice per step, streamed by
the standard Pallas pipeline (automatic double-buffering); the in-plane 3x3
taps are zero-padded shifts of the resident slice, materialized in chunks of
rows to bound VMEM.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["conv3d_tap_merged", "pallas_conv_supported", "plan_tiles"]

_VMEM_BUDGET = 13 * 1024 * 1024  # leave headroom under ~16 MB/core


def _pad_lanes(c: int) -> int:
    return -(-c // 128) * 128


def plan_tiles(H: int, W: int, ci: int, co: int) -> Optional[int]:
    """Row-chunk size for the merged-partials buffer, or None if it can't fit.

    Working set: double-buffered input slice + f32 rolling accumulators (two
    slots) for the full slice + double-buffered output slice + the per-chunk
    transients (shifted taps and the (CH*W, 3co) f32 partials).

    Channel counts are padded to 128 lanes (Mosaic's minor-dim tiling) —
    counting the nominal ci/co understates the real working set ~2× at the
    exact shapes _choose_impl routes here (ci=co=64), approving bands past
    the budget this gate exists to protect (same rule as
    stage_pallas.plan_stage_tiles).
    """
    cip, cop = _pad_lanes(ci), _pad_lanes(co)
    fixed = 2 * H * W * cip * 2 + 2 * H * W * cop * 4 + 2 * H * W * cop * 2
    for ch in (128, 64, 32, 16, 8):
        if ch > H or H % ch:
            continue
        g = ch * W * _pad_lanes(3 * co) * 4  # f32 partials chunk
        taps = 3 * ch * W * cip * 2  # shifted-read transients (heuristic)
        if fixed + 2 * g + taps <= _VMEM_BUDGET:
            return ch
    return None


def pallas_conv_supported(
    shape: Tuple[int, ...], kernel: Tuple[int, int, int], stride: Tuple[int, int, int]
) -> bool:
    """Eligibility: stride-1 3x3x3 SAME conv whose working set fits VMEM."""
    if kernel != (3, 3, 3) or stride != (1, 1, 1):
        return False
    N, D, H, W, ci = shape[:4] + (shape[4],)
    if D < 3 or H < 8 or W < 8 or ci % 8:
        return False
    return True


from .stage_pallas import _shift_w  # one W-tap shift rule across kernels


def _kernel(
    x_ref,  # block (1, 1, H, W, ci) bf16
    wm_ref,  # (9, ci, 3co) bf16
    b_ref,  # (1, co) f32
    out_ref,  # block (1, 1, H, W, co) bf16
    acc,  # VMEM scratch (2, H*W, co) f32
    *,
    D: int,
    CH: int,
    negative_slope: Optional[float],
):
    d = pl.program_id(1)
    H, W, ci = x_ref.shape[2:]
    co = b_ref.shape[1]
    valid = jnp.logical_and(d >= 1, d <= D)  # source slice d-1 exists

    # Two accumulator slots suffice for the 3-deep rolling window: the slot
    # of the slice completed this step (m=d-2) is consumed and immediately
    # re-initialized for slice m=d (same parity); m=d-1 is the other slot.
    s_cur = jax.lax.rem(d, 2)
    s_mid = jax.lax.rem(d + 1, 2)

    # Small-ci layers starve the MXU's contraction depth if each tap is its
    # own K=ci matmul; gather the 9 in-plane taps into one K=9*ci im2col dot.
    use_im2col = ci <= 64

    def chunk(c, _):
        c0 = c * CH
        g = jnp.zeros((CH * W, 3 * co), jnp.float32)
        taps = []
        for ky in range(3):
            r0 = c0 + ky - 1
            rc = jnp.clip(r0, 0, H - CH)
            a = x_ref[0, 0, pl.ds(rc, CH), :, :]
            # Fix the one-row misalignment at the top/bottom edges.
            zrow = jnp.zeros((1, W, ci), a.dtype)
            if ky == 0:
                a = jnp.where(
                    r0 < 0, jnp.concatenate([zrow, a[: CH - 1]], axis=0), a
                )
            if ky == 2:
                a = jnp.where(
                    r0 + CH > H, jnp.concatenate([a[1:], zrow], axis=0), a
                )
            for kx in range(3):
                at = _shift_w(a, kx).reshape(CH * W, ci)
                if use_im2col:
                    taps.append(at)
                else:
                    g = g + jnp.dot(
                        at, wm_ref[ky * 3 + kx], preferred_element_type=jnp.float32
                    )
        if use_im2col:
            a9 = jnp.concatenate(taps, axis=-1)  # (CH*W, 9*ci)
            g = jnp.dot(
                a9,
                wm_ref[:].reshape(9 * ci, 3 * co),
                preferred_element_type=jnp.float32,
            )
        g = jnp.where(valid, g, 0.0)
        rows = pl.ds(pl.multiple_of(c0 * W, CH * W), CH * W)

        @pl.when(valid)
        def _():
            acc[s_mid, rows, :] = acc[s_mid, rows, :] + g[:, co : 2 * co]

        y = acc[s_cur, rows, :] + g[:, 2 * co : 3 * co] + b_ref[0]
        if negative_slope is not None:
            y = jnp.where(y >= 0, y, y * negative_slope)
        out_ref[0, 0, pl.ds(c0, CH), :, :] = y.reshape(CH, W, co).astype(
            out_ref.dtype
        )
        acc[s_cur, rows, :] = g[:, :co]
        return _

    jax.lax.fori_loop(0, H // CH, chunk, None)


@functools.partial(jax.jit, static_argnames=("negative_slope", "interpret"))
def conv3d_tap_merged(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    negative_slope: Optional[float] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Stride-1 SAME 3x3x3 conv + bias (+ optional LeakyReLU), NDHWC.

    Differentiable: the forward pass runs the Pallas kernel; the backward
    pass is the VJP of an equivalent XLA convolution (``pallas_call`` itself
    has no autodiff rule), so auto-dispatched layers work under
    ``jax.value_and_grad`` in training.

    Args:
      x: (N, D, H, W, ci) input (any float dtype; computed in bf16).
      w: (3, 3, 3, ci, co) weights (DHWIO).
      b: (co,) bias.
      negative_slope: if not None, fuse ``leaky_relu`` with this slope.

    Returns:
      (N, D, H, W, co) bf16.
    """
    return _tap_merged_vjp(x, w, b, negative_slope, interpret)


def _xla_reference(x, w, b, negative_slope):
    """Semantics-equivalent XLA conv, used for the backward pass.

    Computed in f32 throughout: mixing bf16 operands with an f32
    ``preferred_element_type`` breaks the conv transpose rule (dtype
    mismatch), and full precision is welcome in gradients anyway.
    """
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32),
        w.astype(jnp.float32),
        (1, 1, 1),
        "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    ) + b.astype(jnp.float32)
    if negative_slope is not None:
        y = jnp.where(y >= 0, y, y * negative_slope)
    return y.astype(jnp.bfloat16)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _tap_merged_vjp(x, w, b, negative_slope, interpret):
    return _tap_merged_impl(x, w, b, negative_slope, interpret)


def _tap_merged_fwd(x, w, b, negative_slope, interpret):
    return _tap_merged_impl(x, w, b, negative_slope, interpret), (x, w, b)


def _tap_merged_bwd(negative_slope, interpret, res, dy):
    x, w, b = res
    _, vjp = jax.vjp(lambda x_, w_, b_: _xla_reference(x_, w_, b_, negative_slope), x, w, b)
    return vjp(dy)


_tap_merged_vjp.defvjp(_tap_merged_fwd, _tap_merged_bwd)


def _tap_merged_impl(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    negative_slope: Optional[float],
    interpret: bool,
) -> jnp.ndarray:
    N, D, H, W, ci = x.shape
    kd, kh, kw, _, co = w.shape
    assert (kd, kh, kw) == (3, 3, 3), "kernel specialized for 3x3x3"
    CH = plan_tiles(H, W, ci, co)
    assert CH is not None, "working set exceeds VMEM; use pallas_conv_supported"

    # (3,3,3,ci,co) -> (9, ci, 3co): depth tap joins the lane dimension.
    wm = jnp.transpose(w, (1, 2, 3, 0, 4)).reshape(9, ci, 3 * co)

    out = pl.pallas_call(
        functools.partial(_kernel, D=D, CH=CH, negative_slope=negative_slope),
        grid=(N, D + 2),
        in_specs=[
            pl.BlockSpec(
                (1, 1, H, W, ci),
                lambda n, d: (n, jnp.clip(d - 1, 0, D - 1), 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((9, ci, 3 * co), lambda n, d: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda n, d: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, H, W, co), lambda n, d: (n, d, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((N, D + 2, H, W, co), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((2, H * W, co), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), wm.astype(jnp.bfloat16), b.reshape(1, co).astype(jnp.float32))

    return out[:, 2:, :, :, :]
