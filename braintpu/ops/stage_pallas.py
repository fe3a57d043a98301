"""Pallas TPU kernel: fused U-Net stage convolution (full-resolution capable).

The hot layers of the BraTS U-Nets (SURVEY.md §3.2; block semantics from
/root/reference/model_architecture/generic_UNet.py:56-72) are stride-1
3×3×3 convolutions at 192³-scale with 32–128 channels.  The XLA lowering
(tap-merged conv2d, models/unet3d.py) leaves three whole-tensor passes per
block on the table — the tap-combine epilogue, the GroupNorm statistics
reduction (measured ~26 GB/s effective), and the normalize-apply — plus
layout copies XLA inserts between them.

This kernel runs the entire stage chain in VMEM:

* **Input transform** ``t = leaky(x·a + c)`` per channel — the *previous*
  layer's GroupNorm (statistics folded into an affine) is applied to the
  resident chunk as it streams in, so normalized tensors never hit HBM.
* **Two-input concat** — the decoder's ``[upsampled, skip]`` concatenation
  happens on lanes in VMEM, each input with its own transform.
* **Tap-merged conv** — the three depth taps are merged into the GEMM lane
  dimension (one im2col dot per chunk), combined by a rolling pair of f32
  accumulators as the grid walks the depth axis (each input slice is read
  from HBM exactly once, each output slice written once).
* **Output epilogue** — bias, optional LeakyReLU (folded-BatchNorm path),
  and optional per-channel Σy / Σy² **statistics outputs** accumulated in
  VMEM so GroupNorm stats for *this* layer's output are free.  Statistics
  (and the input affines) are **per batch sample**: the grid walks n
  outermost, the running Σ resets at each sample's first step and flushes
  into that sample's row of the (N, co) output at its last — so batched
  sliding-window TTA keeps per-patch GroupNorm semantics.

Memory: the volume is processed in H-bands (grid ``(N, H/CH, D+2)``) so a
full-resolution slice never has to be VMEM-resident.  Bands arrive through
the standard Pallas pipeline as Blocked ``(1, 1, CH, W, ci)`` blocks; the
±1-row conv halo comes from a small pre-gathered side input holding each
band's boundary rows (``(N, D, HC, 2, W, ci)``, ~``2/CH`` of the volume).
Round-3 TPU probes showed why manual halo DMA cannot work here: Mosaic's
``memref_slice`` requires the lane (channel) dim be 128-aligned even when
un-sliced ("Slice shape along dimension 4 must be aligned to tiling (128),
but is 32", tools/mosaic_repro.py), which rejects every ci<128 production
shape — while Blocked pipeline blocks at 32 lanes compile and run.

Constraints: stride 1, 3×3×3, SAME padding, ``ci % 8 == 0``, bf16 compute,
f32 accumulation.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["conv_stage", "conv_stage_supported", "plan_stage_tiles"]

_VMEM_BUDGET = 12 * 1024 * 1024


def _pad_lanes(c: int) -> int:
    return -(-c // 128) * 128


def plan_stage_tiles(
    H: int, W: int, ci: int, co: int,
    ci_split: Optional[Tuple[int, int]] = None,
) -> Optional[Tuple[int, int]]:
    """(CH, RS): H-band height and row sub-chunk, or None if nothing fits.

    ``ci_split=(ci1, ci2)`` is the two-input (decoder concat) form: the
    halo bands live in SEPARATE scratch buffers, each padded to 128 lanes
    on its own — e.g. ci1=ci2=32 really occupies pad(32)+pad(32)=256
    lanes, not pad(64)=128, and a planner that counts the combined ci
    would approve CH values that blow its own budget on the largest
    decoder stages.
    """
    if ci_split is not None:
        lanes_in = _pad_lanes(ci_split[0]) + _pad_lanes(ci_split[1])
    else:
        lanes_in = _pad_lanes(ci)
    for ch in (64, 32, 16, 8):
        if ch > H or H % ch:
            continue
        # pipeline double-buffers the mid band and the 2-row halo block
        inb = 2 * ch * W * lanes_in * 2 + 2 * 2 * W * lanes_in * 2
        outb = 2 * ch * W * _pad_lanes(co) * 2
        acc = 2 * ch * W * _pad_lanes(co) * 4
        wm = 9 * ci * _pad_lanes(3 * co) * 2
        fixed = inb + outb + acc + wm
        if fixed > _VMEM_BUDGET:
            continue
        for rs in (16, 8, 4):
            if rs > ch or ch % rs:
                continue
            a9 = rs * W * _pad_lanes(9 * ci) * 2
            g = rs * W * _pad_lanes(3 * co) * 4
            if fixed + a9 + g <= _VMEM_BUDGET:
                return ch, rs
    return None


def conv_stage_supported(shape: Tuple[int, ...], co: int, ci2: int = 0) -> bool:
    """``shape`` is the FIRST input's shape; ``ci2`` the optional second
    (decoder-concat) input's channels.  Weights see ci1+ci2."""
    N, D, H, W, ci1 = shape
    ci = ci1 + ci2
    if ci1 % 8 or ci2 % 8 or co % 8 or D < 3 or H < 8 or W < 8:
        return False
    split = (ci1, ci2) if ci2 else None
    return plan_stage_tiles(H, W, ci, co, ci_split=split) is not None


def _shift_w(a: jnp.ndarray, kx: int) -> jnp.ndarray:
    """Zero-padded shift along W for in-plane tap ``kx`` (rank 3: R, W, ci)."""
    R, W, ci = a.shape
    z = jnp.zeros((R, 1, ci), a.dtype)
    if kx == 0:
        return jnp.concatenate([z, a[:, : W - 1]], axis=1)
    if kx == 2:
        return jnp.concatenate([a[:, 1:], z], axis=1)
    return a


def _kernel(
    # refs in order (all standard pipelined VMEM blocks)
    x_ref,      # VMEM block (1, 1, CH, W, ci1) — mid band of source slice
    h_ref,      # VMEM block (1, 1, 1, 2, W, ci1) — [top, bottom] halo rows
    x2_ref,     # VMEM block (1, 1, CH, W, ci2) or tiny dummy
    h2_ref,     # VMEM block (1, 1, 1, 2, W, ci2) or tiny dummy
    wm_ref,     # VMEM (9*ci, 3co) bf16
    b_ref,      # VMEM (1, co) f32
    a1_ref,     # VMEM (N, ci1) f32
    c1_ref,     # VMEM (N, ci1) f32
    a2_ref,     # VMEM (N, ci2) f32
    c2_ref,     # VMEM (N, ci2) f32
    out_ref,    # VMEM block (1, 1, CH, W, co) bf16
    s1_ref,     # VMEM (N, co) f32  (stats outputs; dummies when unused)
    s2_ref,     # VMEM (N, co) f32
    acc,        # VMEM scratch (2, CH*W, co) f32
    st,         # VMEM scratch (2, co) f32 — running Σy, Σy²
    *,
    D: int,
    H: int,
    CH: int,
    RS: int,
    in1_slope: Optional[float],
    in2_slope: Optional[float],
    in1_affine: bool,
    in2_affine: bool,
    out_slope: Optional[float],
    stats: bool,
    two_inputs: bool,
):
    n = pl.program_id(0)
    hc = pl.program_id(1)
    d = pl.program_id(2)
    HC = pl.num_programs(1)
    ND = pl.num_programs(2)  # D + 2
    W = out_ref.shape[3]
    co = out_ref.shape[4]

    n_first = jnp.logical_and(hc == 0, d == 0)
    n_last = jnp.logical_and(hc == HC - 1, d == ND - 1)

    valid = jnp.logical_and(d >= 1, d <= D)  # source slice d-1 exists

    # per-sample running Σ: reset at each n's first step, flushed at its last
    @pl.when(jnp.logical_and(stats, n_first))
    def _():
        st[:] = jnp.zeros_like(st)

    s_cur = jax.lax.rem(d, 2)
    s_mid = jax.lax.rem(d + 1, 2)

    def load_chunk(xr, hr, r0, ky, a_ref_, c_ref_, affine, slope):
        """Band rows [r0+ky-1, +RS) of the current depth slice, transformed.

        ``r0``/``ky`` are Python ints, so which rows come from the halo ref
        is static: only the first chunk's ky=0 reaches above the band and
        only the last chunk's ky=2 reaches below it.
        """
        b0 = r0 + ky - 1  # first band row wanted (may be -1 / CH-RS+1)
        top = b0 < 0
        bot = b0 + RS > CH
        if top:
            a = jnp.concatenate(
                [hr[0, 0, 0, 0:1], xr[0, 0, pl.ds(0, RS - 1)]], axis=0
            )
        elif bot:
            a = jnp.concatenate(
                [xr[0, 0, pl.ds(b0, RS - 1)], hr[0, 0, 0, 1:2]], axis=0
            )
        else:
            a = xr[0, 0, pl.ds(b0, RS)]
        if affine or slope is not None:
            t = a.astype(jnp.float32)
            if affine:
                # affine refs hold the FULL (N, ci) array (a (1, ci) block
                # over an N>1 array is an illegal 1-sublane block on TPU);
                # select this sample's row here
                t = t * a_ref_[pl.ds(n, 1)] + c_ref_[pl.ds(n, 1)]
            if slope is not None:
                t = jnp.where(t >= 0, t, t * slope)
            a = t.astype(jnp.bfloat16)
        # Boundary fix AFTER the transform: the out-of-volume row is SAME
        # conv zero-padding, which is never normalized/activated.
        zrow = jnp.zeros((1, a.shape[1], a.shape[2]), a.dtype)
        if top:  # global row hc*CH - 1 is out of volume iff hc == 0
            a = jnp.where(hc == 0, jnp.concatenate([zrow, a[1:]], axis=0), a)
        if bot:  # global row hc*CH + CH is out of volume iff hc == HC - 1
            a = jnp.where(
                hc == HC - 1, jnp.concatenate([a[:-1], zrow], axis=0), a
            )
        return a

    nchunks = CH // RS

    ci_total = wm_ref.shape[0] // 9
    # Small-ci layers starve the MXU contraction depth tap-by-tap → one
    # K=9·ci im2col dot; large-ci layers accumulate per-tap dots (the
    # 9-way lane concat is only 128-aligned for power-of-two ci).
    use_im2col = ci_total <= 64

    def chunk(ic):
        r0 = ic * RS
        taps = []
        g = None
        for ky in range(3):
            a = load_chunk(x_ref, h_ref, r0, ky,
                           a1_ref, c1_ref, in1_affine, in1_slope)
            if two_inputs:
                a2 = load_chunk(x2_ref, h2_ref, r0, ky,
                                a2_ref, c2_ref, in2_affine, in2_slope)
                a = jnp.concatenate([a, a2], axis=-1)
            for kx in range(3):
                at = _shift_w(a, kx).reshape(RS * W, -1)
                if use_im2col:
                    taps.append(at)
                else:
                    t = ky * 3 + kx
                    gt = jnp.dot(
                        at,
                        wm_ref[pl.ds(t * ci_total, ci_total), :],
                        preferred_element_type=jnp.float32,
                    )
                    g = gt if g is None else g + gt
        if use_im2col:
            a9 = jnp.concatenate(taps, axis=-1)  # (RS*W, 9*ci)
            g = jnp.dot(a9, wm_ref[:], preferred_element_type=jnp.float32)
        g = jnp.where(valid, g, 0.0)
        rows = pl.ds(r0 * W, RS * W)  # r0 is a Python int now

        @pl.when(valid)
        def _():
            acc[s_mid, rows, :] = acc[s_mid, rows, :] + g[:, co : 2 * co]

        y = acc[s_cur, rows, :] + g[:, 2 * co : 3 * co] + b_ref[0]
        out_valid = d >= 2
        if stats:
            ym = jnp.where(out_valid, y, 0.0)

            @pl.when(out_valid)
            def _():
                st[0] = st[0] + jnp.sum(ym, axis=0)
                st[1] = st[1] + jnp.sum(ym * ym, axis=0)
        if out_slope is not None:
            y = jnp.where(y >= 0, y, y * out_slope)
        out_ref[0, 0, pl.ds(r0, RS), :, :] = y.reshape(RS, W, co).astype(
            out_ref.dtype
        )
        acc[s_cur, rows, :] = g[:, :co]

    for ic in range(nchunks):  # static: keeps halo row selection static
        chunk(ic)

    if stats:
        @pl.when(n_last)
        def _():
            # stats refs hold the FULL (N, co) output (see affine-ref note)
            s1_ref[pl.ds(n, 1)] = st[pl.ds(0, 1)]
            s2_ref[pl.ds(n, 1)] = st[pl.ds(1, 1)]


def _xla_reference(x, x2, w, b, a1, c1, a2, c2, cfgd):
    """Semantics-equivalent XLA computation (testing + backward)."""

    def tr(t, a, c, affine, slope):
        if affine:
            t = t.astype(jnp.float32) * a + c
        if slope is not None:
            t = jnp.where(t >= 0, t, t * slope)
        return t.astype(jnp.bfloat16)

    t1 = tr(x, a1, c1, cfgd["in1_affine"], cfgd["in1_slope"])
    if x2 is not None:
        t2 = tr(x2, a2, c2, cfgd["in2_affine"], cfgd["in2_slope"])
        t1 = jnp.concatenate([t1, t2], axis=-1)
    y = jax.lax.conv_general_dilated(
        t1.astype(jnp.float32),
        w.astype(jnp.float32),
        (1, 1, 1),
        "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    ) + b.astype(jnp.float32)
    s1 = jnp.sum(y, axis=(1, 2, 3))  # per-sample (N, co), like the kernel
    s2 = jnp.sum(y * y, axis=(1, 2, 3))
    if cfgd["out_slope"] is not None:
        y = jnp.where(y >= 0, y, y * cfgd["out_slope"])
    return y.astype(jnp.bfloat16), s1, s2


@functools.partial(
    jax.jit,
    static_argnames=(
        "in1_slope", "in2_slope", "in1_affine", "in2_affine",
        "out_slope", "stats", "interpret",
    ),
)
def conv_stage(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    x2: Optional[jnp.ndarray] = None,
    a1: Optional[jnp.ndarray] = None,
    c1: Optional[jnp.ndarray] = None,
    a2: Optional[jnp.ndarray] = None,
    c2: Optional[jnp.ndarray] = None,
    in1_slope: Optional[float] = None,
    in2_slope: Optional[float] = None,
    in1_affine: bool = False,
    in2_affine: bool = False,
    out_slope: Optional[float] = None,
    stats: bool = False,
    interpret: bool = False,
):
    """Fused stride-1 3×3×3 conv stage (see module docstring).

    Args:
      x: (N, D, H, W, ci1) first input.
      w: (3, 3, 3, ci, co) weights, ci = ci1 (+ ci2 with ``x2``).
      b: (co,) bias.
      x2: optional second input, concatenated on channels after transforms.
      a1/c1, a2/c2: per-channel input affines (used when ``in*_affine``) —
        shape (ci,) shared across the batch, or (N, ci) per sample
        (deferred per-patch GroupNorm in batched TTA forwards).
      in*_slope: LeakyReLU slope fused after each input affine.
      out_slope: LeakyReLU slope fused on the output (folded-norm path).
      stats: also return (Σy, Σy²) per channel of the pre-activation
        output, PER SAMPLE — GroupNorm statistics for this layer come
        for free.

    Returns:
      y (N, D, H, W, co) bf16, or (y, s1, s2) with ``stats`` where
      s1/s2 are (N, co) f32.
    """
    N, D, H, W, ci1 = x.shape
    co = w.shape[4]
    ci = w.shape[3]
    ci2 = ci - ci1
    two = x2 is not None
    assert (ci2 > 0) == two
    plan = plan_stage_tiles(H, W, ci, co,
                            ci_split=(ci1, ci2) if two else None)
    assert plan is not None, "use conv_stage_supported before calling"
    CH, RS = plan

    wm = jnp.transpose(w, (1, 2, 3, 0, 4)).reshape(9, ci, 3 * co)
    # im2col tap order must match the kernel: (ky, kx) major, channel minor.
    wm = wm.reshape(9 * ci, 3 * co)

    def vec(v, n):
        """affine vector → (N, n) f32 (broadcast shared (n,) vectors)."""
        if v is None:
            return jnp.ones((N, n), jnp.float32)
        v = v.astype(jnp.float32)
        if v.ndim == 1:
            v = v[None, :]
        return jnp.broadcast_to(v, (N, n))

    HC = H // CH

    def build_halo(xx):
        """(N, D, H, W, c) → (N, D, HC, 2, W, c) band boundary rows.

        Row 0 of band hc = global row hc*CH-1, row 1 = hc*CH+CH; volume-edge
        positions hold zeros (the kernel re-zeros them post-transform
        anyway, so only the shape matters there).
        """
        z = jnp.zeros_like(xx[:, :, :1])
        tops = jnp.concatenate([z, xx[:, :, CH - 1 : H - 1 : CH]], axis=2)
        bots = jnp.concatenate([xx[:, :, CH::CH], z], axis=2)
        return jnp.stack([tops, bots], axis=3)

    x_in = x.astype(jnp.bfloat16)
    h_in = build_halo(x_in)
    if two:
        x2_in = x2.astype(jnp.bfloat16)
        h2_in = build_halo(x2_in)
        ci2b = ci2
        x2_block = (1, 1, CH, W, ci2)
        h2_block = (1, 1, 1, 2, W, ci2)
        x2_index = lambda n, hc, d: (n, jnp.clip(d - 1, 0, D - 1), hc, 0, 0)
        h2_index = lambda n, hc, d: (n, jnp.clip(d - 1, 0, D - 1), hc, 0, 0, 0)
    else:
        ci2b = 8
        x2_in = jnp.zeros((1, 1, 1, 8, 8), jnp.bfloat16)
        h2_in = jnp.zeros((1, 1, 1, 2, 8, 8), jnp.bfloat16)
        x2_block = (1, 1, 1, 8, 8)
        h2_block = (1, 1, 1, 2, 8, 8)
        x2_index = lambda n, hc, d: (0, 0, 0, 0, 0)
        h2_index = lambda n, hc, d: (0, 0, 0, 0, 0, 0)

    kern = functools.partial(
        _kernel,
        D=D, H=H, CH=CH, RS=RS,
        in1_slope=in1_slope, in2_slope=in2_slope,
        in1_affine=in1_affine, in2_affine=in2_affine,
        out_slope=out_slope, stats=stats, two_inputs=two,
    )
    out, s1, s2 = pl.pallas_call(
        kern,
        grid=(N, HC, D + 2),
        in_specs=[
            pl.BlockSpec(
                (1, 1, CH, W, ci1),
                lambda n, hc, d: (n, jnp.clip(d - 1, 0, D - 1), hc, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, 1, 2, W, ci1),
                lambda n, hc, d: (n, jnp.clip(d - 1, 0, D - 1), hc, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(x2_block, x2_index, memory_space=pltpu.VMEM),
            pl.BlockSpec(h2_block, h2_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * ci, 3 * co), lambda n, hc, d: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda n, hc, d: (0, 0), memory_space=pltpu.VMEM),
            # full (N, ci) blocks: a (1, ci) block over an N>1 array is an
            # illegal 1-sublane block; the kernel indexes row n itself
            pl.BlockSpec((N, ci1), lambda n, hc, d: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, ci1), lambda n, hc, d: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, ci2b), lambda n, hc, d: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, ci2b), lambda n, hc, d: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, 1, CH, W, co),
                lambda n, hc, d: (n, jnp.maximum(d - 2, 0), hc, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((N, co), lambda n, hc, d: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, co), lambda n, hc, d: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N, D, H, W, co), jnp.bfloat16),
            jax.ShapeDtypeStruct((N, co), jnp.float32),
            jax.ShapeDtypeStruct((N, co), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, CH * W, co), jnp.float32),
            pltpu.VMEM((2, co), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        x_in,
        h_in,
        x2_in,
        h2_in,
        wm.astype(jnp.bfloat16),
        b.reshape(1, co).astype(jnp.float32),
        vec(a1, ci1), vec(c1, ci1), vec(a2, ci2b), vec(c2, ci2b),
    )
    if stats:
        return out, s1, s2
    return out
