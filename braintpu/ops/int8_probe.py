"""Pallas int8 matmul micro-kernel — a measurement probe, not a prod op.

Context (PERF.md "known-good facts"): plain XLA ``dot_general`` with int8
operands reaches only ~90–106 TOP/s on v5e — no better than bf16 — far
from the 394 TOPS native int8 MXU rate, so int8 inference only pays if a
custom kernel can engage the native rate.  This module is the cheap
experiment: a blocked (M, K) × (K, N) → int32 Pallas matmul whose measured
throughput answers "can Mosaic emit native int8 MXU ops on this
toolchain?" before any investment in an int8 conv path (README roadmap
item c).  Run via ``tools/tpu_probe.py int8``.

The kernel is a textbook 3-loop blocked matmul: grid (M/BM, N/BN, K/BK),
one (BM, BK) × (BK, BN) dot per step accumulated in an f32-free int32
VMEM scratch, flushed on the last K step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["int8_matmul", "xla_int8_matmul"]


def _kernel(x_ref, y_ref, o_ref, acc, *, nk: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    acc[:] += jnp.dot(
        x_ref[:], y_ref[:], preferred_element_type=jnp.int32
    )

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc[:]


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk", "interpret"))
def int8_matmul(
    x: jnp.ndarray,
    y: jnp.ndarray,
    bm: int = 512,
    bn: int = 512,
    bk: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """(M, K) int8 × (K, N) int8 → (M, N) int32, blocked Pallas matmul."""
    M, K = x.shape
    K2, N = y.shape
    assert K == K2 and M % bm == 0 and N % bn == 0 and K % bk == 0
    nk = K // bk
    return pl.pallas_call(
        functools.partial(_kernel, nk=nk),
        grid=(M // bm, N // bn, nk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, y)


@jax.jit
def xla_int8_matmul(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """The XLA baseline the probe compares against."""
    return jax.lax.dot_general(
        x, y, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
