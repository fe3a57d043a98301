"""Micro-probe: pure-XLA alternatives for the two biggest non-conv costs.

Per PERF.md's trace attribution, after the conv lowerings the fullconv
ensemble's remaining device time is dominated by

1. the upconv pixel-shuffle interleaves (~54 ms/fwd BN, ~93 ms/fwd GN —
   ~1.1 s per case over 8 mirrors), and
2. the GroupNorm/Instance statistics passes (~111 ms/fwd GN — ~0.9 s/case).

Both are pure data movement / reduction; both have pure-XLA reformulations
(no Mosaic compile risk).  This probe times each variant at the production
shapes on whatever backend is attached and prints a JSON line per shape.

Upconv variants (x: (N,D,H,W,ci) bf16, w: (ci,2,2,2,co)):
  peel     — current production path (_upconv): einsum + 3 per-axis
             rank-6 moveaxis interleaves.
  blocked  — einsum to (N,D,H,kd*kh,W,kw*co): the W-interleave is then an
             adjacent-dim reshape; one rank-7 transpose moves kd next to D
             with a large contiguous minor block (kh*2W*co), then a single
             reshape merges (D,kd)(H,kh).
  fused    — einsum emitted directly in (N,D,kd,H,kh,W,kw*co) axis order
             (XLA transposes in the dot epilogue), then ONE reshape.

GroupNorm-stats variants (x: (N,D,H,W,C) bf16, g groups):
  sum      — current production path (_spatial_group_stats): f32 astype +
             .sum over the flattened spatial axis.
  gram     — MXU dot-reductions: s1 = ones·x, s2 = diag(xᵀx) per sample
             (contraction over the spatial axis rides the MXU at streaming
             bandwidth; bf16 multiplies, f32 accumulation).

Usage:  python tools/opt_probe.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# --------------------------------------------------------------------------
# upconv variants
# --------------------------------------------------------------------------

def upconv_peel(x, w):
    # pin the baseline lowering: _upconv reads BRAINTPU_UPCONV_XLA /
    # BRAINTPU_PALLAS_UPCONV at trace time, and inheriting a variant value
    # from the environment would silently compare a variant against itself
    import os

    os.environ["BRAINTPU_UPCONV_XLA"] = "peel"
    os.environ["BRAINTPU_PALLAS_UPCONV"] = "0"
    from braintpu.models.unet3d import _upconv

    return _upconv(x, w, jnp.bfloat16)


def upconv_blocked(x, w):
    ci, kd, kh, kw, co = w.shape
    N, D, H, W, _ = x.shape
    wm = w.reshape(ci, kd * kh, kw * co).astype(jnp.bfloat16)
    y = jnp.einsum(
        "ndhwc,cpk->ndhpwk", x.astype(jnp.bfloat16), wm,
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)
    # (N,D,H,kd*kh,W,kw*co) -> W-phase merge is an adjacent-dim reshape
    y = y.reshape(N, D, H, kd, kh, kw * W, co)
    # move kd next to D (single transpose, contiguous minor block kh*2W*co)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5, 6))
    return y.reshape(N, kd * D, kh * H, kw * W, co)


def upconv_fused(x, w):
    ci, kd, kh, kw, co = w.shape
    N, D, H, W, _ = x.shape
    wm = w.reshape(ci, kd, kh, kw * co).astype(jnp.bfloat16)
    y = jnp.einsum(
        "ndhwc,cpqk->ndphqwk", x.astype(jnp.bfloat16), wm,
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)
    return y.reshape(N, kd * D, kh * H, kw * W, co)


UPCONV_VARIANTS = {
    "peel": upconv_peel,
    "blocked": upconv_blocked,
    "fused": upconv_fused,
}

# (N, D, H, W, ci, co): decoder upconv inputs at the 192x192x160 fullconv
# bucket (BN encoder_scale=1 and GN-large encoder_scale=2) plus the 128^3
# sliding-window patch shapes (B=4 TTA chunk for the wide model).
UPCONV_SHAPES = [
    ("bn-full", (1, 96, 96, 80, 64, 32)),
    ("bn-half", (1, 48, 48, 40, 128, 64)),
    ("gn-full", (1, 96, 96, 80, 128, 64)),
    ("gn-half", (1, 48, 48, 40, 256, 128)),
    ("patch-bn-full", (8, 64, 64, 64, 64, 32)),
    ("patch-gn-full", (4, 64, 64, 64, 128, 64)),
]


# --------------------------------------------------------------------------
# stats variants
# --------------------------------------------------------------------------

def stats_sum(x, g):
    # pin the baseline: _spatial_group_stats reads BRAINTPU_GN_STATS at
    # trace time (same self-comparison hazard as upconv_peel above)
    import os

    os.environ["BRAINTPU_GN_STATS"] = "sum"
    from braintpu.models.unet3d import _spatial_group_stats

    return _spatial_group_stats(x, g)


def stats_gram(x, g):
    N, D, H, W, C = x.shape
    v = D * H * W
    xm = x.reshape(N, v, C)
    ones = jnp.ones((v,), xm.dtype)
    s1 = jnp.einsum("nvc,v->nc", xm, ones, preferred_element_type=jnp.float32)
    gram = jnp.einsum("nvc,nvk->nck", xm, xm, preferred_element_type=jnp.float32)
    s2 = jnp.diagonal(gram, axis1=1, axis2=2)
    n = v * (C // g)
    s1g = s1.reshape(N, g, C // g).sum(axis=2)
    s2g = s2.reshape(N, g, C // g).sum(axis=2)
    mean = s1g / n
    var = jnp.maximum(s2g / n - mean * mean, 0.0)
    return mean, var


STATS_VARIANTS = {"sum": stats_sum, "gram": stats_gram}

# (N, D, H, W, C): GN-large stage outputs at the fullconv bucket; g=8.
STATS_SHAPES = [
    ("gn-l0", (1, 192, 192, 160, 64)),
    ("gn-l1", (1, 96, 96, 80, 128)),
    ("gn-l2", (1, 48, 48, 40, 256)),
    ("patch-gn-l0", (4, 128, 128, 128, 64)),
]


def _time(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="smallest shape only")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()
    dev = jax.devices()[0]
    print(f"# device: {dev.device_kind}", flush=True)
    rng = np.random.default_rng(0)

    up_shapes = UPCONV_SHAPES[:1] if args.quick else UPCONV_SHAPES
    for name, (N, D, H, W, ci, co) in up_shapes:
        x = jnp.asarray(rng.normal(size=(N, D, H, W, ci)).astype(np.float32), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(ci, 2, 2, 2, co)).astype(np.float32), jnp.bfloat16)
        rec = {"probe": "upconv", "shape": name}
        ref = None
        for vname, fn in UPCONV_VARIANTS.items():
            jfn = jax.jit(fn)
            out = np.asarray(jfn(x, w), np.float32)
            if ref is None:
                ref = out
                rec["maxdiff_" + vname] = 0.0
            else:
                rec["maxdiff_" + vname] = float(np.max(np.abs(out - ref)))
            rec[vname + "_ms"] = round(_time(jfn, x, w, iters=args.iters) * 1e3, 3)
        print(json.dumps(rec), flush=True)

    st_shapes = STATS_SHAPES[:1] if args.quick else STATS_SHAPES
    for name, (N, D, H, W, C) in st_shapes:
        x = jnp.asarray(rng.normal(size=(N, D, H, W, C)).astype(np.float32), jnp.bfloat16)
        rec = {"probe": "stats", "shape": name}
        ref = None
        for vname, fn in STATS_VARIANTS.items():
            jfn = jax.jit(partial(fn, g=8))
            m, v = jfn(x)
            out = np.stack([np.asarray(m, np.float32), np.asarray(v, np.float32)])
            if ref is None:
                ref = out
                rec["maxdiff_" + vname] = 0.0
            else:
                rec["maxdiff_" + vname] = float(np.max(np.abs(out - ref)))
            rec[vname + "_ms"] = round(_time(jfn, x, iters=args.iters) * 1e3, 3)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
