"""Minimal Mosaic repros for the stage-kernel sub-128-lane DMA failure.

Round-3 TPU probes (tools/tpu_probe_results.jsonl) showed the fused stage
kernel compiles and runs for ci ∈ {128, 256} but fails Mosaic lowering for
ci ∈ {8, 32, 64} — i.e. whenever the channel (lane) dim of the manual
HBM→VMEM halo-band DMA is below one full 128-lane tile.  Each variant here
isolates one candidate mechanism in its own subprocess (a bad compile must
never wedge the shared remote compile service for the session).

Usage:  python tools/mosaic_repro.py all            # run every variant
        python tools/mosaic_repro.py dyn32 full48   # specific variants
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = os.path.join(REPO, "tools", "mosaic_repro_results.jsonl")

_PRELUDE = r"""
import functools, json, sys
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def report(name, ok, **kw):
    print(json.dumps({"repro": name, "ok": bool(ok), **kw}), flush=True)
"""

# 1. Exact current pattern: dynamic (n, d, row) slice of HBM, ci=32.
_DYN = _PRELUDE + r"""
CI = int(sys.argv[1]) if len(sys.argv) > 1 else 32
D, H, W, CH = 8, 64, 128, 32
CHP = CH + 2

def kern(x_ref, o_ref, buf, sem):
    d = pl.program_id(0)
    r0 = jnp.clip(d * CH - 1, 0, H - CHP)
    cp = pltpu.make_async_copy(x_ref.at[0, jnp.clip(d, 0, D - 1), pl.ds(r0, CHP)],
                               buf, sem)
    cp.start(); cp.wait()
    o_ref[0, 0] = buf[1:CH + 1] * 2.0

x = jnp.ones((1, D, H, W, CI), jnp.bfloat16)
out = pl.pallas_call(
    kern,
    grid=(H // CH,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
    out_specs=pl.BlockSpec((1, 1, CH, W, CI), lambda h: (0, 0, h, 0, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((1, H // CH, CH, W, CI), jnp.bfloat16),
    scratch_shapes=[pltpu.VMEM((CHP, W, CI), jnp.bfloat16),
                    pltpu.SemaphoreType.DMA],
)(x)
jax.block_until_ready(out)
report(f"dyn-ci{CI}", bool(jnp.all(out == 2.0)))
"""

# 2. Full-H depth-slice copy (only the depth index dynamic), ci=32.
_FULL = _PRELUDE + r"""
CI = int(sys.argv[1]) if len(sys.argv) > 1 else 32
D, H, W = 8, 48, 128

def kern(x_ref, o_ref, buf, sem):
    d = pl.program_id(0)
    cp = pltpu.make_async_copy(x_ref.at[0, d], buf, sem)
    cp.start(); cp.wait()
    o_ref[0, 0] = buf[...] * 2.0

x = jnp.ones((1, D, H, W, CI), jnp.bfloat16)
out = pl.pallas_call(
    kern,
    grid=(D,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
    out_specs=pl.BlockSpec((1, 1, H, W, CI), lambda d: (0, d, 0, 0, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((1, D, H, W, CI), jnp.bfloat16),
    scratch_shapes=[pltpu.VMEM((H, W, CI), jnp.bfloat16),
                    pltpu.SemaphoreType.DMA],
)(x)
jax.block_until_ready(out)
report(f"full-ci{CI}", bool(jnp.all(out == 2.0)))
"""

# 3. Row slice with 8-ALIGNED dynamic offset (alignment hypothesis), ci=32.
_ALIGNED = _PRELUDE + r"""
CI = int(sys.argv[1]) if len(sys.argv) > 1 else 32
D, H, W, CH = 8, 64, 128, 32
CHB = CH + 8  # aligned halo band: 8 extra rows instead of 2

def kern(x_ref, o_ref, buf, sem):
    d = pl.program_id(0)
    r0 = jnp.maximum(d * CH - 8, 0)
    r0 = pl.multiple_of(r0, 8)
    cp = pltpu.make_async_copy(x_ref.at[0, 0, pl.ds(r0, CHB)], buf, sem)
    cp.start(); cp.wait()
    o_ref[0, 0] = buf[8:CH + 8] * 2.0

x = jnp.ones((1, D, H + 8, W, CI), jnp.bfloat16)
out = pl.pallas_call(
    kern,
    grid=(H // CH,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
    out_specs=pl.BlockSpec((1, 1, CH, W, CI), lambda h: (0, 0, h, 0, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((1, H // CH, CH, W, CI), jnp.bfloat16),
    scratch_shapes=[pltpu.VMEM((CHB, W, CI), jnp.bfloat16),
                    pltpu.SemaphoreType.DMA],
)(x)
jax.block_until_ready(out)
report(f"aligned-ci{CI}", bool(jnp.all(out == 2.0)))
"""

# 4. Standard pipelined BlockSpec input (no manual DMA), ci=32.
_BLOCKSPEC = _PRELUDE + r"""
CI = int(sys.argv[1]) if len(sys.argv) > 1 else 32
D, H, W, CH = 8, 64, 128, 32

def kern(x_ref, o_ref):
    o_ref[...] = x_ref[...] * 2.0

x = jnp.ones((1, D, H, W, CI), jnp.bfloat16)
out = pl.pallas_call(
    kern,
    grid=(D, H // CH),
    in_specs=[pl.BlockSpec((1, 1, CH, W, CI), lambda d, h: (0, d, h, 0, 0),
                           memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((1, 1, CH, W, CI), lambda d, h: (0, d, h, 0, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((1, D, H, W, CI), jnp.bfloat16),
)(x)
jax.block_until_ready(out)
report(f"blockspec-ci{CI}", bool(jnp.all(out == 2.0)))
"""

# 5. W*ci folded lanes: dynamic row DMA at lane dim W*ci, then the
#    (RS, W*ci) -> (RS*W, ci) unfold the GEMM would need.
_WCIFOLD = _PRELUDE + r"""
CI = int(sys.argv[1]) if len(sys.argv) > 1 else 32
D, H, W, CH, RS = 8, 64, 128, 32, 8
CHP = CH + 2
LW = W * CI

def kern(x_ref, o_ref, buf, sem):
    d = pl.program_id(0)
    r0 = jnp.clip(d * CH - 1, 0, H - CHP)
    cp = pltpu.make_async_copy(x_ref.at[0, 0, pl.ds(r0, CHP)], buf, sem)
    cp.start(); cp.wait()
    rows = buf[1:RS + 1]                      # (RS, W*ci)
    mat = rows.reshape(RS * W, CI)            # the unfold the GEMM needs
    o_ref[0, 0] = (mat * 2.0).reshape(RS, LW)

x = jnp.ones((1, D, H, LW), jnp.bfloat16)
out = pl.pallas_call(
    kern,
    grid=(H // CH,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
    out_specs=pl.BlockSpec((1, 1, RS, LW), lambda h: (0, 0, h, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((1, H // CH, RS, LW), jnp.bfloat16),
    scratch_shapes=[pltpu.VMEM((CHP, LW), jnp.bfloat16),
                    pltpu.SemaphoreType.DMA],
)(x)
jax.block_until_ready(out)
report(f"wcifold-ci{CI}", bool(jnp.all(out == 2.0)))
"""

VARIANTS = {
    "dyn32": (_DYN, "32"),
    "dyn64": (_DYN, "64"),
    "dyn128": (_DYN, "128"),
    "full32": (_FULL, "32"),
    "aligned32": (_ALIGNED, "32"),
    "blockspec32": (_BLOCKSPEC, "32"),
    "wcifold32": (_WCIFOLD, "32"),
}


def run(name: str, timeout: float = 300.0) -> dict:
    code, arg = VARIANTS[name]
    env = dict(os.environ, JAX_TRACEBACK_FILTERING="off")
    t0 = time.time()
    try:
        p = subprocess.run([sys.executable, "-c", code, arg], cwd=REPO,
                           env=env, capture_output=True, text=True,
                           timeout=timeout)
        rec = None
        for ln in (p.stdout or "").splitlines():
            if ln.startswith("{"):
                rec = json.loads(ln)
        if rec is None:
            err = p.stderr or ""
            if len(err) > 6000:
                err = err[:4500] + "\n...[cut]...\n" + err[-1500:]
            rec = {"repro": name, "ok": False, "rc": p.returncode,
                   "stderr": err}
    except subprocess.TimeoutExpired:
        rec = {"repro": name, "ok": False, "error": f"TIMEOUT {timeout}s"}
    rec["wall_s"] = round(time.time() - t0, 1)
    with open(LOG, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps({k: v for k, v in rec.items() if k != "stderr"}),
          flush=True)
    if not rec.get("ok") and "stderr" in rec:
        print(rec["stderr"][:2500], file=sys.stderr)
    return rec


def main() -> int:
    names = sys.argv[1:] or ["all"]
    if names == ["all"]:
        names = list(VARIANTS)
    for n in names:
        run(n)
    return 0


if __name__ == "__main__":
    sys.exit(main())
