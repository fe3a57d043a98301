"""TPU compile/perf probe harness for the PERF.md round-2 checklist.

A hung Mosaic/XLA compile in this environment wedges the shared remote
compile service for every jax process (PERF.md "known-good facts"), so
every probe here runs in its OWN subprocess with a hard timeout — a hang
costs one killed child, not the session.  Probes run smallest-first, one
at a time.

Usage (run from the repo root, with the axon tunnel up):

    python tools/tpu_probe.py relay              # is the tunnel alive?
    python tools/tpu_probe.py stage              # conv_stage per-shape compile+run
    python tools/tpu_probe.py upconv             # upconv2x strategies
    python tools/tpu_probe.py fullconv           # BN/GN ensemble timings
    python tools/tpu_probe.py all

Each probe prints one JSON line: {"probe": ..., "ok": bool, "seconds": ...}.
Results append to tools/tpu_probe_results.jsonl for the session log.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = os.path.join(REPO, "tools", "tpu_probe_results.jsonl")

#: (name, N, D, H, W, ci, co, stats, ci2) — smallest first; production
#: shapes from the 192×192×160 fullconv bucket and the 128³ sliding patch.
#: ci2 > 0 probes the two-input decoder-concat form the production fused
#: path actually emits (separate halo buffers, per-buffer lane padding).
STAGE_SHAPES = [
    ("tiny-smoke", 1, 8, 16, 16, 8, 8, True, 0),
    ("patch-l2", 1, 32, 32, 32, 256, 256, True, 0),
    ("patch-l1", 1, 64, 64, 64, 128, 128, True, 0),
    ("bucket-l1-gn", 1, 80, 96, 80, 128, 128, True, 0),
    ("patch-l0-bn", 1, 128, 128, 128, 32, 32, True, 0),
    ("bucket-l0-gn64", 1, 160, 192, 160, 64, 64, True, 0),
    ("bucket-l0-bn-concat", 1, 160, 192, 160, 64, 32, True, 32),  # BN decoder [up|skip]
    ("bucket-l0-concat", 1, 160, 192, 160, 128, 64, True, 64),
    # batched sliding-window TTA shapes (per-sample stats path)
    ("tta-batch8-bn-l0", 8, 128, 128, 128, 32, 32, False, 0),
    ("tta-batch8-gn-l1", 8, 64, 64, 64, 128, 128, True, 0),
]

UPCONV_SHAPES = [
    ("up-smoke", 8, 16, 16, 16, 8),
    ("up-patch-l1", 64, 64, 64, 64, 32),
    ("up-bucket-l0", 80, 96, 80, 64, 32),
]

#: (shape_name, strategy) pairs that HUNG the Mosaic compiler on real TPU —
#: a hang wedges the shared remote compile service for every process, so
#: unattended captures must never re-poke these (round 3: the 'lanes'
#: out-block at W=80 hung >420 s; W∈{16,64} compiled in <1 s).
UPCONV_KNOWN_HANGS = {("up-bucket-l0", "lanes")}

#: stage shapes whose Mosaic compile is NONDETERMINISTICALLY hang-prone:
#: bucket-l0-bn-concat compiled in 1.6 s once (round 3, 23:05) and then
#: hung >420 s twice on identical source (01:05, 01:39), wedging the
#: shared compile service each time.  Skipped in unattended runs; poke
#: only interactively with the service health monitored.
STAGE_KNOWN_HANGS = {"bucket-l0-bn-concat", "bucket-l0-concat"}

_CHILD_STAGE = r"""
import json, sys, time
import numpy as np, jax, jax.numpy as jnp
from braintpu.ops.stage_pallas import conv_stage, conv_stage_supported
spec = json.loads(sys.argv[1])
name, N, D, H, W, ci, co, stats = spec[:8]
ci2 = spec[8] if len(spec) > 8 else 0
ci1 = ci - ci2
shape = (N, D, H, W, ci1)
if not conv_stage_supported(shape, co, ci2=ci2):
    print(json.dumps({"probe": f"stage:{name}", "ok": False,
                      "skip": "unsupported shape"}))
    sys.exit(0)
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=shape).astype(np.float32)).astype(jnp.bfloat16)
x2 = None
if ci2:
    x2 = jnp.asarray(rng.normal(size=(N, D, H, W, ci2)).astype(np.float32)).astype(jnp.bfloat16)
w = jnp.asarray(rng.normal(size=(3, 3, 3, ci, co)).astype(np.float32)) * 0.05
b = jnp.zeros((co,), jnp.float32)
t0 = time.time()
out = conv_stage(x, w, b, x2=x2, out_slope=0.01, stats=stats)
jax.block_until_ready(out)
compile_s = time.time() - t0
t0 = time.time()
for _ in range(3):
    out = conv_stage(x, w, b, x2=x2, out_slope=0.01, stats=stats)
jax.block_until_ready(out)
run_s = (time.time() - t0) / 3
y = out[0] if stats else out
ok = bool(jnp.isfinite(jnp.sum(y.astype(jnp.float32))))
flops = 2 * N * D * H * W * 27 * ci * co
print(json.dumps({"probe": f"stage:{name}", "ok": ok,
                  "compile_s": round(compile_s, 1),
                  "run_s": round(run_s, 4),
                  "tflops": round(flops / run_s / 1e12, 1)}))
"""

_CHILD_SMOKE = r"""
import json, time
import jax, jax.numpy as jnp
# tiny CACHED matmul: the recommended liveness probe for both a
# half-attached relay (listeners up, dead backend) and a wedged remote
# compile service — either one hangs here and the child gets killed.
t0 = time.time()
x = jnp.ones((128, 128), jnp.bfloat16)
y = jnp.dot(x, x)
jax.block_until_ready(y)
print(json.dumps({"probe": "smoke", "ok": bool(float(y[0, 0]) == 128.0),
                  "seconds": round(time.time() - t0, 1),
                  "device": str(jax.devices()[0])}))
"""

_CHILD_STAGE_PARITY = r"""
import json, sys
import numpy as np, jax.numpy as jnp
from braintpu.ops.stage_pallas import conv_stage, _xla_reference, conv_stage_supported
# exact-arithmetic parity ON TPU (interpret-mode exactness already proven)
rng = np.random.default_rng(0)
D, H, W, ci, co = 8, 16, 16, 8, 8
x = jnp.asarray(rng.integers(-3, 4, (1, D, H, W, ci)).astype(np.float32)).astype(jnp.bfloat16)
w = jnp.asarray((2.0 ** rng.integers(-3, 0, (3, 3, 3, ci, co)) *
                 rng.choice([-1, 1], (3, 3, 3, ci, co))).astype(np.float32))
b = jnp.asarray(rng.integers(-3, 4, (co,)).astype(np.float32))
y, s1, s2 = conv_stage(x, w, b, out_slope=None, stats=True)
cfgd = dict(in1_affine=False, in1_slope=None, in2_affine=False,
            in2_slope=None, out_slope=None)
ry, rs1, rs2 = _xla_reference(x, None, w, b, None, None, None, None, cfgd)
exact = bool(np.array_equal(np.asarray(y, np.float32), np.asarray(ry, np.float32)))
s_ok = bool(np.allclose(np.asarray(s1), np.asarray(rs1), rtol=1e-4) and
            np.allclose(np.asarray(s2), np.asarray(rs2), rtol=1e-3))
print(json.dumps({"probe": "stage:tpu-parity", "ok": exact and s_ok,
                  "exact_y": exact, "stats_ok": s_ok}))
"""

_CHILD_UPCONV = r"""
import json, sys, time
import numpy as np, jax, jax.numpy as jnp
from braintpu.ops.upconv_pallas import upconv2x, upconv2x_supported
import braintpu.models.unet3d as u3
name, D, H, W, ci, co, strategy = json.loads(sys.argv[1])
shape = (1, D, H, W, ci)
if not upconv2x_supported(shape, co):
    print(json.dumps({"probe": f"upconv:{name}:{strategy}", "ok": False,
                      "skip": "unsupported"}))
    sys.exit(0)
rng = np.random.default_rng(0)
x = jnp.asarray(rng.integers(-3, 4, shape).astype(np.float32)).astype(jnp.bfloat16)
w = jnp.asarray((2.0 ** rng.integers(-3, 0, (ci, 2, 2, 2, co))).astype(np.float32))
t0 = time.time()
got = upconv2x(x, w, strategy=strategy)
jax.block_until_ready(got)
compile_s = time.time() - t0
ref = u3._upconv(x, w, jnp.float32)
exact = bool(np.array_equal(np.asarray(got, np.float32), np.asarray(ref, np.float32)))
t0 = time.time()
for _ in range(5):
    got = upconv2x(x, w, strategy=strategy)
jax.block_until_ready(got)
run_s = (time.time() - t0) / 5
print(json.dumps({"probe": f"upconv:{name}:{strategy}", "ok": exact,
                  "compile_s": round(compile_s, 1), "run_s": round(run_s, 4)}))
"""

_CHILD_FULLCONV = r"""
import json, sys, time
import numpy as np, jax, jax.numpy as jnp
from braintpu.infer.fullconv import fullconv_predict
from braintpu.infer.sliding_window import stack_folds
from braintpu.models import MODEL1_BN, MODEL2_GN_LARGE, init_params, fold_batchnorm
which, mirrors = json.loads(sys.argv[1])
cfg = MODEL1_BN if which == "bn" else MODEL2_GN_LARGE
folded = cfg.norm == "batch"
folds = []
for f in range(5):
    p = init_params(cfg, jax.random.PRNGKey(f))
    folds.append(fold_batchnorm(p, cfg) if folded else p)
stacked = stack_folds(folds)
rng = np.random.default_rng(0)
vol = jnp.asarray(rng.normal(size=(192, 192, 160, 4)).astype(np.float32))
t0 = time.time()
probs = fullconv_predict(stacked, vol, cfg, num_mirror=mirrors, folded=folded)
jax.block_until_ready(probs)
warm = time.time() - t0
import contextlib, os
trace_root = os.environ.get("BRAINTPU_PROBE_TRACE_DIR")
trace_dir = None
ctx = contextlib.nullcontext()
if trace_root:
    fused = os.environ.get("BRAINTPU_FUSED_STAGES", "0")
    trace_dir = os.path.join(trace_root, f"fullconv_{which}_m{mirrors}_fused{fused}")
    ctx = jax.profiler.trace(trace_dir)
times = []
with ctx:
    for _ in range(3):
        t0 = time.time()
        probs = fullconv_predict(stacked, vol, cfg, num_mirror=mirrors, folded=folded)
        jax.block_until_ready(probs)
        times.append(time.time() - t0)
rec = {"probe": f"fullconv:{which}:m{mirrors}", "ok": True,
       "warm_s": round(warm, 1),
       "steady_s": round(float(np.median(times)), 3),
       "fused": os.environ.get("BRAINTPU_FUSED_STAGES", "0")}
if trace_dir:
    rec["trace_dir"] = trace_dir  # analyze: braintpu profile-report <dir>
    try:
        from braintpu.utils.xprof import aggregate_trace, format_table, latest_xplane
        xp = latest_xplane(trace_dir)
        if xp:
            top = format_table(aggregate_trace(xp), top=12)
            for line in top.splitlines():
                print("#", line, file=sys.stderr)
    except Exception as e:  # trace parsing is best-effort
        print(f"# trace parse failed: {e}", file=sys.stderr)
print(json.dumps(rec))
"""


sys.path.insert(0, REPO)
from braintpu._relay import relay_up  # noqa: E402  (stdlib-only module)


def run_child(code: str, arg, timeout: float, env_extra=None, name: str = "") -> dict:
    # `name` labels FAILURE records (no-output crash / timeout): probes that
    # take no positional arg previously stringified it as probe="None",
    # making Mosaic-hang entries unattributable (ADVICE r3)
    name = name or str(arg)
    env = dict(os.environ)
    env.update(env_extra or {})
    t0 = time.time()
    try:
        p = subprocess.run(
            [sys.executable, "-c", code, json.dumps(arg)],
            cwd=REPO, env=env, capture_output=True, text=True, timeout=timeout,
        )
        recs = _json_lines(p.stdout)
        if recs:
            rec = recs[-1]
            # keep diagnostic output (e.g. the fullconv probe's per-op
            # trace table) in the session log
            if p.stderr and p.stderr.strip():
                rec["stderr_tail"] = p.stderr[-2000:]
        else:
            err = p.stderr or ""
            if len(err) > 4000:  # keep the head (the MLIR op + message)
                err = err[:3000] + "\n...[truncated]...\n" + err[-1000:]
            rec = {"probe": name, "ok": False, "rc": p.returncode,
                   "stderr": err}
            recs = [rec]
    except subprocess.TimeoutExpired as e:
        # salvage any result lines the child flushed before the hang —
        # multi-shape probes (int8) print one record per shape
        out = e.stdout
        if isinstance(out, bytes):
            out = out.decode(errors="replace")
        recs = _json_lines(out)
        rec = {"probe": name, "ok": False,
               "error": f"TIMEOUT after {timeout}s (possible Mosaic hang — "
                        "do NOT retry the same shape; fix offline)"}
        recs.append(rec)
    rec["wall_s"] = round(time.time() - t0, 1)
    with open(LOG, "a") as f:
        for r in recs:  # every record, not just the last
            f.write(json.dumps(r) + "\n")
    print(json.dumps(rec), flush=True)
    return rec


def _json_lines(stdout) -> list:
    recs = []
    for ln in (stdout or "").splitlines():
        ln = ln.strip()
        if ln.startswith("{"):
            try:
                recs.append(json.loads(ln))
            except ValueError:
                pass
    return recs


_CHILD_INT8 = r"""
import json, sys, time
import numpy as np, jax, jax.numpy as jnp
from braintpu.ops.int8_probe import int8_matmul, xla_int8_matmul
rng = np.random.default_rng(0)

def bench(M, K, N, bm, bn, bk, label):
    # one call must be >=100 ms device time or tunnel timing lies
    # (axon-tunnel gotchas): run R GEMMs inside ONE jitted fori_loop,
    # serialized by a scalar dependency on the accumulator (loop-invariant
    # code motion would hoist a truly constant dot out of the loop).
    flops = 2 * M * K * N
    R = max(4, min(20000, int(6e12 // flops) + 1))
    x = jnp.asarray(rng.integers(-127, 128, (M, K)).astype(np.int8))
    y = jnp.asarray(rng.integers(-127, 128, (K, N)).astype(np.int8))
    out = {}

    def loop_with(dot):
        def body(i, acc):
            yv = y + (acc[0, 0] % 2).astype(jnp.int8)  # tiny K*N dependency
            return acc + dot(x, yv)
        return jax.jit(lambda: jax.lax.fori_loop(
            0, R, body, jnp.zeros((M, N), jnp.int32)))

    fns = {
        "pallas": loop_with(lambda a, b: int8_matmul(a, b, bm=bm, bn=bn, bk=bk)),
        "xla": loop_with(xla_int8_matmul),
    }
    for name, fn in fns.items():
        r = fn(); jax.block_until_ready(r)  # compile
        t0 = time.time()
        r = fn()
        jax.block_until_ready(r)
        dt = (time.time() - t0) / R
        out[name + "_tops"] = round(flops / dt / 1e12, 1)
    ok = bool(jnp.array_equal(int8_matmul(x, y, bm=bm, bn=bn, bk=bk),
                              xla_int8_matmul(x, y)))
    print(json.dumps({"probe": f"int8:{label}", "ok": ok, "loop_reps": R,
                      **out}), flush=True)

# square peak-rate probe
bench(4096, 4096, 4096, 512, 512, 512, "4096cube")
# REAL stage-GEMM shapes (rows = RS*W per chunk; K = 9*ci im2col;
# N = 3*co tap-merged; both padded to lane tiles): decides whether an
# int8 conv path could beat bf16 at the shapes that actually matter.
# l0 BN (ci=co=32 @ W=192, RS=16): (3072, 288) x (288, 96)
bench(3072, 384, 128, 128, 128, 128, "stage-l0-bn")
# l0 GN concat (ci=128, co=64 @ W=192): (3072, 1152) x (1152, 192)
bench(3072, 1152, 256, 128, 256, 384, "stage-l0-gn-concat")
# l1 (ci=co=128 @ W=96, RS=16): (1536, 1152) x (1152, 384)
bench(1536, 1152, 384, 128, 384, 384, "stage-l1")
"""


_CHILD_FEATURES = r"""
import json, sys, time
import numpy as np, jax
from braintpu.features.devstats import (
    compute_case_stats, compute_mass_effect_stats, compute_artifact_stats,
    compute_morphology_stats, compute_parenchyma_stats,
)
# production cropped-brain scale: are the device feature kernels worth
# defaulting on through the dispatch tunnel?  (upload cost vs host math)
rng = np.random.default_rng(0)
shape = (180, 200, 150)
mods = {m: np.abs(rng.normal(300 + 40 * i, 80, shape)).astype(np.float32)
        for i, m in enumerate(("t1", "t1ce", "t2", "flair"))}
seg = np.zeros(shape, np.int32)
seg[60:100, 80:130, 60:100] = 2
seg[70:90, 95:120, 70:90] = 1
seg[75:85, 100:110, 75:85] = 3
brain = mods["t1"] > 50
wt = seg > 0
out = {}
for name, fn in (
    ("case", lambda: compute_case_stats(mods, seg, brain)),
    ("mass", lambda: compute_mass_effect_stats(mods["t1"], wt, brain)),
    ("artifact", lambda: compute_artifact_stats(mods, brain, wt)),
    ("morph", lambda: compute_morphology_stats(mods["t1ce"], wt)),
    ("paren", lambda: compute_parenchyma_stats(
        mods["t1"], mods["flair"], brain, wt)),
):
    t0 = time.time(); fn(); warm = time.time() - t0
    t0 = time.time(); fn(); out[name + "_s"] = round(time.time() - t0, 3)
    out[name + "_compile_s"] = round(warm, 1)
print(json.dumps({"probe": "features:180x200x150", "ok": True, **out}))
"""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "what",
        choices=["relay", "smoke", "stage", "upconv", "fullconv", "int8",
                 "features", "all"],
    )
    ap.add_argument("--timeout", type=float, default=420.0)
    ap.add_argument("--fused", action="store_true",
                    help="fullconv probes with BRAINTPU_FUSED_STAGES=1")
    ap.add_argument(
        "--watch", type=float, default=0.0, metavar="HOURS",
        help="poll for the relay up to HOURS before starting; run the "
        "probes as soon as it appears (one shot), so a brief tunnel "
        "window is never missed",
    )
    args = ap.parse_args()

    deadline = time.time() + args.watch * 3600.0
    while not relay_up():
        if time.time() >= deadline:
            print(json.dumps({"probe": "relay", "ok": False}))
            return 2
        time.sleep(30.0)
    print(json.dumps({"probe": "relay", "ok": True}))
    if args.what == "relay":
        return 0

    ok = True
    hung = False

    def recovered() -> bool:
        """After a probe timeout (possible Mosaic hang that wedges the
        SHARED remote compile service), verify liveness with a smoke child
        before any further section — otherwise each subsequent probe burns
        its full timeout and emits a record that misreads as 'kernel
        rejected' rather than 'service wedged'."""
        nonlocal hung
        if not hung:
            return True
        rec = run_child(_CHILD_SMOKE, None, 240.0, name="smoke")
        hung = not rec.get("ok")
        return not hung

    if args.what in ("smoke", "all"):
        rec = run_child(_CHILD_SMOKE, None, min(args.timeout, 240.0), name="smoke")
        if args.what == "smoke":
            return 0 if rec.get("ok") else 1
        if not rec.get("ok"):
            return 1  # device not live — don't escalate to real probes
    if args.what in ("stage", "all"):
        run_child(_CHILD_STAGE_PARITY, None, args.timeout, name="stage:tpu-parity")
        for spec in STAGE_SHAPES:
            if spec[0] in STAGE_KNOWN_HANGS:
                continue
            rec = run_child(_CHILD_STAGE, spec, args.timeout, name=f"stage:{spec}")
            if "error" in rec:  # hang — stop escalating shapes
                ok = False
                hung = True
                break
    if args.what in ("upconv", "all") and recovered():
        for strategy in ("lanes", "reshape", "select"):
            if hung:  # a timeout = possible Mosaic hang; the other strategy
                break  # would re-poke the same wedged compile service
            for spec in UPCONV_SHAPES:
                if (spec[0], strategy) in UPCONV_KNOWN_HANGS:
                    continue
                rec = run_child(_CHILD_UPCONV, list(spec) + [strategy], args.timeout,
                                name=f"upconv:{spec}:{strategy}")
                if "error" in rec:
                    ok = False
                    hung = True
                    break
    if args.what in ("int8", "all") and recovered():
        run_child(_CHILD_INT8, None, args.timeout, name="int8")
    if args.what in ("features", "all") and recovered():
        run_child(_CHILD_FEATURES, None, max(args.timeout, 600.0), name="features")
    if args.what in ("fullconv", "all") and recovered():
        env = {"BRAINTPU_FUSED_STAGES": "1"} if args.fused else {}
        for which in ("bn", "gn"):
            for mirrors in (1, 8):
                run_child(_CHILD_FULLCONV, [which, mirrors],
                          max(args.timeout, 900.0), env,
                          name=f"fullconv:{which}:m{mirrors}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
