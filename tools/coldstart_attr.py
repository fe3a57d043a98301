"""Cold-start attribution: where a fresh process spends its first job.

Round 4 measured a fresh-process full-scale pipeline at 212.6 s wall with a
WARM persistent compile cache — far off the interactive target — but the
119.7 s segmenting span was unattributed (VERDICT r4 item 3).  This tool IS
the fresh process: it times every phase between `python -m braintpu.cli
pipeline <case>` start and the first segmentation result, with explicit
device syncs so each span contains exactly one cost:

  import_jax        first `import jax` (plugin discovery)
  devices           first jax.devices() call (tunnel/PJRT handshake)
  tiny_dispatch     one 256² matmul compile+run (baseline round-trip)
  params            checkpoint load / random init + host fold-stacking
  upload            block_until_ready on the stacked fold weights
                    (device_put is async; this is pure link time)
  engine            InferenceEngine construction
  case_decode       NIfTI decode of the case
  first_predict     predict_case_array #1 — compile-cache hits/misses + run
  second_predict    predict_case_array #2 — the steady-state floor

Appends one JSON record to tools/coldstart_attr.jsonl.

Usage: python tools/coldstart_attr.py [--shape 240,240,155]
       [--checkpoints results/trained_synth/checkpoints] [--models ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

T0 = time.perf_counter()
_spans = {}


def mark(name: str, t_start: float) -> None:
    _spans[name] = round(time.perf_counter() - t_start, 2)
    print(f"# {name}: {_spans[name]}s", file=sys.stderr, flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="240,240,155")
    ap.add_argument("--models", default=None, help="comma list (default model1,model2)")
    ap.add_argument("--folds", type=int, default=5)
    ap.add_argument("--checkpoints", default=None)
    ap.add_argument("--no-cache", action="store_true",
                    help="skip the persistent compile cache (truly cold compile)")
    ap.add_argument("--out", type=Path, default=REPO / "tools" / "coldstart_attr.jsonl")
    args = ap.parse_args()
    shape = tuple(int(s) for s in args.shape.split(","))

    t = time.perf_counter()
    import jax
    mark("import_jax", t)

    if not args.no_cache:
        from braintpu.utils.compcache import enable_compilation_cache
        cache_dir = Path(enable_compilation_cache())
        cache_before = len(list(cache_dir.glob("*")))
    else:
        cache_before = -1

    t = time.perf_counter()
    dev = jax.devices()[0]
    mark("devices", t)

    t = time.perf_counter()
    import jax.numpy as jnp
    x = jnp.ones((256, 256))
    jax.block_until_ready(x @ x)
    mark("tiny_dispatch", t)

    t = time.perf_counter()
    import numpy as np
    from types import SimpleNamespace
    from braintpu.cli import load_engine
    # random_weights=True lets members without an npz fall back to random
    # init — but a mistyped --checkpoints must fail loudly, not silently
    # measure all-random weights under a trained label (ADVICE r4; same
    # guard as tools/pipeline_meas.py)
    trained_members = (
        sorted(p.parent.name for p in Path(args.checkpoints).glob("*/fold_0.npz"))
        if args.checkpoints else []
    )
    if args.checkpoints and not trained_members:
        raise SystemExit(
            f"--checkpoints {args.checkpoints!r} contains no */fold_0.npz — "
            "refusing to attribute a cold start with all-random weights "
            "under a trained label"
        )
    eng_args = SimpleNamespace(
        models=args.models, folds=args.folds, no_tta=False, ensemble="softmax",
        no_et_postprocess=False, random_weights=True,
        checkpoints=args.checkpoints,
        mode="fullconv", dp_devices=0, spatial_shard=False,
    )
    engine = load_engine(eng_args)
    mark("params_and_engine", t)  # load/init + host stack + device_put dispatch

    t = time.perf_counter()
    nbytes = 0
    for m in engine.models:
        for leaf in jax.tree_util.tree_leaves(m.params_stacked):
            jax.block_until_ready(leaf)
            nbytes += leaf.nbytes
    mark("upload_block", t)
    _spans["upload_mbytes"] = round(nbytes / 1e6, 1)

    t = time.perf_counter()
    from bench import synthetic_case
    data = synthetic_case(shape)
    mark("case_synth", t)

    t = time.perf_counter()
    seg, info = engine.predict_case_array(data)
    mark("first_predict", t)
    _spans["first_predict_device_s"] = round(float(info.get("predict_s") or 0), 2)

    t = time.perf_counter()
    engine.predict_case_array(data)
    mark("second_predict", t)

    _spans["total_s"] = round(time.perf_counter() - T0, 2)
    rec = {
        "shape": list(shape),
        "models": args.models or "model1,model2",
        "folds": args.folds,
        "weights": args.checkpoints or "random",
        "trained_members": trained_members,
        "cache_entries_before": cache_before,
        "device": str(dev),
        "spans": _spans,
        "ts": time.time(),
    }
    print(json.dumps(rec, indent=1))
    with open(args.out, "a") as f:
        f.write(json.dumps(rec) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
