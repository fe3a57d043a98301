"""Split the fresh-process first-predict cost into trace / compile-or-load / run.

coldstart_attr.py measured first_predict = 277-279 s in a fresh process with
every program a persistent-cache HIT (no new jit_fullconv_predict entries
were written) — so the cost is NOT XLA recompilation.  This probe isolates
where a cache-hit dispatch of the big ensemble program spends its time, per
model, using jax's AOT API:

    lowered  = jax.jit(...).lower(args)     # pure host tracing
    compiled = lowered.compile()            # cache lookup + deserialize +
                                            # device program load (remote)
    first run                               # data upload + execute
    second run                              # steady floor

Appends one record to tools/coldstart_attr.jsonl (kind=coldprobe).

Usage: python tools/coldprobe.py [--folds 5]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--folds", type=int, default=5)
    ap.add_argument("--bucket", default="192,192,160")
    ap.add_argument("--no-cache", action="store_true")
    ap.add_argument("--out", type=Path, default=REPO / "tools" / "coldstart_attr.jsonl")
    args = ap.parse_args()
    bucket = tuple(int(s) for s in args.bucket.split(","))

    import jax
    if not args.no_cache:
        from braintpu.utils.compcache import enable_compilation_cache
        enable_compilation_cache()

    import numpy as np
    from braintpu.infer import ModelBundle
    from braintpu.infer.fullconv import fullconv_predict
    from braintpu.models import MODEL1_BN, MODEL2_GN_LARGE, init_params

    spans = {}
    rec = {"kind": "coldprobe", "bucket": list(bucket), "folds": args.folds,
           "cache": not args.no_cache, "spans": spans}
    data = np.ones(bucket + (4,), np.float32)  # channels-last, engine layout
    import jax.numpy as jnp

    for name, cfg in (("model1", MODEL1_BN), ("model2", MODEL2_GN_LARGE)):
        t = time.perf_counter()
        folds = [init_params(cfg, jax.random.PRNGKey(i)) for i in range(args.folds)]
        bundle = ModelBundle.from_folds(cfg, folds, name=name)
        spans[f"{name}_build_s"] = round(time.perf_counter() - t, 2)

        vol = jnp.asarray(data)
        # the PRODUCTION jitted program (same static args as the engine)
        t = time.perf_counter()
        lowered = fullconv_predict.lower(
            bundle.params_stacked, vol, cfg, num_mirror=8, folded=bundle.folded
        )
        spans[f"{name}_trace_s"] = round(time.perf_counter() - t, 2)
        t = time.perf_counter()
        compiled = lowered.compile()
        spans[f"{name}_compile_or_load_s"] = round(time.perf_counter() - t, 2)
        t = time.perf_counter()
        jax.block_until_ready(compiled(bundle.params_stacked, vol))
        spans[f"{name}_first_run_s"] = round(time.perf_counter() - t, 2)
        t = time.perf_counter()
        jax.block_until_ready(compiled(bundle.params_stacked, vol))
        spans[f"{name}_second_run_s"] = round(time.perf_counter() - t, 2)
        print(f"# {name}: {json.dumps({k: v for k, v in spans.items() if k.startswith(name)})}",
              file=sys.stderr, flush=True)

    rec["ts"] = time.time()
    print(json.dumps(rec, indent=1))
    with open(args.out, "a") as f:
        f.write(json.dumps(rec) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
