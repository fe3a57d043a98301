"""Per-step wall-clock profile of host feature extraction at full scale.

The full-pipeline budget (VERDICT round-2 item 4) is segmentation +
features + report; host feature extraction measured ~15.8 s/case in
round 2 and is the largest non-segmentation cost.  This breaks it down
per step (and per hot helper) on a synthetic BraTS-geometry case so
optimization lands where the time is.

Usage:  python tools/feature_prof.py [--shape 240,240,155]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="240,240,155")
    ap.add_argument(
        "--device", nargs="?", const="1", default=None,
        help="run with BRAINTPU_DEVICE_FEATURES=<value> (default '1' = all "
        "groups; pass e.g. 'artifacts,parenchyma' for the hybrid routing); "
        "runs a warm pass first so steady numbers exclude jit compiles",
    )
    ap.add_argument("--repeat", type=int, default=1,
                    help="steady-state passes (fresh context each, min taken)")
    args = ap.parse_args()
    shape = tuple(int(s) for s in args.shape.split(","))
    if args.device:
        os.environ["BRAINTPU_DEVICE_FEATURES"] = args.device
    else:
        os.environ["BRAINTPU_DEVICE_FEATURES"] = "0"  # pin: 'auto' default

    from bench import synthetic_case

    data = synthetic_case(shape)
    rng = np.random.default_rng(0)
    # a plausible multi-region segmentation inside the brain
    seg = np.zeros(shape, np.int16)
    c = tuple(s // 2 for s in shape)
    seg[c[0] - 30 : c[0] + 10, c[1] - 25 : c[1] + 25, c[2] - 20 : c[2] + 20] = 2
    seg[c[0] - 20 : c[0], c[1] - 15 : c[1] + 15, c[2] - 10 : c[2] + 10] = 1
    seg[c[0] - 15 : c[0] - 5, c[1] - 8 : c[1] + 8, c[2] - 5 : c[2] + 5] = 3

    mods = {m: data[i] for i, m in enumerate(("t1", "t1ce", "t2", "flair"))}

    from braintpu.features.context import FeatureContext

    t0 = time.perf_counter()
    ctx = FeatureContext(
        case_id="PROF-00000",
        modalities={k: v.astype(np.float32) for k, v in mods.items()},
        seg=seg.astype(np.int32),
        affine=np.eye(4),
        zooms=(1.0, 1.0, 1.0),
    )
    t_ctx = time.perf_counter() - t0

    steps = []
    from braintpu.features import (
        step1_signals, step2_mass_effect, step3_multiplicity,
        step4_morphology, step5_quality, step6_normal_structures,
    )

    mapping = [
        ("step1_signals", step1_signals.analyze_sequence_findings),
        ("step2_mass_effect", step2_mass_effect.analyze_mass_effect),
        ("step3_multiplicity", step3_multiplicity.analyze_multiplicity),
        ("step4_morphology", step4_morphology.analyze_morphology),
        ("step5_quality", step5_quality.analyze_quality),
        ("step6_normal", step6_normal_structures.analyze_normal_structures),
    ]
    def fresh_ctx():
        return FeatureContext(
            case_id="PROF-00000",
            modalities={k: v.astype(np.float32) for k, v in mods.items()},
            seg=seg.astype(np.int32),
            affine=np.eye(4),
            zooms=(1.0, 1.0, 1.0),
        )

    def one_pass(c):
        res = {}
        t0 = time.perf_counter()
        c.start_device_upload()  # overlap transfer with host steps (no-op on host path)
        res["upload_kickoff_s"] = round(time.perf_counter() - t0, 3)
        for name, fn in mapping:
            t0 = time.perf_counter()
            try:
                fn(c)
                res[name + "_s"] = round(time.perf_counter() - t0, 3)
            except Exception as e:  # profile must not die on one step
                res[name + "_err"] = f"{type(e).__name__}: {e}"
        res["total_s"] = round(
            sum(v for k, v in res.items() if isinstance(v, float)), 2
        )
        return res

    out = {"context_s": round(t_ctx, 3),
           "path": f"device:{args.device}" if args.device else "host"}
    if args.device:
        warm = one_pass(ctx)  # first pass pays devstats jit compiles
        out["warm_total_s"] = warm["total_s"]
    passes = [one_pass(fresh_ctx() if (args.device or i) else ctx)
              for i in range(max(1, args.repeat))]
    best = min(passes, key=lambda p: p.get("total_s", 1e9))
    out.update(best)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
