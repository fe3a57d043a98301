"""Quantify the fullconv↔sliding semantics delta at full BraTS scale.

The sliding-window recipe is the bit-parity nnU-Net path; fullconv is the
production default (whole-volume fully-convolutional forward, ~2.8× fewer
FLOPs because the 50 %-overlap patch redundancy disappears).  Their
documented semantic differences (infer/fullconv.py:18-30: whole-volume
GroupNorm statistics, full border context, no Gaussian blending) need a
measured full-scale answer, not a qualitative one (VERDICT.md round-2
item 3).

For each seed this runs BOTH modes through the SAME dual-model 5-fold
TTA ensemble (random weights — no public checkpoints exist; the delta
between modes is a property of the numerics, not of the weight values)
on a synthetic BraTS-geometry case, then reports:

* voxel agreement of the final label maps,
* per-region (WT/TC/ET) Dice between the two modes' outputs,
* per-region volumes under each mode.

Appends one JSON line per seed to tools/mode_delta_results.jsonl.

Usage:  python tools/mode_delta.py [--seeds 3] [--shape 240,240,155]
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

LOG = os.path.join(REPO, "tools", "mode_delta_results.jsonl")


def region_dice(a: np.ndarray, b: np.ndarray) -> dict:
    """WT/TC/ET Dice between two internal-label maps (1=ED, 2=NCR, 3=ET)."""
    out = {}
    for name, labels in (("WT", (1, 2, 3)), ("TC", (2, 3)), ("ET", (3,))):
        ma = np.isin(a, labels)
        mb = np.isin(b, labels)
        denom = int(ma.sum()) + int(mb.sum())
        out[name] = 1.0 if denom == 0 else 2.0 * int((ma & mb).sum()) / denom
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--shape", default="240,240,155")
    ap.add_argument("--models", type=int, default=2)
    ap.add_argument("--folds", type=int, default=5)
    args = ap.parse_args()
    shape = tuple(int(s) for s in args.shape.split(","))

    import jax

    from bench import synthetic_case
    from braintpu.infer import InferenceEngine, ModelBundle
    from braintpu.models import MODEL1_BN, MODEL2_GN_LARGE, init_params
    from braintpu.utils.compcache import enable_compilation_cache

    enable_compilation_cache()

    configs = [MODEL1_BN, MODEL2_GN_LARGE][: args.models]
    bundles = []
    for i, cfg in enumerate(configs):
        folds = [
            init_params(cfg, jax.random.PRNGKey(i * 10 + f))
            for f in range(args.folds)
        ]
        bundles.append(ModelBundle.from_folds(cfg, folds))

    engines = {
        mode: InferenceEngine(models=bundles, tta=True, mode=mode,
                              output_convention="internal")
        for mode in ("fullconv", "sliding")
    }

    for seed in range(args.seeds):
        data = synthetic_case(shape, seed=seed)
        segs, times = {}, {}
        for mode, eng in engines.items():
            t0 = time.perf_counter()
            seg, info = eng.predict_case_array(data)
            times[mode] = round(time.perf_counter() - t0, 2)
            segs[mode] = np.asarray(seg)
        a, b = segs["fullconv"], segs["sliding"]
        rec = {
            "seed": seed,
            "shape": list(shape),
            "voxel_agreement": round(float((a == b).mean()), 6),
            "dice_between_modes": {
                k: round(v, 5) for k, v in region_dice(a, b).items()
            },
            "labels_fullconv": np.unique(a).tolist(),
            "labels_sliding": np.unique(b).tolist(),
            "wall_s": times,
        }
        with open(LOG, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
