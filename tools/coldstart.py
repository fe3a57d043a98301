"""Cold-start measurement: fresh-process `cli pipeline` latency with a warm
persistent XLA compile cache (VERDICT r3 item 6).

The user-facing number this records is "first job after a restart": a NEW
python process (no in-memory jit cache) running the full pipeline on a
full-scale case, with ~/.cache/braintpu/xla already populated by earlier
runs.  Round 3 measured 79.4 s truly cold (empty cache) vs 28.5 s warm
in-process; this tool shows where a restarted server/CLI actually lands.

Runs the pipeline N times, each in a fresh subprocess, and reports the
total + per-stage spans (parsed from events.jsonl) per run.

Usage:  python tools/coldstart.py [--runs 2] [--shape 240,240,155]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def stage_spans(events_path: Path) -> dict:
    """stage → seconds from paired start/ok events (latest pair wins)."""
    spans, starts = {}, {}
    for ln in events_path.read_text().splitlines():
        e = json.loads(ln)
        if e["status"] == "start" and "step" not in e.get("detail", {}):
            starts[e["stage"]] = e["t"]
        elif e["status"] in ("ok", "skip") and e["stage"] in starts:
            spans[e["stage"]] = round(e["t"] - starts.pop(e["stage"]), 2)
    return spans


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--shape", default="240,240,155")
    ap.add_argument("--keep-output", action="store_true")
    ap.add_argument("--out", type=Path, default=REPO / "tools" / "coldstart_results.jsonl")
    ap.add_argument("--case-dir", type=Path, default=None,
                    help="existing case folder to run (default: synthesize one; "
                    "pointing at a case whose crop bucket is already in the "
                    "compile cache isolates process start-up from XLA compile)")
    ap.add_argument("--checkpoints", default=None,
                    help="checkpoint root for trained weights (members without "
                    "an npz fall back to random init); without this the run is "
                    "--random-weights, whose whole-brain tumor makes feature "
                    "extraction a pathological worst case")
    ap.add_argument("--replicate-folds", type=int, default=0,
                    help="symlink each model's fold_0.npz to folds 1..N-1")
    args = ap.parse_args()
    shape = tuple(int(s) for s in args.shape.split(","))

    from braintpu.train.synthetic import write_synth_case

    if args.case_dir is not None:
        case_dir = args.case_dir
        assert case_dir.exists(), case_dir
    else:
        case_root = Path("/tmp/braintpu_coldstart")
        case_dir = case_root / "BraTS-CS-00000-000"
        if not case_dir.exists():
            write_synth_case(case_root, "BraTS-CS-00000-000", seed=7, shape=shape)
    out_root = Path("/tmp/braintpu_coldstart_out")

    ckpt_args = ["--random-weights"]
    if args.checkpoints:
        ckpt_root = Path(args.checkpoints).resolve()
        if args.replicate_folds:
            rep = Path("/tmp/braintpu_coldstart_ckpt")
            # recreate per run: stale symlinks from a previous invocation
            # against a different --checkpoints root (or a dangling link)
            # must never silently change which weights get measured
            shutil.rmtree(rep, ignore_errors=True)
            for model_dir in sorted(p for p in ckpt_root.iterdir() if p.is_dir()):
                fold0 = model_dir / "fold_0.npz"
                if not fold0.exists():
                    continue  # no trained fold: leave absent → random init
                dst = rep / model_dir.name
                dst.mkdir(parents=True, exist_ok=True)
                for f in range(args.replicate_folds):
                    (dst / f"fold_{f}.npz").symlink_to(fold0)
            ckpt_root = rep
        # --random-weights stays: members without an npz fall back to
        # random init (see cli.load_engine) instead of erroring
        ckpt_args += ["--checkpoints", str(ckpt_root)]

    cache = Path.home() / ".cache" / "braintpu" / "xla"
    n_cache = len(list(cache.glob("*"))) if cache.exists() else 0

    records = []
    for run in range(args.runs):
        if out_root.exists():
            shutil.rmtree(out_root)
        t0 = time.time()
        p = subprocess.run(
            [sys.executable, "-m", "braintpu.cli", "pipeline", str(case_dir),
             "--output", str(out_root), "--mode", "fullconv", *ckpt_args],
            cwd=REPO, capture_output=True, text=True, timeout=1800,
        )
        wall = time.time() - t0
        rec = {"run": run, "wall_s": round(wall, 1), "rc": p.returncode,
               "cache_entries_before": n_cache,
               "weights": str(args.checkpoints) if args.checkpoints else "random",
               "case": case_dir.name}
        ev = out_root / case_dir.name / "events.jsonl"
        if ev.exists():
            rec["stage_spans"] = stage_spans(ev)
        if p.returncode != 0:
            rec["stderr_tail"] = p.stderr[-500:]
        print(json.dumps(rec), flush=True)
        # append immediately — a later run wedging on a degraded tunnel
        # (observed: >17 min blocked in device dispatch) must not lose
        # the completed runs when the outer timeout fires
        rec["ts"] = time.time()
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        records.append(rec)
        n_cache = len(list(cache.glob("*"))) if cache.exists() else 0
    if not args.keep_output:
        shutil.rmtree(out_root, ignore_errors=True)
    return 0 if all(r["rc"] == 0 for r in records) else 1


if __name__ == "__main__":
    raise SystemExit(main())
