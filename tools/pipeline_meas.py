"""Measure the multi-case pipeline overlap (VERDICT r3 item 1b).

Compares warm per-case latency of the strictly-sequential pipeline
(`Pipeline.run_case` in a loop — the reference's shape,
/root/reference/run_full_pipeline.py:460-623) against the overlapped
`Pipeline.run_cases` (case N host stages run while case N+1 segments on
device) on identical full-scale synthetic cases.

Prints one JSON object; appends it to tools/pipeline_meas_results.jsonl.

Usage: python tools/pipeline_meas.py [--cases 4] [--shape 240,240,155]
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time
from pathlib import Path
from types import SimpleNamespace

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def stage_spans(events) -> dict:
    spans, starts = {}, {}
    for e in events:
        if e.status == "start" and "step" not in e.detail:
            starts[e.stage] = e.t
        elif e.status in ("ok", "skip") and e.stage in starts:
            spans[e.stage] = round(e.t - starts.pop(e.stage), 2)
            # sub-span instrumentation (r5): per-feature-step spans on the
            # extracting event, gt-join/normalize/dice on evaluating,
            # decode/preprocess/predict on segmenting
            detail = {
                k: v for k, v in e.detail.items()
                if k.endswith("_s") or k == "step_spans"
            }
            if detail:
                spans[e.stage + "_detail"] = detail
    return spans


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", type=int, default=4)
    ap.add_argument("--shape", default="240,240,155")
    ap.add_argument("--out", type=Path, default=REPO / "tools" / "pipeline_meas_results.jsonl")
    ap.add_argument("--models", default=None, help="comma list (default model1,model2)")
    ap.add_argument("--folds", type=int, default=5)
    ap.add_argument("--runs", type=int, default=3,
                    help="repeat the overlapped measurement N times (min/median "
                    "reported; the steady mean of one 4-case run is too thin a "
                    "basis for the headline — VERDICT r4 item 7)")
    ap.add_argument("--seq-runs", type=int, default=1,
                    help="repeat the sequential baseline N times")
    ap.add_argument("--checkpoints", default=None, help="checkpoint root (model{1,2}/fold_N.npz)")
    ap.add_argument(
        "--replicate-folds", action="store_true",
        help="with --checkpoints: symlink each model's fold_0.npz to folds 1..N-1 "
        "so a single trained fold exercises the full-ensemble device cost",
    )
    args = ap.parse_args()
    shape = tuple(int(s) for s in args.shape.split(","))

    from braintpu.utils.compcache import enable_compilation_cache

    enable_compilation_cache()

    from braintpu.cli import load_engine
    from braintpu.pipeline import Pipeline, PipelineConfig
    from braintpu.train.synthetic import write_synth_case

    # shape-keyed so stale cases from a different --shape never leak in
    case_root = Path(f"/tmp/braintpu_pmeas_{'x'.join(map(str, shape))}")
    folders = []
    for i in range(args.cases):
        cid = f"BraTS-PM-{i:05d}-000"
        if not (case_root / cid).exists():
            write_synth_case(case_root, cid, seed=50 + i, shape=shape)
        folders.append(case_root / cid)

    ckpt_root = args.checkpoints
    if ckpt_root and args.replicate_folds:
        src = Path(ckpt_root).resolve()
        rep = Path("/tmp/braintpu_pmeas_ckpt")
        # recreate per run: stale symlinks from a previous invocation against
        # a different --checkpoints root must never silently survive (ADVICE r4)
        shutil.rmtree(rep, ignore_errors=True)
        for model_dir in sorted(p for p in src.iterdir() if p.is_dir()):
            fold0 = model_dir / "fold_0.npz"
            if not fold0.exists():
                continue  # model without a trained fold: leave absent → random init
            dst = rep / model_dir.name
            dst.mkdir(parents=True, exist_ok=True)
            for f in range(args.folds):
                (dst / f"fold_{f}.npz").symlink_to(fold0)
        ckpt_root = str(rep)

    # random_weights=True together with --checkpoints: models with an npz on
    # disk load it, models without fall back to random init (perf is
    # weight-independent; the softmax ensemble output stays realistic as long
    # as one member is trained — its saturated probabilities dominate the
    # argmax).  The record below says exactly which members were trained.
    eng_args = SimpleNamespace(
        models=args.models, folds=args.folds, no_tta=False, ensemble="softmax",
        no_et_postprocess=False, random_weights=True,
        checkpoints=ckpt_root,
        mode="fullconv", dp_devices=0, spatial_shard=False,
    )
    trained_members = (
        sorted(p.parent.name for p in Path(ckpt_root).glob("*/fold_0.npz"))
        if ckpt_root else []
    )
    if args.checkpoints and not trained_members:
        # random_weights=True bypasses load_engine's missing-checkpoint
        # SystemExit — a mistyped --checkpoints path must fail loudly, not
        # silently measure all-random weights (ADVICE r4)
        raise SystemExit(
            f"--checkpoints {args.checkpoints!r} contains no */fold_0.npz — "
            "refusing to measure with all-random weights under a trained label"
        )
    engine = load_engine(eng_args)
    warmup_s = engine.warmup()
    # the generic-bucket warmup may not cover these cases' crop buckets —
    # run one full throwaway pass so BOTH timed modes see warm programs
    t0 = time.perf_counter()
    throwaway = Pipeline(
        engine, PipelineConfig(output_root=Path("/tmp/braintpu_pmeas_warm"), fail_fast=True)
    ).run_cases(folders)
    assert all(r.succeeded for r in throwaway)
    warm_pass_s = time.perf_counter() - t0
    print(f"# warmup {warmup_s:.1f}s, warm pass {warm_pass_s:.1f}s", file=sys.stderr, flush=True)

    def run(mode: str, out_root: Path):
        if out_root.exists():
            shutil.rmtree(out_root)
        pipe = Pipeline(engine, PipelineConfig(output_root=out_root, fail_fast=True))
        walls, t_prev = [], time.perf_counter()
        if mode == "sequential":
            results = []
            for f in folders:
                results.append(pipe.run_case(f))
                walls.append(time.perf_counter() - t_prev)
                t_prev = time.perf_counter()
        else:
            # run_cases yields all at once; per-case walls come from the
            # 'done' event timestamps (epoch seconds) instead
            epoch_start = time.time()
            results = pipe.run_cases(folders)
            ts = [next(e.t for e in r.events if e.stage == "done") for r in results]
            walls = [ts[0] - epoch_start] + [
                ts[i] - ts[i - 1] for i in range(1, len(ts))
            ]
        assert all(r.succeeded for r in results), [r.summary for r in results]
        spans = [stage_spans(r.events) for r in results]
        steady = walls[1:] if len(walls) > 1 else walls
        return {
            "per_case_wall_s": [round(w, 2) for w in walls],
            "steady_mean_s": round(sum(steady) / len(steady), 2),
            "stage_spans": spans,
        }

    seq_runs = [run("sequential", Path("/tmp/braintpu_pmeas_seq"))
                for _ in range(max(1, args.seq_runs))]
    ovl_runs = [run("overlapped", Path("/tmp/braintpu_pmeas_ovl"))
                for _ in range(max(1, args.runs))]
    seq_means = sorted(r["steady_mean_s"] for r in seq_runs)
    ovl_means = sorted(r["steady_mean_s"] for r in ovl_runs)
    rec = {
        "shape": list(shape),
        "n_cases": args.cases,
        "models": args.models or "model1,model2",
        "folds": args.folds,
        "weights": "random" if ckpt_root is None else str(args.checkpoints),
        "trained_members": trained_members,
        "warmup_s": round(warmup_s, 1),
        "warm_pass_s": round(warm_pass_s, 1),
        "sequential": seq_runs[0],
        "overlapped": ovl_runs[0],
        "sequential_steady_means": seq_means,
        "overlapped_steady_means": ovl_means,
        "overlapped_steady_min": ovl_means[0],
        "overlapped_steady_median": ovl_means[len(ovl_means) // 2],
        "ts": time.time(),
    }
    # min-vs-min is symmetric only when both sides have comparable sample
    # counts; with the default single sequential run the ratio inherits
    # that one sample's shared-tunnel luck, so label it as such
    rec["speedup"] = round(seq_means[0] / ovl_means[0], 3)
    rec["speedup_basis"] = (
        f"min of {len(seq_means)} sequential / min of {len(ovl_means)} overlapped"
        + (" (single sequential sample — indicative only)"
           if len(seq_means) == 1 and len(ovl_means) > 1 else "")
    )
    print(json.dumps(rec, indent=1))
    with open(args.out, "a") as f:
        f.write(json.dumps(rec) + "\n")
    shutil.rmtree(Path("/tmp/braintpu_pmeas_warm"), ignore_errors=True)
    shutil.rmtree(Path("/tmp/braintpu_pmeas_seq"), ignore_errors=True)
    shutil.rmtree(Path("/tmp/braintpu_pmeas_ovl"), ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
