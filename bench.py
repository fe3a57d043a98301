"""End-to-end benchmark: BraTS case segmentation on one TPU chip.

Measures steady-state wall-clock for the full flagship configuration —
dual-model (BN + GN-large) × 5-fold ensemble, mirror TTA, sliding-window
Gaussian blending — on a synthetic 240×240×155 BraTS-geometry case, and
reports it against the reference pipeline's ~5-6 min CPU segmentation stage
(BASELINE.md; reference README.md:127).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Weights: the committed synthetic-trained checkpoints (results/trained_synth/)
when present, cycled up to the fold count; random init otherwise
(BRAINTPU_BENCH_RANDOM_WEIGHTS=1 forces random).  The reference ships no
public checkpoints; the segmentation headline is weight-independent, but the
pipeline sub-bench's feature stage is representative only under trained
weights (see _bench_pipeline docstring).

Flags:
  --quick        single model, single fold, no TTA (BASELINE config 1)
  --models N     number of models (default 2)
  --folds N      folds per model (default 5)
  --no-tta       disable mirror TTA
  --cases N      timed repetitions (default 3; min is reported)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def synthetic_case(shape=(240, 240, 155), seed=0):
    """Deterministic BraTS-like 4-modality volume with a realistic brain bbox."""
    rng = np.random.default_rng(seed)
    data = np.zeros((4,) + shape, dtype=np.float32)
    zz, yy, xx = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    c = np.array(shape) / 2.0
    brain = (
        ((zz - c[0]) / (shape[0] * 0.36)) ** 2
        + ((yy - c[1]) / (shape[1] * 0.40)) ** 2
        + ((xx - c[2]) / (shape[2] * 0.44)) ** 2
    ) < 1.0
    n = int(brain.sum())
    for ch in range(4):
        # integer-valued like real BraTS int16 NIfTIs — also exercises the
        # half-width (int16) host→device upload fast path
        data[ch][brain] = np.rint(np.clip(rng.normal(600 + 40 * ch, 90, n), 1, None))
    return data


def _fail_record(metric: str, unit: str, error: str) -> str:
    return json.dumps(
        {
            "metric": metric,
            "value": -1.0,
            "unit": unit,
            "vs_baseline": 0.0,
            "detail": {"error": error},
        }
    )


def _preflight_tunnel(metric: str, unit: str, timeout_s: float = 5.0, wait_s: float = 300.0) -> None:
    """Fail (with a machine-readable line) if the TPU tunnel is dead.

    In this environment the axon PJRT plugin blocks all jax work when the
    local relay is down; a hung bench is worse than an explicit error.
    The relay also flaps, so rather than failing on the first probe we
    poll for up to ``wait_s`` (BRAINTPU_BENCH_TUNNEL_WAIT overrides)
    before giving up — round 1's capture was lost to exactly this.
    """
    import os

    from braintpu._relay import relay_configured, relay_up

    if not relay_configured():
        return  # direct TPU or CPU — nothing to probe
    wait_s = float(os.environ.get("BRAINTPU_BENCH_TUNNEL_WAIT", wait_s))
    deadline = time.monotonic() + wait_s

    waited = False
    while True:
        if relay_up(timeout_s):
            if waited:
                print("# tunnel came back; proceeding", file=sys.stderr)
            return
        if time.monotonic() >= deadline:
            break
        if not waited:
            print(
                f"# tpu tunnel down; polling up to {wait_s:.0f}s for the "
                "relay to return",
                file=sys.stderr,
            )
            waited = True
        time.sleep(10.0)
    print(_fail_record(metric, unit, "tpu tunnel unreachable (axon relay down)"))
    raise SystemExit(2)


def _arm_watchdog(total_s: float, metric: str = "brats_case_e2e_seconds", unit: str = "s/case"):
    """Guarantee the driver a parsable result line even if the device hangs.

    A wedged remote compile service (see PERF.md) blocks jax calls
    indefinitely and is uninterruptible from the main thread; this timer
    thread prints the machine-readable failure line and hard-exits so a
    hung bench degrades to an explicit error instead of a driver timeout
    that loses the JSON. Disarm with BRAINTPU_BENCH_WATCHDOG=0.
    """
    import os
    import threading

    total_s = float(os.environ.get("BRAINTPU_BENCH_WATCHDOG", total_s))
    if total_s <= 0:
        return None

    def boom():
        print(
            _fail_record(
                metric, unit,
                f"watchdog: bench exceeded {total_s:.0f}s "
                "(device hang / wedged compile service)",
            ),
            flush=True,
        )
        os._exit(3)

    t = threading.Timer(total_s, boom)
    t.daemon = True
    t.start()
    return t


def _apply_tuned_flags() -> None:
    """Apply opt-in kernel flags that a prior tools/auto_capture.py run
    PROVED on real TPU (compile + exact-arithmetic parity + speed probes).

    The Pallas fast paths (fused stage kernel, fused upconv) default to
    off because an unvalidated Mosaic compile can wedge the shared remote
    compile service in this environment; auto_capture records the flags
    that passed its probes in tools/capture_summary.json, and this picks
    them up so unattended bench runs use the fastest *validated* config.
    Explicit env settings and BRAINTPU_BENCH_NO_TUNED=1 take precedence.
    """
    from braintpu.utils.tuned import apply_validated_flags  # jax-free

    apply_validated_flags(verbose=True)


def _bench_pipeline(engine, n_cases: int = 4, shape=(240, 240, 155)) -> dict:
    """End-to-end pipeline throughput: BraTS folders in → reports out.

    The segmentation headline above measures the in-memory device span;
    the deliverable the ≤10 s/case north star is written against is the
    FULL pipeline (decode → segment → convert → evaluate → features →
    report → PDF).  This runs ``Pipeline.run_cases`` (host/device stage
    overlap) over on-disk synthetic cases and reports the steady per-case
    wall so BENCH_r* tracks the true end-to-end metric (VERDICT r4 item 2).

    One untimed warm pass covers these cases' crop buckets; steady = mean
    of cases 2..N of the timed pass (case 1 has no overlap partner).
    """
    import shutil
    import tempfile
    from pathlib import Path

    from braintpu.pipeline import Pipeline, PipelineConfig
    from braintpu.train.synthetic import write_synth_case

    case_root = Path(tempfile.mkdtemp(prefix="braintpu_benchpipe_"))
    out_root = case_root / "out"
    try:
        folders = []
        for i in range(n_cases):
            cid = f"BraTS-BP-{i:05d}-000"
            write_synth_case(case_root, cid, seed=50 + i, shape=shape)
            folders.append(case_root / cid)
        pipe = Pipeline(engine, PipelineConfig(output_root=out_root, fail_fast=True))
        t0 = time.perf_counter()
        warm = pipe.run_cases(folders)
        warm_s = time.perf_counter() - t0
        assert all(r.succeeded for r in warm)
        print(f"# pipeline warm pass: {warm_s:.1f}s", file=sys.stderr)
        shutil.rmtree(out_root, ignore_errors=True)
        epoch0 = time.time()
        results = pipe.run_cases(folders)
        assert all(r.succeeded for r in results)
        done_ts = [next(e.t for e in r.events if e.stage == "done") for r in results]
        walls = [done_ts[0] - epoch0] + [
            done_ts[i] - done_ts[i - 1] for i in range(1, len(done_ts))
        ]
        steady = walls[1:] if len(walls) > 1 else walls
        steady_s = sum(steady) / len(steady)
        return {
            "pipeline_s_per_case": round(steady_s, 2),
            "pipeline_cases_per_min": round(60.0 / steady_s, 2),
            "per_case_wall_s": [round(w, 2) for w in walls],
            "n_cases": n_cases,
            "warm_pass_s": round(warm_s, 1),
            "stages": "decode+segment+convert+evaluate+features+report+pdf",
        }
    finally:
        shutil.rmtree(case_root, ignore_errors=True)


def _bench_batched(args, engine, data, jax, watchdog=None) -> int:
    """Multi-case throughput: N synthetic cases on disk → cases/min per chip.

    Exercises the full production path — parallel NIfTI decode, prefetch
    overlap, bucketed fixed-shape batching, batched ensemble forward —
    not just the device program.
    """
    import shutil
    import tempfile
    from pathlib import Path

    from braintpu.io import nifti
    from braintpu.io.brats import find_cases

    n_cases = max(args.cases, 2 * args.batch_size)
    root = Path(tempfile.mkdtemp(prefix="braintpu_bench_"))
    try:
        for i in range(n_cases):
            d = root / f"BraTS-BEN-{i:05d}-000"
            d.mkdir()
            for ch, m in enumerate(("t1", "t1ce", "t2", "flair")):
                nifti.save(data[ch], d / f"BraTS-BEN-{i:05d}-000_{m}.nii.gz")
        cases = find_cases(root)
        assert len(cases) == n_cases, (len(cases), n_cases)

        # warm-up: compile the batched program on the first batch_size cases
        t0 = time.perf_counter()
        engine.predict_cases_batched(cases[: args.batch_size], batch_size=args.batch_size)
        warm = time.perf_counter() - t0
        print(f"# batched warm-up (incl. compile): {warm:.1f}s", file=sys.stderr)

        t0 = time.perf_counter()
        results = engine.predict_cases_batched(cases, batch_size=args.batch_size)
        total = time.perf_counter() - t0
        assert len(results) == n_cases
        cases_per_min = 60.0 * n_cases / total
        infos = [r[1] for r in results]
        phase = {
            "device_batch_s_mean": round(
                float(np.mean([i["batch_seconds"] for i in infos])), 2
            ),
            "ensemble_host_s_mean": round(
                float(np.mean([i.get("ensemble_host_s", 0.0) for i in infos])), 2
            ),
        }

        seq = None
        if args.compare_sequential:
            # apples-to-apples: the SAME on-disk cases through per-case
            # predict_case (disk decode included) — the round-3 "batched is
            # slower" comparison put batched-with-decode against an
            # in-memory sequential bench
            t0 = time.perf_counter()
            for c in cases:
                engine.predict_case(c)
            seq = time.perf_counter() - t0
            print(f"# sequential same-disk-path: {seq / n_cases:.2f} s/case",
                  file=sys.stderr)
        # disarm BEFORE printing: a timer firing between the success line
        # and main()'s cancel would append a failure line after it, and
        # last-JSON-line parsers would flip a completed bench to failed
        if watchdog:
            watchdog.cancel()
        baseline_cpm = 60.0 / 330.0  # reference: ~330 s/case, serial
        out = {
            "metric": "brats_cases_per_min_per_chip",
            "value": round(cases_per_min, 2),
            "unit": "cases/min",
            "vs_baseline": round(cases_per_min / baseline_cpm, 1),
            "detail": {
                "models": args.models,
                "folds": args.folds,
                "tta": not args.no_tta,
                "n_cases": n_cases,
                "batch_size": args.batch_size,
                "seconds_per_case": round(total / n_cases, 3),
                "warmup_s": round(warm, 1),
                "device": str(jax.devices()[0]),
                **phase,
                **(
                    {"sequential_same_path_s_per_case": round(seq / n_cases, 3)}
                    if seq is not None
                    else {}
                ),
            },
        }
        print(json.dumps(out))
        return 0
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--models", type=int, default=2)
    ap.add_argument("--folds", type=int, default=5)
    ap.add_argument("--no-tta", action="store_true")
    ap.add_argument("--cases", type=int, default=3)
    ap.add_argument(
        "--mode",
        choices=["sliding", "fullconv", "batched"],
        default="fullconv",
        help="fullconv (default): whole-volume fully-convolutional "
        "production mode (infer/fullconv.py; label maps agree with the "
        "sliding recipe on >99.7%% of voxels in randomized tests); "
        "sliding: the canonical bit-parity nnU-Net sliding-window recipe; "
        "batched: multi-case fullconv throughput (cases/min per chip, "
        "BASELINE throughput config — NIfTI decode overlapped with device "
        "compute via CasePrefetcher)",
    )
    ap.add_argument(
        "--compare-sequential", action="store_true",
        help="--mode batched only: also run per-case predict_case over the "
        "same on-disk cases (identical decode path) and record it in detail",
    )
    ap.add_argument(
        "--batch-size", type=int, default=2,
        help="cases per device batch in --mode batched (2 is the largest "
        "that fits 16 GB HBM at the 192-scale bucket with TTA: batch 4 "
        "measured 23.6 G)",
    )
    args = ap.parse_args()
    args.cases = max(args.cases, 1)  # np.median([]) would emit NaN JSON
    if args.quick:
        args.models, args.folds = 1, 1
        args.no_tta = True

    _apply_tuned_flags()
    # failure lines must carry the metric of the config actually being run:
    # a batched-mode failure recorded under the single-case metric reads as
    # "batched never attempted" to record consumers
    if args.mode == "batched":
        _metric, _unit = "brats_cases_per_min_per_chip", "cases/min"
    else:
        _metric, _unit = "brats_case_e2e_seconds", "s/case"
    _preflight_tunnel(_metric, _unit)
    watchdog = _arm_watchdog(1800.0, _metric, _unit)

    import jax

    from braintpu.infer import InferenceEngine, ModelBundle
    from braintpu.models import MODEL1_BN, MODEL2_GN_LARGE, init_params
    from braintpu.utils.compcache import enable_compilation_cache

    enable_compilation_cache()  # warm-up reflects cached compiles on reruns

    configs = [MODEL1_BN, MODEL2_GN_LARGE][: args.models]
    # Weights: the committed synthetic-trained checkpoints when present
    # (results/trained_synth/, fold files cycled up to --folds), random
    # init otherwise.  The segmentation headline is weight-INDEPENDENT
    # (fixed shapes, no data-dependent control flow), but the pipeline
    # sub-bench below is not: feature-extraction cost scales with the
    # predicted tumor, and random weights label most of the brain as
    # tumor — the documented pathological case — while trained weights
    # produce the production-representative segmentations the ≤10 s/case
    # north star was measured against (tools/pipeline_meas_results.jsonl).
    from pathlib import Path

    from braintpu.ckpt import load_pytree_npz

    ckpt_root = Path(__file__).resolve().parent / "results" / "trained_synth" / "checkpoints"
    model_names = ["model1", "model2"][: args.models]
    bundles = []
    weights_src = []
    for i, (name, cfg) in enumerate(zip(model_names, configs)):
        fold_files = sorted((ckpt_root / name).glob("fold_*.npz"))
        if fold_files and os.environ.get("BRAINTPU_BENCH_RANDOM_WEIGHTS") != "1":
            host = [load_pytree_npz(f) for f in fold_files]
            folds = [host[f % len(host)] for f in range(args.folds)]
            weights_src.append(f"{name}:trained({len(host)} folds cycled)")
        else:
            folds = [
                init_params(cfg, jax.random.PRNGKey(i * 10 + f))
                for f in range(args.folds)
            ]
            weights_src.append(f"{name}:random")
        bundles.append(ModelBundle.from_folds(cfg, folds))
    print(f"# weights: {', '.join(weights_src)}", file=sys.stderr)
    mode = "fullconv" if args.mode == "batched" else args.mode
    engine = InferenceEngine(models=bundles, tta=not args.no_tta, mode=mode)

    # BRAINTPU_BENCH_SHAPE="80,96,80" shrinks the synthetic case so every
    # mode can be end-to-end drilled on CPU before a TPU window spends
    # real tunnel time on it; production default is the BraTS geometry
    shape_env = os.environ.get("BRAINTPU_BENCH_SHAPE")
    if shape_env:
        data = synthetic_case(tuple(int(s) for s in shape_env.split(",")))
    else:
        data = synthetic_case()

    if args.mode == "batched":
        rc = _bench_batched(args, engine, data, jax, watchdog=watchdog)
        if watchdog:
            watchdog.cancel()
        return rc

    # Warm-up: triggers all compilations.
    t0 = time.perf_counter()
    seg, info = engine.predict_case_array(data)
    warm = time.perf_counter() - t0
    print(
        f"# warm-up (incl. compile): {warm:.1f}s  seg labels {np.unique(seg)}",
        file=sys.stderr,
    )
    # Settle: the FIRST post-compile execution can still be far off steady
    # state (XLA autotune/layout warm-in: the round-3 sliding capture
    # measured 51.3 s then 26.3 s), which poisons a 2-sample median.  Burn
    # one untimed iteration; BRAINTPU_BENCH_NO_SETTLE=1 skips it.
    if os.environ.get("BRAINTPU_BENCH_NO_SETTLE") != "1":
        t0 = time.perf_counter()
        engine.predict_case_array(data)
        print(f"# settle: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    times, predict_times = [], []
    for _ in range(args.cases):
        t0 = time.perf_counter()
        seg, info = engine.predict_case_array(data)
        times.append(time.perf_counter() - t0)
        predict_times.append(float(info.get("predict_s") or 0.0))
    # Headline aggregation = MIN of N, with the median reported alongside:
    # the chip sits behind a SHARED relay tunnel, and external tenants add
    # strictly one-sided noise (a 2026-08-19 congested session measured
    # [24.1, 35.3] s on the exact config that measures 10.6 s in a quiet
    # window — the median is the tenant count, the min is the framework).
    # Steady-state compute on a fixed shape has no mechanism to run faster
    # than its true cost.  NOTE when comparing against the reference's
    # ~330 s: that figure is a single-run wall-clock from its README
    # (README.md:127), not a median of repeats — vs_baseline is therefore
    # best-run vs single-run; the median-based ratio is in detail.
    per_case = float(np.min(times))
    per_case_median = float(np.median(times))
    # NOTE: the watchdog stays armed through the MFU + pipeline diagnostics
    # below (a hang there must still yield a parsable failure line); it is
    # cancelled immediately before the success line prints.
    print(f"# steady-state times: {times} (min {per_case:.2f}, "
          f"median {per_case_median:.2f})", file=sys.stderr)

    # MFU: analytic MXU FLOPs of the full ensemble forward at the bucket
    # shape the programs actually ran (crop+pad of the synthetic case),
    # over the measured span.  Two denominators: the device-side predict
    # span (closest to device time this harness can observe without a
    # trace) and the whole e2e per-case time (a floor).
    mfu = {}
    try:
        from braintpu.infer.gaussian import patch_grid
        from braintpu.models.unet3d import forward_flops

        bucket = info.get("bucket_shape")
        mirrors = 1 if args.no_tta else 8
        flops = 0
        for cfg_m in configs:
            if mode == "sliding":
                n_patch = len(patch_grid(bucket, cfg_m.patch_size, engine.step_size))
                flops += (n_patch * args.folds * mirrors
                          * forward_flops(cfg_m, cfg_m.patch_size))
            else:
                flops += args.folds * mirrors * forward_flops(cfg_m, bucket)
        peak = 197e12  # v5e bf16
        best_predict = min(t for t in predict_times if t > 0)
        mfu = {
            "ensemble_tflops": round(flops / 1e12, 2),
            "bucket_shape": list(bucket),
            "mfu_predict_span": round(flops / best_predict / peak, 4),
            "mfu_e2e": round(flops / per_case / peak, 4),
            "peak_tflops": 197,
        }
        print(f"# MFU: {mfu}", file=sys.stderr)
    except Exception as e:  # MFU is diagnostics — never fail the bench on it
        print(f"# MFU computation failed: {e}", file=sys.stderr)

    # Reference: full segmentation stage ~5-6 min on CPU → 330 s midpoint.
    baseline_s = 330.0
    result = {
        "metric": "brats_case_e2e_seconds"
        + ("_quick" if args.quick else ""),
        "value": round(per_case, 3),
        "unit": "s/case",
        "vs_baseline": round(baseline_s / per_case, 2),
        "detail": {
            "models": args.models,
            "folds": args.folds,
            "tta": not args.no_tta,
            "mode": args.mode,
            "cases_per_min_per_chip": round(60.0 / per_case, 2),
            "warmup_s": round(warm, 1),
            "aggregation": f"min of {len(times)} runs (one-sided shared-tunnel noise)",
            "weights": weights_src,
            "median_s": round(per_case_median, 3),
            "vs_baseline_median": round(baseline_s / per_case_median, 2),
            "device": str(jax.devices()[0]),
            **({"mfu": mfu} if mfu else {}),
        },
    }

    # End-to-end pipeline throughput (the metric the ≤10 s/case north star
    # is written against).  Diagnostics: a failure degrades to an error
    # note in detail, never kills the segmentation headline — including a
    # HANG: the already-measured headline `result` above is complete, so
    # the main watchdog is swapped for one that prints the SUCCESS line
    # (with a pipeline-timeout note) instead of a failure record, and the
    # sub-bench gets its own fresh budget rather than whatever is left of
    # the main 1800 s (a slow-tunnel day must not destroy the headline).
    # BRAINTPU_BENCH_NO_PIPELINE=1 skips it (e.g. quick TPU probes).
    if watchdog:
        watchdog.cancel()
    if not args.quick and not shape_env and os.environ.get(
        "BRAINTPU_BENCH_NO_PIPELINE"
    ) != "1":
        import threading

        def _pipe_boom():
            result["detail"]["pipeline"] = {
                "error": "watchdog: pipeline sub-bench exceeded its budget "
                "(headline above is unaffected)"
            }
            print(json.dumps(result), flush=True)
            os._exit(0)

        pipe_budget = float(os.environ.get("BRAINTPU_BENCH_PIPELINE_WATCHDOG",
                                           1500.0))
        pipe_dog = None
        if pipe_budget > 0:
            pipe_dog = threading.Timer(pipe_budget, _pipe_boom)
            pipe_dog.daemon = True
            pipe_dog.start()
        try:
            pipe_detail = _bench_pipeline(engine)
            print(f"# pipeline: {pipe_detail['pipeline_s_per_case']} s/case "
                  f"({pipe_detail['pipeline_cases_per_min']} cases/min)",
                  file=sys.stderr)
        except Exception as e:
            pipe_detail = {"error": f"{type(e).__name__}: {e}"[:300]}
            print(f"# pipeline bench failed: {e}", file=sys.stderr)
        finally:
            if pipe_dog:
                pipe_dog.cancel()
        result["detail"]["pipeline"] = pipe_detail

    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
