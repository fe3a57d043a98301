"""End-to-end pipeline orchestrator tests on a synthetic case."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from braintpu.infer import InferenceEngine, ModelBundle
from braintpu.models import UNetConfig, init_params
from braintpu.pipeline import Pipeline, PipelineConfig, StageEvent


@pytest.fixture(scope="module")
def tiny_engine():
    cfg = UNetConfig(
        in_channels=4,
        num_classes=3,
        base_features=4,
        max_features=16,
        num_pool=2,
        conv_per_stage=2,
        norm="batch",
        patch_size=(16, 16, 16),
        compute_dtype=jnp.float32,
    )
    bundle = ModelBundle.from_folds(cfg, [init_params(cfg, jax.random.PRNGKey(0))])
    return InferenceEngine(models=[bundle], tta=False, output_convention="internal")


def test_full_pipeline_on_synthetic_case(tmp_path, synth_case, tiny_engine):
    events = []
    pipeline = Pipeline(
        tiny_engine,
        PipelineConfig(output_root=tmp_path / "results"),
        on_event=events.append,
    )
    result = pipeline.run_case(synth_case)

    assert result.succeeded, result.summary
    assert result.case_id == "BraTS-GLI-99999-000"
    out = result.output_folder
    for f in [
        "BraTS-GLI-99999-000.nii.gz",
        "BraTS-GLI-99999-000_brats.nii.gz",
        "evaluation.json",
        "pipeline_summary.json",
        "events.jsonl",
        "feature_extraction/llm_ready_summary.json",
        "feature_extraction/radiology_report.txt",
        "feature_extraction/radiology_report.json",
        "feature_extraction/radiology_report.pdf",
        "feature_extraction/comprehensive_analysis.json",
    ]:
        assert (out / f).exists(), f

    # structured events cover the stage lifecycle
    stages_seen = {e.stage for e in events}
    for s in ("renaming", "segmenting", "converting", "evaluating", "extracting", "generating", "exporting", "done"):
        assert s in stages_seen, s

    # summary content
    with open(out / "pipeline_summary.json") as f:
        summary = json.load(f)
    assert summary["status"] == "completed"
    assert summary["pipeline_duration_seconds"] > 0
    assert summary["mean_dice"] is not None

    # report is governed: FINDINGS has no diagnostic language
    report = (out / "feature_extraction" / "radiology_report.txt").read_text()
    assert "MRI BRAIN WITH CONTRAST" in report
    assert "DISCLAIMER" in report

    # evaluation metrics structure
    with open(out / "evaluation.json") as f:
        metrics = json.load(f)
    assert set(metrics["compound"]) == {"WT", "TC", "ET"}


def test_pipeline_error_path(tmp_path, tiny_engine):
    empty = tmp_path / "empty_case"
    empty.mkdir()
    pipeline = Pipeline(tiny_engine, PipelineConfig(output_root=tmp_path / "results"))
    result = pipeline.run_case(empty)
    assert not result.succeeded
    assert result.summary["status"] == "error"
    assert "no complete BraTS case" in result.summary["error"]


def test_framework_config_roundtrip(tmp_path):
    from braintpu.utils.config import FrameworkConfig, load_config, save_config

    cfg = FrameworkConfig()
    cfg.segmentation.folds = 3
    cfg.report.generate_pdf = False
    p = tmp_path / "cfg.json"
    save_config(cfg, p)
    back = load_config(p)
    assert back.segmentation.folds == 3
    assert back.report.generate_pdf is False
    pc = back.pipeline_config()
    assert pc.generate_pdf is False


def test_framework_config_validation(tmp_path):
    import json
    import pytest
    from braintpu.utils.config import FrameworkConfig, load_config

    bad = FrameworkConfig().to_dict()
    bad["segmentation"]["ensemble"] = "mean"
    p = tmp_path / "bad.json"
    p.write_text(json.dumps(bad))
    with pytest.raises(ValueError, match="ensemble"):
        load_config(p)
    bad2 = FrameworkConfig().to_dict()
    bad2["segmentation"]["typo_key"] = 1
    p2 = tmp_path / "bad2.json"
    p2.write_text(json.dumps(bad2))
    with pytest.raises(ValueError, match="unknown"):
        load_config(p2)


@pytest.mark.parametrize("gt_et_label", [3, 4])  # 2025 / 2021 vintage
def test_pipeline_evaluation_preserves_et_both_gt_vintages(
    tmp_path, synth_case, tiny_engine, gt_et_label
):
    """Evaluation must see every GT and prediction ET voxel for BOTH GT
    vintages (2021 spells ET=4, 2025 spells ET=3).

    Regressions this pins down: (a) ET=4 falling outside every compound
    region so dice collapsed silently; (b) the strict 2021→2025 remap
    (3→0) being applied to 2025-space inputs, erasing ET from the
    prediction (default save convention) and from 2025-vintage GT."""
    import numpy as np

    from braintpu.io import nifti
    from braintpu.pipeline import Pipeline, PipelineConfig

    gt_path = synth_case / "BraTS-GLI-99999-000_seg.nii.gz"
    img = nifti.load(gt_path)
    gt = np.asarray(img.dataobj).copy()
    gt[gt == 3] = gt_et_label
    nifti.save(gt.astype(np.int16), gt_path, affine=img.affine)
    gt_et_voxels = int((gt == gt_et_label).sum())
    assert gt_et_voxels > 0

    pipe = Pipeline(tiny_engine, PipelineConfig(output_root=tmp_path / "res", generate_pdf=False))
    result = pipe.run_case(synth_case)
    assert result.succeeded, result.summary.get("traceback")
    et = result.metrics["compound"]["ET"]
    # tp+fn = GT ET support: proves normalization did not erase GT ET
    assert et["tp"] + et["fn"] == gt_et_voxels
    # tp+fp = predicted ET support: proves the prediction side survived too
    pred = np.asarray(
        nifti.load(result.output_folder / "BraTS-GLI-99999-000_brats.nii.gz").dataobj
    )
    assert et["tp"] + et["fp"] == int((pred == 3).sum())  # saved as 2025


def test_segmentation_retry_on_transient_fault(tmp_path, tiny_engine, synth_case):
    """A transient segmentation fault is retried (with a 'retry' event)
    instead of failing the case; a persistent fault still fails it."""
    from braintpu.pipeline import Pipeline, PipelineConfig

    calls = {"n": 0}

    def flaky(stage):
        if stage == "segmenting":
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("injected transient device fault")

    cfg = PipelineConfig(
        output_root=tmp_path / "out", generate_pdf=False,
        segment_retries=1, fault_hook=flaky,
    )
    result = Pipeline(tiny_engine, cfg).run_case(synth_case)
    assert result.succeeded
    assert any(e.stage == "segmenting" and e.status == "retry" for e in result.events)

    calls["n"] = 0

    def always(stage):
        if stage == "segmenting":
            raise RuntimeError("injected persistent fault")

    cfg2 = PipelineConfig(
        output_root=tmp_path / "out2", generate_pdf=False,
        segment_retries=1, fault_hook=always,
    )
    result2 = Pipeline(tiny_engine, cfg2).run_case(synth_case)
    assert not result2.succeeded


def _copy_case(src, dst_root, case_id):
    """Clone the synth case under a new case id."""
    import shutil

    dst = dst_root / case_id
    dst.mkdir(parents=True)
    for p in src.iterdir():
        shutil.copy(p, dst / p.name.replace(src.name, case_id))
    return dst


def test_run_cases_overlapped_matches_serial(tmp_path, tiny_engine, synth_case):
    """run_cases (device/host stage overlap) produces per-case results
    identical in content to serial run_case calls, including a failing
    case mixed in the middle."""
    from braintpu.io import nifti

    a = _copy_case(synth_case, tmp_path / "cases", "BraTS-GLI-00001-000")
    broken = tmp_path / "cases" / "BraTS-GLI-00002-000"
    broken.mkdir()  # incomplete case: no modalities
    b = _copy_case(synth_case, tmp_path / "cases", "BraTS-GLI-00003-000")

    pipe = Pipeline(
        tiny_engine,
        PipelineConfig(output_root=tmp_path / "res_overlap", generate_pdf=False),
    )
    results = pipe.run_cases([a, broken, b])
    assert [r.case_id for r in results] == [
        "BraTS-GLI-00001-000", "", "BraTS-GLI-00003-000"
    ]
    assert results[0].succeeded and results[2].succeeded
    assert not results[1].succeeded
    assert results[1].summary["status"] == "error"

    serial = Pipeline(
        tiny_engine,
        PipelineConfig(output_root=tmp_path / "res_serial", generate_pdf=False),
    ).run_case(a)
    # identical segmentation artifact and metrics as the serial path
    seg_o = np.asarray(nifti.load(results[0].output_folder / "BraTS-GLI-00001-000.nii.gz").dataobj)
    seg_s = np.asarray(nifti.load(serial.output_folder / "BraTS-GLI-00001-000.nii.gz").dataobj)
    np.testing.assert_array_equal(seg_o, seg_s)
    assert results[0].metrics["mean_dice"] == serial.metrics["mean_dice"]
    # per-case journals exist and carry the full stage lifecycle
    for r in (results[0], results[2]):
        lines = (r.output_folder / "events.jsonl").read_text().splitlines()
        stages = {json.loads(ln)["stage"] for ln in lines}
        assert {"renaming", "segmenting", "evaluating", "extracting", "done"} <= stages
