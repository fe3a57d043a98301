"""Feature-extraction pipeline tests: golden values on synthetic volumes."""

import json

import numpy as np
import pytest

from braintpu.features import (
    FeatureContext,
    analyze_mass_effect,
    analyze_morphology,
    analyze_multiplicity,
    analyze_normal_structures,
    analyze_quality,
    analyze_sequence_findings,
    generate_llm_summary,
    run_all_steps,
    signal_label,
    tumor_masks_from_seg,
)


def make_ctx(shape=(60, 64, 56), tumor=True, seed=0):
    """Synthetic case: bright brain ellipsoid, nested tumor labels."""
    rng = np.random.default_rng(seed)
    zz, yy, xx = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    c = np.array(shape) / 2
    brain = (
        ((zz - c[0]) / (shape[0] * 0.42)) ** 2
        + ((yy - c[1]) / (shape[1] * 0.42)) ** 2
        + ((xx - c[2]) / (shape[2] * 0.42)) ** 2
    ) < 1
    mods = {}
    base = {"t1": 600, "t1ce": 650, "t2": 500, "flair": 550}
    for mod, mean in base.items():
        vol = np.zeros(shape, np.float32)
        vol[brain] = np.clip(rng.normal(mean, 40, brain.sum()), 1, None)
        mods[mod] = vol
    seg = np.zeros(shape, np.int32)
    if tumor:
        tz, ty, tx = int(c[0]) - 8, int(c[1]) + 2, int(c[2])
        seg[tz - 8 : tz + 8, ty - 8 : ty + 8, tx - 8 : tx + 8] = 2  # ED shell
        seg[tz - 5 : tz + 5, ty - 5 : ty + 5, tx - 5 : tx + 5] = 1  # NCR
        seg[tz - 2 : tz + 2, ty - 2 : ty + 2, tx - 2 : tx + 2] = 3  # ET
        seg[~brain] = 0
        # tumor signal: T1ce bright in ET, dark NCR
        mods["t1ce"][seg == 3] *= 2.0
        mods["t1"][seg == 1] *= 0.5
    return FeatureContext.from_arrays(mods, seg, case_id="SYN-0001")


def test_signal_label_bins():
    assert signal_label(0.5) == "markedly hypointense"
    assert signal_label(0.7) == "hypointense"
    assert signal_label(1.0) == "isointense"
    assert signal_label(1.3) == "hyperintense"
    assert signal_label(2.0) == "markedly hyperintense"
    # boundary semantics: < not <=
    assert signal_label(0.6) == "hypointense"
    assert signal_label(1.5) == "markedly hyperintense"


def test_tumor_masks_definitions():
    seg = np.array([0, 1, 2, 3, 4])
    m = tumor_masks_from_seg(seg)
    np.testing.assert_array_equal(m["ncr"], [0, 1, 0, 0, 0])
    np.testing.assert_array_equal(m["ed"], [0, 0, 1, 0, 0])
    np.testing.assert_array_equal(m["et"], [0, 0, 0, 1, 1])
    np.testing.assert_array_equal(m["tc"], [0, 1, 0, 1, 1])
    np.testing.assert_array_equal(m["wt"], [0, 1, 1, 1, 1])


def test_step1_structure_and_enhancement():
    ctx = make_ctx()
    res = analyze_sequence_findings(ctx)
    assert res["case_id"] == "SYN-0001"
    regions = res["region_signal_analysis"]["regions"]
    assert set(regions) == {"ncr", "ed", "et"}
    # ET was made 2x bright on T1ce → hyperintense + enhancement present
    assert regions["et"]["T1ce"]["ratio_to_normal"] > 1.5
    assert res["contrast_enhancement"]["enhancement_present"] is True
    assert res["contrast_enhancement"]["pattern"] in (
        "Ring-enhancing",
        "Solid/nodular enhancing",
    )
    # NCR darkened on T1 → hypo
    assert "hypo" in regions["ncr"]["T1"]["signal_label"]
    # volumes: ET = 4^3... ET box is 4x4x4=64 voxels... actually 4 wide: 64
    assert res["volumes"]["Enhancing Tumor (ET)"] == pytest.approx(64 / 1000)
    assert "CLINICAL INFORMATION" in res["text_summary"]
    assert "<not provided>" in res["text_summary"]


def test_step1_no_enhancement():
    ctx = make_ctx()
    ctx.seg[ctx.seg == 3] = 1  # remove ET
    ctx._tumor_masks = None
    res = analyze_sequence_findings(ctx)
    assert res["contrast_enhancement"]["pattern"] == "Non-enhancing"
    assert "histopatholog" in res["contrast_enhancement"]["description"]


def test_step2_offset_tumor_hemisphere():
    ctx = make_ctx()
    res = analyze_mass_effect(ctx)
    ms = res["midline_shift"]
    assert ms["tumor_hemisphere"] == "left"  # tumor placed at x < midline
    assert 0 <= res["herniation_risk"]["mass_effect_score"] <= 7
    loc = res["anatomical_location"]
    assert loc["hemisphere"] in ("left", "left-predominant", "bilateral")
    assert isinstance(loc["lobes"], list)
    assert 0 <= loc["relative_depth_score"] <= 1.2


def test_step2_no_tumor():
    ctx = make_ctx(tumor=False)
    res = analyze_mass_effect(ctx)
    assert res["midline_shift"]["severity"] == "No tumor detected"
    assert res["anatomical_location"]["primary_lobe"] == "None"


def test_step3_single_lesion():
    ctx = make_ctx()
    res = analyze_multiplicity(ctx)
    assert res["component_analysis"]["num_components"] == 1
    assert res["component_analysis"]["is_single_lesion"]
    assert res["distribution_pattern"]["pattern"] == "Solitary"
    primary = res["component_analysis"]["components"][0]
    assert primary["classification"] == "Primary lesion"
    assert primary["has_enhancement"]
    assert primary["composition"]["et"] == 64


def test_step3_two_lesions_distance():
    ctx = make_ctx()
    # add a second distant lesion (>40mm away), above min volume
    ctx.seg[50:55, 50:55, 45:50] = 2
    ctx._tumor_masks = None
    res = analyze_multiplicity(ctx)
    assert res["component_analysis"]["num_components"] == 2
    d = res["distance_analysis"]["min_distance_mm"]
    assert d and d > 20
    assert res["distribution_pattern"]["pattern"] in (
        "Regional multifocal",
        "Distant multifocal",
        "Primary with satellites",
    )


def test_step3_min_volume_filter():
    ctx = make_ctx()
    ctx.seg[2:4, 2:4, 2:4] = 2  # 8 voxels = 0.008 cm³ < 0.1
    ctx._tumor_masks = None
    res = analyze_multiplicity(ctx)
    assert res["component_analysis"]["num_components"] == 1
    assert res["component_analysis"]["excluded_fragments"] == 1


def test_step4_shape_descriptors_cube():
    ctx = make_ctx()
    res = analyze_morphology(ctx)
    shape = res["shape_descriptors"]
    # 16³ cube: volume 4.096 cm³
    assert shape["volume_cm3"] == pytest.approx(16**3 / 1000)
    assert 0 < shape["sphericity"] <= 1
    assert shape["elongation"] == pytest.approx(1.0, abs=0.15)  # cube ≈ isotropic
    assert res["border_regularity"]["concept"] == "contour_smoothness"
    assert res["margin_definition"]["concept"] == "intensity_transition"
    necro = res["necrosis_pattern"]
    assert necro["necrosis_present"]
    # NCR = 10³-4³ = 936 of WT 16³ = 4096 → ~22.8%
    assert necro["necrosis_percentage"] == pytest.approx(936 / 4096 * 100, rel=0.01)


def test_step5_quality_clean_case():
    ctx = make_ctx()
    res = analyze_quality(ctx)
    seg_q = res["segmentation_quality"]
    assert seg_q["quality_score"] >= 75
    assert seg_q["grade"] in ("Excellent", "Good")
    assert not seg_q["at_image_boundary"]
    assert set(res["image_quality"]["sequences"]) == {"T1", "T1ce", "T2", "FLAIR"}
    assert res["measurement_confidence"]["volume_measurements"]["confidence"] == "High"
    assert len(res["limitations_and_caveats"]["limitations"]) >= 4


def test_step5_boundary_truncation_detected():
    ctx = make_ctx()
    ctx.seg[0:2, 30:34, 30:34] = 2  # tumor at x boundary
    ctx._tumor_masks = None
    res = analyze_quality(ctx)
    assert res["segmentation_quality"]["at_image_boundary"]


def test_step6_structure():
    ctx = make_ctx()
    res = analyze_normal_structures(ctx)
    vent = res["ventricular_system"]
    assert "ventricle_brain_ratio_percent" in vent
    assert vent["size_assessment"] in (
        "Normal",
        "Mildly prominent",
        "Moderately dilated",
        "Markedly dilated",
    )
    assert res["parenchyma"]["gray_white_differentiation"]["assessment"] in (
        "Preserved",
        "Mildly reduced",
        "Reduced",
        "Could not assess",
    )
    assert res["major_vessels"]["overall_assessment"] == "Limited assessment on structural sequences"


def test_run_all_outputs(tmp_path, synth_case):
    from braintpu.io import brats, nifti

    out = tmp_path / "fe"
    seg_path = synth_case / "BraTS-GLI-99999-000_seg.nii.gz"
    results = run_all_steps(synth_case, seg_path, out)
    for f in [
        "step1_sequence_findings.json",
        "step2_mass_effect.json",
        "step3_multiplicity.json",
        "step4_morphology.json",
        "step5_quality.json",
        "step6_normal_structures.json",
        "comprehensive_analysis.json",
        "llm_ready_summary.json",
        "radiology_report.txt",
    ]:
        assert (out / f).exists(), f
    with open(out / "llm_ready_summary.json") as f:
        llm = json.load(f)
    # schema keys the report engine depends on
    for key in (
        "case_id",
        "patient_info",
        "technique",
        "tumor_characteristics",
        "location",
        "signal_characteristics",
        "enhancement",
        "mass_effect",
        "morphology",
        "necrosis",
        "cystic_solid",
        "multiplicity",
        "differential_considerations",
        "normal_structures",
        "quality_metrics",
        "measurement_reliability_warnings",
        "caveats",
    ):
        assert key in llm, key
    # nested schema parity with generate_llm_summary (ref run_all.py:163-311)
    assert set(llm["patient_info"]) == {
        "age",
        "sex",
        "clinical_history",
        "presenting_symptoms",
        "relevant_prior_imaging",
        "note",
    }
    assert set(llm["technique"]) == {
        "sequences_performed",
        "sequences_not_available",
        "contrast_administered",
        "contrast_note",
        "acquisition_parameters",
        "note",
    }
    assert set(llm["tumor_characteristics"]) == {
        "volume_cm3",
        "enhancing_volume_cm3",
        "necrotic_volume_cm3",
        "edema_volume_cm3",
        "max_diameter_mm",
    }
    # anti-fabrication guards must survive verbatim
    assert llm["patient_info"]["age"] == "<not provided>"
    assert "DO NOT fabricate" in llm["patient_info"]["note"]
    report = (out / "radiology_report.txt").read_text()
    assert "BRAIN MRI TUMOR ANALYSIS REPORT" in report
    assert "EXECUTIVE SUMMARY" in report


def test_run_all_device_features_flag(tmp_path, synth_case, monkeypatch):
    """The full 6-step runner survives BRAINTPU_DEVICE_FEATURES=1 and
    produces the same key findings as the host path (floats to ~1e-3)."""
    monkeypatch.delenv("BRAINTPU_DEVICE_FEATURES", raising=False)
    seg_path = synth_case / "BraTS-GLI-99999-000_seg.nii.gz"
    host = run_all_steps(synth_case, seg_path, tmp_path / "fe_host")
    monkeypatch.setenv("BRAINTPU_DEVICE_FEATURES", "1")
    dev = run_all_steps(synth_case, seg_path, tmp_path / "fe_dev")
    h1 = host["step1_sequence_findings"]["region_signal_analysis"]["regions"]
    d1 = dev["step1_sequence_findings"]["region_signal_analysis"]["regions"]
    assert set(h1) == set(d1)
    for region in h1:
        for seq in ("T1", "T2", "FLAIR", "T1ce"):
            assert d1[region][seq]["signal_label"] == h1[region][seq]["signal_label"]
            np.testing.assert_allclose(
                d1[region][seq]["mean_intensity"],
                h1[region][seq]["mean_intensity"],
                rtol=1e-3,
            )
    hq = host["step5_quality"]["image_quality"]["sequences"]
    dq = dev["step5_quality"]["image_quality"]["sequences"]
    for seq in hq:
        assert dq[seq]["quality"] == hq[seq]["quality"]


def test_llm_summary_laterality_validation():
    ctx = make_ctx()
    from braintpu.features.runner import _validate_laterality

    ok = _validate_laterality({"hemisphere": "left"}, {"tumor_hemisphere": "left"})
    assert ok["consistent"]
    bad = _validate_laterality({"hemisphere": "right"}, {"tumor_hemisphere": "left"})
    assert not bad["consistent"] and "mismatch" in bad["warning"].lower()
    bil = _validate_laterality({"hemisphere": "bilateral"}, {"tumor_hemisphere": "left"})
    assert bil["consistent"]


def test_run_all_zero_tumor_segmentation(tmp_path, synth_case):
    """Every step and the report chain must survive a no-tumor prediction
    (regression: step 4's empty shape descriptors crashed the text summary)."""
    from braintpu.io import nifti

    seg_path = synth_case / "BraTS-GLI-99999-000_seg.nii.gz"
    img = nifti.load(str(seg_path))
    empty = tmp_path / "empty_seg.nii.gz"
    nifti.save(np.zeros_like(np.asarray(img.dataobj)), str(empty), affine=img.affine)
    out = tmp_path / "fe0"
    results = run_all_steps(synth_case, empty, out)
    assert (out / "llm_ready_summary.json").exists()
    assert (out / "radiology_report.txt").exists()
    s4 = results["step4_morphology"]["shape_descriptors"]
    assert s4["shape_classification"] == "No tumor"


def test_context_load_normalizes_2021_vintage_seg(tmp_path, synth_case):
    """FeatureContext.load must map a BraTS-2021-vintage seg file (ET=4)
    into 2025 space (ET=3): step3's enhancing-foci analysis reads seg==3
    by documented reference quirk, so an ET=4 input would otherwise report
    an enhancing tumor as non-enhancing."""
    from braintpu.features.context import FeatureContext
    from braintpu.features.step3_multiplicity import analyze_multiplicity
    from braintpu.io import nifti

    seg_path = synth_case / "BraTS-GLI-99999-000_seg.nii.gz"
    img = nifti.load(str(seg_path))
    seg = np.asarray(img.dataobj).copy()
    seg[seg == 3] = 4  # rewrite to 2021 convention
    seg_2021 = tmp_path / "seg_2021.nii.gz"
    nifti.save(seg.astype(np.int16), str(seg_2021), affine=img.affine)

    ctx = FeatureContext.load(synth_case, seg_2021)
    assert (ctx.seg == 4).sum() == 0
    assert (ctx.seg == 3).sum() == int((seg == 4).sum())
    result = analyze_multiplicity(ctx)
    assert result["enhancing_analysis"]["num_enhancing_foci"] >= 1


def test_context_load_keeps_foreign_labels_in_wt(tmp_path, synth_case):
    """Out-of-vocabulary labels (>4) must stay tumor (WT = seg>0), not be
    zeroed into the 'normal' reference (regression: a table remap in load
    reclassified them as background)."""
    from braintpu.features.context import FeatureContext
    from braintpu.io import nifti

    seg_path = synth_case / "BraTS-GLI-99999-000_seg.nii.gz"
    img = nifti.load(str(seg_path))
    seg = np.asarray(img.dataobj).copy()
    seg[seg == 2] = 7  # foreign label
    seg_f = tmp_path / "seg_foreign.nii.gz"
    nifti.save(seg.astype(np.int16), str(seg_f), affine=img.affine)

    ctx = FeatureContext.load(synth_case, seg_f)
    assert (ctx.seg == 7).sum() == int((seg == 7).sum())
    assert ctx.tumor_masks["wt"].sum() == int((seg > 0).sum())


def test_context_shared_caches_match_direct_formulas():
    """region_count / positive_values / background_values / brain_mask are
    one-pass caches of the exact quantities the steps previously recomputed
    (r5 host-feature fusions) — pin them to the direct definitions,
    including negative + foreign labels."""
    ctx = make_ctx()
    ctx.seg[0, 0, 0] = -2   # negatives: in no region, not background-normal
    ctx.seg[0, 0, 1] = 7    # foreign labels: count toward wt only
    ctx.seg[1, 1, 1] = 4    # 2021 ET spelling
    seg = ctx.seg
    assert ctx.region_count("wt") == int((seg > 0).sum())
    assert ctx.region_count("et") == int(((seg == 3) | (seg == 4)).sum())
    assert ctx.region_count("tc") == int(
        ((seg == 1) | (seg == 3) | (seg == 4)).sum()
    )
    assert ctx.region_count("ncr") == int((seg == 1).sum())
    assert ctx.region_count("ed") == int((seg == 2).sum())
    assert ctx.region_count("background") == int((seg == 0).sum())

    for mod, data in ctx.modalities.items():
        np.testing.assert_array_equal(
            np.sort(ctx.positive_values(mod)), np.sort(data[data > 0])
        )
    brain = ctx.brain_mask("t1")
    from braintpu.features.context import brain_mask_from

    np.testing.assert_array_equal(brain, brain_mask_from(ctx.modalities["t1"]))
    t2 = ctx.modalities["t2"]
    np.testing.assert_array_equal(
        np.sort(ctx.background_values("t2")), np.sort(t2[(t2 > 0) & ~brain])
    )


def test_step3_speckle_segmentation_is_fast_and_filtered():
    """A degraded (speckled) segmentation with thousands of components must
    not blow up step 3 (the per-component rescan was O(n_comps x n_voxels):
    84.8s on a random-weights serve job before the r5 vectorization) and
    must report them as sub-threshold fragments."""
    import time

    rng = np.random.default_rng(0)
    seg = np.zeros((80, 80, 60), np.int32)
    speckle = rng.random(seg.shape) < 0.06
    seg[speckle] = rng.integers(1, 4, int(speckle.sum()))
    mods = {
        m: (300 + 30 * rng.standard_normal(seg.shape)).astype(np.float32)
        for m in ("t1", "t1ce", "t2", "flair")
    }
    ctx = FeatureContext.from_arrays(mods, seg, case_id="SPECKLE-1")
    t0 = time.perf_counter()
    result = analyze_multiplicity(ctx)
    assert time.perf_counter() - t0 < 20  # was minutes before vectorization
    comp = result["component_analysis"]
    assert comp["excluded_fragments"] > 100  # speckles are sub-threshold
    assert comp["num_components"] < 50
