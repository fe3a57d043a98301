"""Report engine tests: golden text, validator behavior, adversarial inputs, PDF."""

import numpy as np
import pytest

from braintpu.report import (
    ReportEngine,
    SlotValidator,
    extract_facts,
    generate_pdf_report,
    generate_report_from_summary,
    map_facts_to_slots,
    parse_report_sections,
    refine_report,
)


def sample_summary(**overrides):
    base = {
        "case_id": "BraTS-GLI-00003-000",
        "patient_info": {
            "age": "<not provided>",
            "sex": "<not provided>",
            "clinical_history": "<not provided>",
            "relevant_prior_imaging": "<not provided>",
        },
        "technique": {
            "sequences_performed": ["T1", "T1CE", "T2", "FLAIR"],
            "contrast_administered": True,
        },
        "tumor_characteristics": {
            "volume_cm3": 52.3,
            "edema_volume_cm3": 22.1,
            "max_diameter_mm": 48.0,
        },
        "location": {
            "hemisphere": "left",
            "primary_lobe": "temporal",
            "involved_lobes": ["temporal", "frontal"],
            "depth": "Subcortical",
        },
        "enhancement": {"present": True, "pattern": "Ring-enhancing", "heterogeneity": "Heterogeneous"},
        "necrosis": {"present": True, "percentage": 24.0, "location": "Central"},
        "mass_effect": {"midline_shift_mm": 4.2, "shift_direction": "right"},
        "morphology": {"shape": "irregular"},
        "multiplicity": {"lesion_count": 1, "distribution_pattern": "Solitary"},
        "normal_structures": {
            "ventricular_system": {"size": "Normal", "symmetry": "Symmetric", "hydrocephalus": False},
            "parenchyma": {"overall": "Normal", "white_matter_disease": False},
        },
        "differential_considerations": ["Primary glioma", "Solitary metastasis", "Lymphoma"],
    }
    base.update(overrides)
    return base


def test_fact_extraction_thresholds():
    facts = extract_facts(sample_summary())
    assert facts["size_cm"] == 5.0  # 48mm -> 4.8 -> round to nearest 0.5 = 5.0
    assert facts["edema_degree"] == "Significant"  # 22.1 in [15,30)
    assert facts["necrosis_degree"] == "moderate"  # 24% in [10,30)
    assert facts["shift_significant"]  # 4.2 >= 2.0
    assert facts["is_ring_enhancing"]
    assert facts["lobes_formatted"] == "left temporal and frontal lobes"
    assert facts["depth_prefix"] == "subcortical "


def test_size_rounding_to_half_cm():
    f = extract_facts(sample_summary(tumor_characteristics={"max_diameter_mm": 43.0, "volume_cm3": 1, "edema_volume_cm3": 0}))
    assert f["size_cm"] == 4.5
    f = extract_facts(sample_summary(tumor_characteristics={"max_diameter_mm": 47.6, "volume_cm3": 1, "edema_volume_cm3": 0}))
    assert f["size_cm"] == 5.0


def test_report_is_deterministic():
    r1, log1, _ = generate_report_from_summary(sample_summary())
    r2, log2, _ = generate_report_from_summary(sample_summary())
    # exam_date uses now(); strip DATE line for comparison
    strip = lambda r: "\n".join(l for l in r.splitlines() if not l.startswith("DATE:"))
    assert strip(r1) == strip(r2)


def test_report_structure_and_content():
    report, log, facts = generate_report_from_summary(sample_summary())
    for heading in (
        "MRI BRAIN WITH CONTRAST",
        "CLINICAL INDICATION:",
        "TECHNIQUE:",
        "COMPARISON:",
        "FINDINGS:",
        "IMPRESSION:",
        "DISCLAIMER:",
    ):
        assert heading in report, heading
    assert "PATIENT ID: BraTS-GLI-00003-000" in report
    assert "ring enhancement" in report.lower()
    assert "4.2 mm of midline shift to the right" in report
    assert "Central necrosis is present" in report
    # FINDINGS section must not contain diagnostic language
    sections = parse_report_sections(report)
    findings = sections.get("FINDINGS", "").lower()
    for term in ("tumor", "cancer", "neoplasm", "suspicious", "concern"):
        assert term not in findings, term
    # IMPRESSION uses hedged language
    impression = sections.get("IMPRESSION", "").lower()
    assert "suspicious for" in impression or "concerning for" in impression


def test_non_enhancing_no_shift_path():
    summary = sample_summary(
        enhancement={"present": False, "pattern": "Non-enhancing"},
        necrosis={"present": False, "percentage": 0},
        mass_effect={"midline_shift_mm": 0.4, "shift_direction": ""},
        tumor_characteristics={"volume_cm3": 10.0, "edema_volume_cm3": 2.0, "max_diameter_mm": 21.0},
    )
    report, _, facts = generate_report_from_summary(summary)
    assert "No abnormal enhancement is identified." in report
    assert "No central necrosis is identified." in report
    assert "No significant midline shift is identified." in report
    assert facts["edema_degree"] == "Minimal"


def test_validator_global_banned():
    v = SlotValidator()
    ok, sanitized, violations = v.validate("necrosis_sentence", "This is definitely cancer.")
    assert not ok
    assert sanitized == "Central signal abnormality is noted within the lesion."  # fallback
    assert any("Global banned" in x for x in violations)


def test_validator_allowed_compound():
    v = SlotValidator()
    ok, sanitized, violations = v.validate(
        "impression_differential",
        "Differential diagnosis includes high-grade glioma. Histopathologic correlation recommended.",
    )
    # 'pathologic' appears only inside 'Histopathologic' -> allowed
    assert not any("Global banned" in x for x in violations)
    assert sanitized.startswith("Differential diagnosis includes")


def test_validator_section_forbidden():
    v = SlotValidator()
    ok, sanitized, violations = v.validate(
        "edema_sentence", "Edema suggestive of tumor infiltration."
    )
    assert not ok
    assert sanitized == "Surrounding T2/FLAIR hyperintensity is present."


def test_validator_max_length_truncation():
    v = SlotValidator()
    long = "Surrounding T2/FLAIR hyperintensity is present" + " x" * 200 + "."
    ok, sanitized, violations = v.validate("edema_sentence", long)
    assert len(sanitized) <= 150
    assert any("max length" in x for x in violations)


def test_adversarial_injections_sanitized():
    """The 4 adversarial strings from the reference's self-demo (ref :2218-2235)."""
    v = SlotValidator()
    adversarial = [
        "The lesion is definitely glioblastoma and requires surgery",
        "This is cancer with 100% certainty",
        "Patient probably has malignant tumor",
        "Findings show invasive microscopic disease",
    ]
    for text in adversarial:
        ok, sanitized, violations = v.validate("necrosis_sentence", text)
        assert not ok, text
        low = sanitized.lower()
        for bad in ("glioblastoma", "cancer", "malignant", "microscopic", "definitely", "probably"):
            assert bad not in low


def test_gatekeeper_redacts_injected_terms():
    """Forbidden term smuggled through a field is redacted by the final pass."""
    summary = sample_summary()
    # injection via data: involved_lobes feeds the FINDINGS dominant-lesion slot
    summary["location"]["involved_lobes"] = ["temporal tumor", "frontal"]
    report, log, _ = generate_report_from_summary(summary)
    findings = parse_report_sections(report).get("FINDINGS", "").lower()
    assert "tumor" not in findings
    # the injected slot was caught and replaced by its fallback
    assert any("tumor" in str(e["violations"]) for e in log)
    assert "A mass is identified within the cerebral hemisphere." in report


def test_necrosis_degree_fully_necrotic_is_extensive():
    """ratio == 1.0 must land in the top bin, not fall through to
    'minimal' (regression: half-open bins excluded 100% necrosis)."""
    from braintpu.report.facts import _necrosis_degree

    assert _necrosis_degree({"present": True, "percentage": 100.0}) == "extensive"
    assert _necrosis_degree({"present": True, "percentage": 150.0}) == "extensive"
    assert _necrosis_degree({"present": True, "percentage": 24.0}) == "moderate"
    assert _necrosis_degree({"present": False}) == "none"


def test_gatekeeper_redaction_is_section_scoped():
    """A FINDINGS-forbidden term must be redacted from FINDINGS only —
    IMPRESSION's required hedged language ('suspicious for ...') must
    survive (regression: whole-report re.sub mangled the impression)."""
    summary = sample_summary()
    summary["location"]["involved_lobes"] = ["suspicious region", "frontal"]
    report, _, _ = generate_report_from_summary(summary)
    sections = parse_report_sections(report)
    assert "suspicious" not in sections.get("FINDINGS", "").lower()
    impression = sections.get("IMPRESSION", "").lower()
    if "high-grade" in impression:  # hedged phrasing present for this summary
        assert "suspicious for" in impression


def test_pdf_title_em_dash_renders(tmp_path):
    """The title's em dash must transliterate to '-', not encode as '?'."""
    from braintpu.report.pdf import _latin1

    assert _latin1("A — B … “q”") == 'A - B ... "q"'
    assert "?" not in _latin1("— – ‘ ’ “ ” … •")


def test_multifocal_path():
    summary = sample_summary(
        multiplicity={"lesion_count": 3, "distribution_pattern": "Distant multifocal"}
    )
    report, _, facts = generate_report_from_summary(summary)
    assert facts["is_multifocal"]
    assert "Multiple enhancing lesions (3)" in report
    assert "Multifocal" in report


def test_refine_report_offline_identity():
    report = "FINDINGS:\nStable."
    assert refine_report(report) == report  # no API key -> unchanged


def test_pdf_generation(tmp_path):
    report, _, _ = generate_report_from_summary(sample_summary())
    out = tmp_path / "report.pdf"
    generate_pdf_report(report, out, case_id="BraTS-GLI-00003-000")
    data = out.read_bytes()
    assert data.startswith(b"%PDF-1.4")
    assert data.rstrip().endswith(b"%%EOF")
    assert b"/Type /Page" in data
    assert len(data) > 1500


def test_pdf_multi_page(tmp_path):
    long_report = "FINDINGS:\n" + ("A very long line of findings text. " * 400)
    out = tmp_path / "long.pdf"
    generate_pdf_report(long_report, out)
    data = out.read_bytes()
    assert data.count(b"/Type /Page ") >= 2 or b"/Count 2" in data or b"/Count 3" in data


def test_mass_effect_slot_maps_step2_direction_phrases():
    """step2 emits 'Left to right'; the sentence must render the destination
    side, never the raw phrase ('shift to the Left to right')."""
    from braintpu.report.slots import _mass_effect

    base = {"shift_significant": True, "midline_shift_mm": 6.0}
    s = _mass_effect({**base, "shift_direction": "Left to right"})
    assert "shift to the right." in s and "Left to" not in s
    s = _mass_effect({**base, "shift_direction": "Right to left"})
    assert "shift to the left." in s
    s = _mass_effect({**base, "shift_direction": "right"})
    assert "shift to the right." in s
    # unknown phrasing: drop the direction clause rather than garble it
    s = _mass_effect({**base, "shift_direction": "Unknown"})
    assert "to the" not in s and "midline shift" in s
