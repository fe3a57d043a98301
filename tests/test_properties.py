"""Property-based tests (hypothesis) for the pure-math foundation.

The example-based golden tests pin the reference arithmetic
(SURVEY.md §2.3); these pin the *invariants* that must hold for every
input — the class of bug a fixed example can miss (off-by-one crops,
label-table non-bijectivity, Dice edge cases).
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra import numpy as hnp

from braintpu.labels.convert import (
    brats2021_to_internal,
    brats2025_to_internal,
    internal_to_brats2021,
    internal_to_brats2025,
)
from braintpu.metrics.segmentation import evaluate_pair
from braintpu.infer.engine import uncrop_labels
from braintpu.pre.preprocess import crop_to_nonzero, zscore_masked

SMALL = dict(max_examples=25, deadline=None)

seg_arrays = hnp.arrays(
    np.int16, hnp.array_shapes(min_dims=3, max_dims=3, min_side=1, max_side=9),
    elements=st.integers(0, 3),
)


@given(seg_arrays)
@settings(**SMALL)
def test_label_remaps_are_bijective_on_internal(seg):
    np.testing.assert_array_equal(
        brats2025_to_internal(internal_to_brats2025(seg)), seg
    )
    np.testing.assert_array_equal(
        brats2021_to_internal(internal_to_brats2021(seg)), seg
    )


@given(seg_arrays)
@settings(**SMALL)
def test_remap_preserves_background_and_foreground(seg):
    for out in (internal_to_brats2025(seg), internal_to_brats2021(seg)):
        out = np.asarray(out)
        np.testing.assert_array_equal(out == 0, np.asarray(seg) == 0)


@given(seg_arrays)
@settings(**SMALL)
def test_dice_self_is_perfect(seg):
    """pred == gt ⇒ Dice 1 (or the defined no-positives convention)."""
    m = evaluate_pair(seg, seg, 1)
    has_label = bool((seg == 1).any())
    if has_label:
        assert abs(m.dice - 1.0) < 1e-6
        assert abs(m.iou - 1.0) < 1e-6
    assert m.fp == 0 and m.fn == 0


@given(seg_arrays, seg_arrays.map(lambda a: a))
@settings(**SMALL)
def test_dice_symmetry_and_bounds(a, b):
    """Dice is symmetric in (pred, gt) and within [0, 1]."""
    if a.shape != b.shape:
        b = np.resize(b, a.shape)
    m_ab = evaluate_pair(a, b, 1)
    m_ba = evaluate_pair(b, a, 1)
    assert abs(m_ab.dice - m_ba.dice) < 1e-6
    assert 0.0 <= m_ab.dice <= 1.0
    # sensitivity/specificity swap under argument exchange: TP symmetric,
    # FP↔FN
    assert m_ab.fp == m_ba.fn and m_ab.fn == m_ba.fp


@given(
    hnp.arrays(
        np.float32,
        st.tuples(st.just(2), st.integers(3, 10), st.integers(3, 10),
                  st.integers(3, 10)),
        elements=st.floats(0, 100, width=32),
    )
)
@settings(**SMALL)
def test_crop_uncrop_roundtrip(data):
    """crop_to_nonzero ∘ uncrop restores every foreground voxel; the crop
    box is tight (touching faces contain nonzero) or the full volume."""
    cropped, mask, info = crop_to_nonzero(data)
    assert cropped.shape[1:] == info.cropped_shape
    labels = (cropped[0] > data.mean()).astype(np.uint8)
    full = uncrop_labels(labels, info)
    assert full.shape == data.shape[1:]
    # every painted voxel survives the round trip at its original site
    np.testing.assert_array_equal(full[info.slices], labels)
    outside = np.ones(data.shape[1:], bool)
    outside[info.slices] = False
    assert (full[outside] == 0).all()
    if (data != 0).any():
        nz = np.asarray(cropped != 0).any(axis=0)
        for ax in range(3):
            first = [slice(None)] * 3
            last = [slice(None)] * 3
            first[ax] = 0
            last[ax] = nz.shape[ax] - 1
            assert nz[tuple(first)].any(), f"loose crop low on axis {ax}"
            assert nz[tuple(last)].any(), f"loose crop high on axis {ax}"


@given(
    hnp.arrays(
        np.float32, st.tuples(st.integers(4, 12), st.integers(4, 12),
                              st.integers(4, 12)),
        elements=st.floats(-50, 150, width=32),
    )
)
@settings(**SMALL)
def test_zscore_masked_invariants(data):
    """Inside-mask values are standardized per channel (mean≈0, std≈1 when
    nonconstant) and background is forced to exactly 0."""
    stack = data[None]  # (C=1, X, Y, Z) — the preprocessing layout
    mask = data > data.mean()
    if mask.sum() < 8:
        return
    out = np.asarray(zscore_masked(stack, mask))[0]
    mask = np.asarray(mask)
    inside = out[mask]
    vals = data[mask].astype(np.float64)
    # near-constant masked data amplifies f32 rounding through
    # /(std + 1e-8) (reference nnU-Net semantics do the same) — the
    # standardization invariant only holds when std is non-degenerate
    if vals.std() > 1e-3 * (1.0 + abs(vals.mean())):
        assert abs(float(inside.mean())) < 1e-2
        assert abs(float(inside.std()) - 1.0) < 1e-2
    assert (out[~mask] == 0).all()


@given(
    st.tuples(st.integers(8, 40), st.integers(8, 40), st.integers(8, 40)),
    st.tuples(st.integers(4, 16), st.integers(4, 16), st.integers(4, 16)),
    st.sampled_from([0.25, 0.5, 0.75, 1.0]),
)
@settings(**SMALL)
def test_patch_grid_covers_volume(image_size, patch_size, step):
    """Every voxel is covered by ≥1 patch; all patches are in-bounds; the
    first patch starts at 0 and the last ends exactly at the volume edge
    (nnU-Net's stretched-step formula)."""
    from braintpu.infer.gaussian import patch_grid, sliding_window_starts

    patch_size = tuple(min(p, s) for p, s in zip(patch_size, image_size))
    grid = patch_grid(image_size, patch_size, step)
    covered = np.zeros(image_size, bool)
    for x, y, z in grid:
        assert x >= 0 and y >= 0 and z >= 0
        assert x + patch_size[0] <= image_size[0]
        assert y + patch_size[1] <= image_size[1]
        assert z + patch_size[2] <= image_size[2]
        covered[x:x + patch_size[0], y:y + patch_size[1], z:z + patch_size[2]] = True
    assert covered.all()
    for starts, size, patch in zip(
        sliding_window_starts(image_size, patch_size, step),
        image_size, patch_size,
    ):
        assert starts[0] == 0
        assert starts[-1] + patch == size


@given(st.tuples(st.integers(4, 24), st.integers(4, 24), st.integers(4, 24)))
@settings(**SMALL)
def test_gaussian_map_properties(patch):
    """Strictly positive, peak 1 at the center voxel, symmetric under the
    same flips mirror-TTA uses (even axes reflect around s//2 pairing)."""
    from braintpu.infer.gaussian import gaussian_importance_map

    g = gaussian_importance_map(patch)
    assert g.shape == patch
    assert (g > 0).all()
    c = tuple(s // 2 for s in patch)
    assert g[c] == g.max() == np.float32(1.0)
    # monotone non-increasing along each axis ray from the center
    for ax in range(3):
        line = g[tuple(c[:ax]) + (slice(None),) + tuple(c[ax + 1:])]
        right = line[c[ax]:]
        left = line[:c[ax] + 1][::-1]
        assert (np.diff(right) <= 1e-7).all()
        assert (np.diff(left) <= 1e-7).all()


@given(
    hnp.arrays(np.float32, st.tuples(st.just(2), st.integers(2, 6),
                                     st.integers(2, 6), st.integers(2, 6),
                                     st.just(3)),
               elements=st.floats(-10, 10, width=32)),
    st.tuples(st.booleans(), st.booleans(), st.booleans()),
)
@settings(**SMALL)
def test_apply_flips_is_involution(x, flags):
    """_apply_flips is its own inverse — the TTA unflip is exact."""
    import jax.numpy as jnp

    from braintpu.infer.sliding_window import _apply_flips

    f = jnp.asarray(np.tile(np.array(flags, dtype=bool), (x.shape[0], 1)))
    y = _apply_flips(_apply_flips(jnp.asarray(x), f), f)
    np.testing.assert_array_equal(np.asarray(y), x)


# ---------------------------------------------------------------------------
# Clinical-governance fuzz: the report engine's hallucination guards must
# hold for EVERY summary, not just the golden examples.
# ---------------------------------------------------------------------------

hemis = st.sampled_from(["left", "right", "bilateral", "midline", "unknown"])
lobes = st.sampled_from(
    ["frontal", "parietal", "temporal", "occipital", "deep", "unknown"])
patterns = st.sampled_from(
    ["Ring-enhancing", "Solid", "Heterogeneous", "None", "unknown"])


@st.composite
def summaries(draw):
    vol = draw(st.floats(0, 500))
    return {
        "case_id": "FUZZ-0001",
        "patient_info": {"age": "<not provided>", "sex": "<not provided>",
                         "clinical_history": "<not provided>",
                         "relevant_prior_imaging": "<not provided>"},
        "technique": {
            "sequences_performed": draw(st.lists(
                st.sampled_from(["T1", "T1CE", "T2", "FLAIR"]),
                min_size=1, max_size=4, unique=True)),
            "contrast_administered": draw(st.booleans()),
        },
        "tumor_characteristics": {
            "volume_cm3": vol,
            "edema_volume_cm3": draw(st.floats(0, 200)),
            "max_diameter_mm": draw(st.floats(0, 150)),
        },
        "location": {
            "hemisphere": draw(hemis),
            "primary_lobe": draw(lobes),
            "involved_lobes": draw(st.lists(lobes, max_size=3, unique=True)),
            "depth": draw(st.sampled_from(
                ["Superficial", "Subcortical", "Deep", "unknown"])),
        },
        "enhancement": {"present": draw(st.booleans()),
                        "pattern": draw(patterns),
                        "heterogeneity": draw(st.sampled_from(
                            ["Homogeneous", "Heterogeneous", "unknown"]))},
        "necrosis": {"present": draw(st.booleans()),
                     "percentage": draw(st.floats(0, 100)),
                     "location": "Central"},
        "mass_effect": {"midline_shift_mm": draw(st.floats(0, 25)),
                        "shift_direction": draw(
                            st.sampled_from(["left", "right", "unknown"]))},
        "morphology": {"shape": draw(st.sampled_from(
            ["irregular", "round", "lobulated", "unknown"]))},
        "multiplicity": {
            "lesion_count": draw(st.integers(0, 12)),
            "distribution_pattern": draw(st.sampled_from(
                ["Solitary", "Multifocal", "Disseminated", "unknown"])),
        },
        "normal_structures": {
            "ventricular_system": {
                "size": draw(st.sampled_from(["Normal", "Enlarged",
                                              "Compressed", "unknown"])),
                "symmetry": draw(st.sampled_from(
                    ["Symmetric", "Asymmetric", "unknown"])),
                "hydrocephalus": draw(st.booleans()),
            },
            "parenchyma": {"overall": "Normal",
                           "white_matter_disease": draw(st.booleans())},
        },
        "differential_considerations": draw(st.lists(
            st.sampled_from(["Primary glioma", "Solitary metastasis",
                             "Lymphoma", "Abscess"]),
            max_size=3, unique=True)),
    }


@given(summaries())
@settings(max_examples=20, deadline=None)
def test_report_governance_holds_for_any_summary(summary):
    """For every summary: generation never raises, is deterministic, the
    FINDINGS section carries no diagnostic language, and no globally
    banned word survives the gatekeeper anywhere in the report."""
    import re

    from braintpu.report import governance
    from braintpu.report.engine import generate_report_from_summary

    report, log, facts = generate_report_from_summary(summary)
    report2, _, _ = generate_report_from_summary(summary)
    assert report == report2  # deterministic
    low = report.lower()
    for banned in governance.GLOBAL_BANNED_WORDS:
        for m in re.finditer(re.escape(banned.lower()), low):
            ctx = low[max(0, m.start() - 20): m.end() + 20]
            # allowed compounds (e.g. "histopathologic correlation") are
            # the validator's documented exception — accept only those
            assert any(
                comp.lower() in ctx
                for comp in governance.ALLOWED_COMPOUND_WORDS
            ), f"banned word {banned!r} in report: ...{ctx}..."
    assert "FINDINGS" in report and "IMPRESSION" in report


@given(
    st.sampled_from(__import__("braintpu.rag.assistant",
                               fromlist=["BLOCKED_KEYWORDS"]).BLOCKED_KEYWORDS),
    st.text(
        alphabet=st.characters(codec="ascii",
                               categories=("Lu", "Ll", "Nd", "Zs")),
        max_size=40,
    ),
    st.booleans(),
)
@settings(max_examples=40, deadline=None)
def test_rag_gate_blocks_every_keyword_everywhere(keyword, noise, upper):
    """Any query containing a blocked keyword — any casing, any
    surrounding text — is refused BEFORE retrieval or LLM contact."""
    from braintpu.rag.assistant import (
        REFUSAL_CLINICAL,
        RagAssistant,
        is_clinical_query,
    )

    q = f"{noise} {keyword.upper() if upper else keyword} {noise[::-1]}"
    assert is_clinical_query(q)

    class ExplodingStore:
        def retrieve(self, *a, **k):
            raise AssertionError("retrieval reached for a clinical query")

    class ExplodingClient:
        def generate(self, *a, **k):
            raise AssertionError("LLM reached for a clinical query")

    assistant = RagAssistant.__new__(RagAssistant)
    assistant.store = ExplodingStore()
    assistant.client = ExplodingClient()
    assistant.top_k = 2
    assert assistant.answer_query(q, "report text") == REFUSAL_CLINICAL
