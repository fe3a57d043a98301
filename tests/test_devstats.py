"""Device-batched feature statistics parity vs the host numpy path.

features/devstats.py computes every region × modality masked-intensity
summary in one jitted program (segment reductions + one shared sort per
modality with cumulative-count subset quantiles).  These tests pin it to
the reference-semantics host implementation (context.intensity_stats /
brain_mask_from) on randomized volumes, including empty regions.
"""

import numpy as np
import pytest

from braintpu.features.context import (
    FeatureContext,
    brain_mask_from,
    intensity_stats,
    tumor_masks_from_seg,
)
from braintpu.features.devstats import REGIONS, compute_case_stats


def synth(seed=0, shape=(24, 28, 20), labels=(0, 1, 2, 3)):
    rng = np.random.default_rng(seed)
    mods = {
        m: np.abs(rng.normal(300 + 40 * i, 80, shape)).astype(np.float32)
        for i, m in enumerate(("t1", "t1ce", "t2", "flair"))
    }
    for m in mods:  # a zero background like skull-stripped MRI
        mods[m][:3] = 0
    seg = rng.choice(labels, size=shape, p=None).astype(np.int32)
    seg[:6] = 0  # keep some guaranteed background
    return mods, seg


def assert_stats_close(dev: dict, host: dict, context: str):
    assert dev["voxel_count"] == host["voxel_count"], context
    if host["voxel_count"] == 0:
        assert dev["mean"] is None
        return
    for k in ("mean", "std", "min", "max", "median", "q25", "q75"):
        np.testing.assert_allclose(
            dev[k], host[k], rtol=2e-4, atol=2e-3, err_msg=f"{context}:{k}"
        )


@pytest.mark.parametrize(
    "seed,labels",
    [
        (0, (0, 1, 2, 3)),
        (1, (0, 2, 4)),
        (2, (0,)),
        # foreign label 7: counts toward WT (host wt = seg > 0) but never
        # toward NCR/ED/ET/TC and is not 'normal' background
        (3, (0, 2, 3, 7)),
        # negative labels: background on the host (seg > 0 excludes them);
        # the device kernel must not fold them into the WT bucket
        (4, (-1, 0, 1, 3)),
    ],
)
def test_device_stats_match_host(seed, labels):
    mods, seg = synth(seed, labels=labels)
    dev = compute_case_stats(mods, seg)
    masks = tumor_masks_from_seg(seg)
    for region in REGIONS:
        for m, data in mods.items():
            host = intensity_stats(data, masks[region])
            assert_stats_close(dev[region][m], host, f"{region}/{m}")
    for m, data in mods.items():
        normal = brain_mask_from(data) & (seg == 0)
        host = intensity_stats(data, normal)
        assert_stats_close(dev["normal"][m], host, f"normal/{m}")


def test_step1_identical_under_device_flag(monkeypatch):
    """Step 1 output is unchanged (within float noise) when the device
    stats path is switched on via BRAINTPU_DEVICE_FEATURES=1."""
    from braintpu.features import analyze_sequence_findings

    mods, seg = synth(3)
    host_ctx = FeatureContext.from_arrays(mods, seg)
    monkeypatch.delenv("BRAINTPU_DEVICE_FEATURES", raising=False)
    host_out = analyze_sequence_findings(host_ctx)

    monkeypatch.setenv("BRAINTPU_DEVICE_FEATURES", "1")
    dev_ctx = FeatureContext.from_arrays(mods, seg)
    dev_out = analyze_sequence_findings(dev_ctx)

    # bin labels and schema must agree exactly; floats to ~1e-3
    def strip(d):
        if isinstance(d, dict):
            return {k: strip(v) for k, v in d.items()}
        if isinstance(d, float):
            return round(d, 1)  # f32-vs-f64 noise sits at ~1e-2 on raw stats
        return d

    assert strip(dev_out["region_signal_analysis"]) == strip(
        host_out["region_signal_analysis"]
    )
    assert dev_out["contrast_enhancement"]["pattern"] == (
        host_out["contrast_enhancement"]["pattern"]
    )
    assert dev_out["t2_flair_mismatch"] == host_out["t2_flair_mismatch"]


def test_quality_stats_match_host():
    """compute_quality_stats reproduces step5's per-sequence SNR-block
    reductions (brain moments, nonzero-p10 background std, zero and
    outlier counts)."""
    from braintpu.features.devstats import compute_quality_stats

    mods, seg = synth(5)
    brain = brain_mask_from(mods["t1"])
    dev = compute_quality_stats(mods, brain)
    for m, data in mods.items():
        s = dev[m]
        bv = data[brain]
        assert s["n_brain"] == bv.size
        np.testing.assert_allclose(s["mean"], bv.mean(), rtol=1e-4)
        np.testing.assert_allclose(s["std"], bv.std(), rtol=1e-3)
        nz = data[data > 0]
        bg = ~brain & (data > 0) & (data < np.percentile(nz, 10))
        assert abs(s["bg_count"] - int(bg.sum())) <= 2  # p10 f32 boundary
        if bg.sum() > 100:
            np.testing.assert_allclose(s["bg_std"], data[bg].std(), rtol=5e-2)
        assert s["zeros_in_brain"] == int(((data == 0) & brain).sum())
        q01, q25, q75, q99 = np.percentile(bv, [1, 25, 75, 99])
        iqr = q75 - q25
        host_out = int((bv > q99 + 3 * iqr).sum() + (bv < q01 - 3 * iqr).sum())
        assert abs(s["outliers"] - host_out) <= 2


def test_step5_image_quality_identical_under_device_flag(monkeypatch):
    from braintpu.features.step5_quality import assess_image_quality

    mods, seg = synth(6)
    monkeypatch.delenv("BRAINTPU_DEVICE_FEATURES", raising=False)
    host = assess_image_quality(FeatureContext.from_arrays(mods, seg))
    monkeypatch.setenv("BRAINTPU_DEVICE_FEATURES", "1")
    dev = assess_image_quality(FeatureContext.from_arrays(mods, seg))
    assert dev["overall_quality"] == host["overall_quality"]
    for name in host["sequences"]:
        h, d = host["sequences"][name], dev["sequences"][name]
        assert d["quality"] == h["quality"]
        assert d["issues"] == h["issues"]
        np.testing.assert_allclose(d["snr_estimate"], h["snr_estimate"], rtol=5e-2)
        np.testing.assert_allclose(d["mean_intensity"], h["mean_intensity"], rtol=1e-4)


def test_empty_segmentation():
    mods, seg = synth(4)
    seg[:] = 0
    dev = compute_case_stats(mods, seg)
    for region in REGIONS:
        for m in mods:
            assert dev[region][m]["voxel_count"] == 0
            assert dev[region][m]["mean"] is None
    # normal-brain reference still populated
    assert dev["normal"]["t1"]["voxel_count"] > 0


def synth_tumor_blob(seed=0, shape=(40, 44, 36)):
    """Volume with a compact tumor blob (so dilation has real geometry)."""
    rng = np.random.default_rng(seed)
    mods = {
        m: np.abs(rng.normal(300 + 40 * i, 80, shape)).astype(np.float32)
        for i, m in enumerate(("t1", "t1ce", "t2", "flair"))
    }
    for m in mods:
        mods[m][:3] = 0
        mods[m][-3:] = 0
    seg = np.zeros(shape, np.int32)
    seg[8:18, 12:24, 10:20] = 2
    seg[10:15, 15:21, 12:17] = 1
    seg[12:14, 17:19, 13:15] = 3
    return mods, seg


def test_mass_effect_stats_match_host():
    """The fused step-2 kernel reproduces the host reductions: exact
    integer slab/region counts (incl. the 10x cross dilation == scipy
    binary_dilation) and f32-close threshold/spreads."""
    from scipy import ndimage

    from braintpu.features.devstats import compute_mass_effect_stats

    mods, seg = synth_tumor_blob(5)
    t1 = mods["t1"]
    wt = seg > 0
    brain = brain_mask_from(t1)
    dev = compute_mass_effect_stats(t1, wt, brain)

    np.testing.assert_array_equal(dev["per_x_brain"], brain.sum(axis=(1, 2)))
    np.testing.assert_array_equal(dev["per_x_tumor"], wt.sum(axis=(1, 2)))

    thr_host = np.percentile(t1[brain], 15)
    np.testing.assert_allclose(dev["csf_threshold"], thr_host, rtol=1e-5)
    # hemispheric CSF counts, evaluated at the device threshold for exactness
    csf = (t1 < np.float32(dev["csf_threshold"])) & (t1 > 0) & ~wt
    mid = t1.shape[0] // 2
    assert dev["csf_left"] == int(csf[:mid].sum())
    assert dev["csf_right"] == int(csf[mid:].sum())

    expanded = ndimage.binary_dilation(wt, iterations=10)
    peritumoral = expanded & ~wt & brain
    distant = brain & ~expanded
    assert dev["peri_count"] == int(peritumoral.sum())
    assert dev["distant_count"] == int(distant.sum())
    np.testing.assert_allclose(
        dev["peri_std"], float(t1[peritumoral].std()), rtol=1e-4
    )
    np.testing.assert_allclose(
        dev["distant_std"], float(t1[distant].std()), rtol=1e-4
    )


def test_step2_identical_under_device_flag(monkeypatch):
    """analyze_mass_effect decisions and key numerics are unchanged when
    the device path is on."""
    from braintpu.features.step2_mass_effect import analyze_mass_effect

    mods, seg = synth_tumor_blob(7)
    monkeypatch.delenv("BRAINTPU_DEVICE_FEATURES", raising=False)
    host = analyze_mass_effect(FeatureContext.from_arrays(mods, seg))
    monkeypatch.setenv("BRAINTPU_DEVICE_FEATURES", "1")
    dev = analyze_mass_effect(FeatureContext.from_arrays(mods, seg))

    hm, dm = host["midline_shift"], dev["midline_shift"]
    np.testing.assert_allclose(dm["shift_mm"], hm["shift_mm"], atol=1e-6)
    assert dm["severity"] == hm["severity"]
    assert dm["tumor_hemisphere"] == hm["tumor_hemisphere"]

    hv, dv = host["ventricular_compression"], dev["ventricular_compression"]
    np.testing.assert_allclose(
        dv["asymmetry_ratio"], hv["asymmetry_ratio"], atol=2e-3
    )
    assert dv["severity"] == hv["severity"]
    if hv["tumor_to_ventricle_distance_mm"] is not None:
        np.testing.assert_allclose(
            dv["tumor_to_ventricle_distance_mm"],
            hv["tumor_to_ventricle_distance_mm"],
            atol=0.5,
        )

    hs, ds = host["sulcal_effacement"], dev["sulcal_effacement"]
    np.testing.assert_allclose(
        ds["variance_ratio"], hs["variance_ratio"], rtol=1e-3
    )
    assert ds["severity"] == hs["severity"]
    assert (
        dev["herniation_risk"]["mass_effect_score"]
        == host["herniation_risk"]["mass_effect_score"]
    )


def test_step2_no_tumor_under_device_flag(monkeypatch):
    """Tumor-free cases never touch the mass-effect kernel's tumor math."""
    from braintpu.features.step2_mass_effect import analyze_mass_effect

    mods, _ = synth_tumor_blob(9)
    seg = np.zeros(mods["t1"].shape, np.int32)
    monkeypatch.setenv("BRAINTPU_DEVICE_FEATURES", "1")
    res = analyze_mass_effect(FeatureContext.from_arrays(mods, seg))
    assert res["midline_shift"]["severity"] == "No tumor detected"


def test_artifact_stats_match_host():
    """The artifact kernel reproduces the host passes: exact erosion-edge
    / per-z / background counts and close sobel-gradient stats."""
    from scipy.ndimage import binary_erosion, sobel

    from braintpu.features.devstats import compute_artifact_stats

    mods, seg = synth_tumor_blob(11)
    t1 = mods["t1"]
    wt = seg > 0
    brain = brain_mask_from(t1)
    dev = compute_artifact_stats(mods, brain, wt)

    # bias-field shells (f32 center → shell membership can differ by a
    # boundary voxel; means must agree closely)
    coords = np.nonzero(brain)
    center = np.array([c.mean() for c in coords])
    dist = np.sqrt(sum((coords[i] - center[i]) ** 2 for i in range(3)))
    inner = t1[brain][dist < dist.max() * 0.3]
    outer = t1[brain][dist > dist.max() * 0.7]
    assert abs(dev["inner_count"] - inner.size) <= 2
    assert abs(dev["outer_count"] - outer.size) <= 2
    np.testing.assert_allclose(dev["inner_mean"], inner.mean(), rtol=1e-3)
    np.testing.assert_allclose(dev["outer_mean"], outer.mean(), rtol=1e-3)

    for m, data in mods.items():
        bg = ~brain & (data > 0)
        st = dev[f"bg_{m}"]
        assert st["count"] == int(bg.sum())
        if st["count"]:
            np.testing.assert_allclose(st["mean"], data[bg].mean(), rtol=1e-5)
            np.testing.assert_allclose(st["std"], data[bg].std(), rtol=1e-4)

    zc = (t1 == 0) & brain
    np.testing.assert_array_equal(dev["per_z_zero"], zc.sum(axis=(0, 1)))
    np.testing.assert_array_equal(dev["per_z_brain"], brain.sum(axis=(0, 1)))

    m5 = 5
    host_edges = [t1[:m5].max(), t1[-m5:].max(), t1[:, :m5].max(), t1[:, -m5:].max()]
    np.testing.assert_allclose(dev["edge_max"], host_edges)

    edge = wt & ~binary_erosion(wt, iterations=2)
    assert dev["gibbs_edge_count"] == int(edge.sum())
    g = np.sqrt(
        sobel(t1.astype(float), axis=0) ** 2
        + sobel(t1.astype(float), axis=1) ** 2
        + sobel(t1.astype(float), axis=2) ** 2
    )
    np.testing.assert_allclose(dev["gibbs_grad_mean"], g[edge].mean(), rtol=1e-4)
    np.testing.assert_allclose(dev["gibbs_grad_std"], g[edge].std(), rtol=1e-3)


def test_step5_artifacts_identical_under_device_flag(monkeypatch):
    """detect_artifacts decisions are unchanged when the device path is
    on (counts exact, CV/ratio thresholds far from float noise)."""
    from braintpu.features.step5_quality import detect_artifacts

    mods, seg = synth_tumor_blob(13)
    monkeypatch.delenv("BRAINTPU_DEVICE_FEATURES", raising=False)
    host = detect_artifacts(FeatureContext.from_arrays(mods, seg))
    monkeypatch.setenv("BRAINTPU_DEVICE_FEATURES", "1")
    dev = detect_artifacts(FeatureContext.from_arrays(mods, seg))

    assert dev["artifacts_detected"] == host["artifacts_detected"]
    assert dev["severity"] == host["severity"]
    for key in ("intensity_inhomogeneity", "motion_ghosting", "susceptibility",
                "wrap_around", "gibbs_ringing"):
        assert dev["details"][key]["detected"] == host["details"][key]["detected"], key
    hr = host["details"]["intensity_inhomogeneity"].get("ratio")
    dr = dev["details"]["intensity_inhomogeneity"].get("ratio")
    if hr is not None:
        np.testing.assert_allclose(dr, hr, rtol=1e-3)


def test_artifact_stats_empty_masks():
    """Empty brain/tumor must produce zero counts (host logic then skips
    every detector) — no NaNs or infs leak out of the kernel."""
    from braintpu.features.devstats import compute_artifact_stats

    shape = (16, 18, 14)
    mods = {m: np.zeros(shape, np.float32) for m in ("t1", "t1ce", "t2", "flair")}
    brain = np.zeros(shape, bool)
    wt = np.zeros(shape, bool)
    dev = compute_artifact_stats(mods, brain, wt)
    assert dev["inner_count"] == 0 and dev["outer_count"] == 0
    assert dev["gibbs_edge_count"] == 0
    assert np.isfinite(dev["gibbs_grad_mean"]) and np.isfinite(dev["gibbs_grad_std"])
    assert dev["per_z_brain"].sum() == 0
    for m in mods:
        assert dev[f"bg_{m}"]["count"] == 0


def test_step5_artifacts_no_tumor_under_device_flag(monkeypatch):
    from braintpu.features.step5_quality import detect_artifacts

    mods, _ = synth_tumor_blob(17)
    seg = np.zeros(mods["t1"].shape, np.int32)
    monkeypatch.setenv("BRAINTPU_DEVICE_FEATURES", "1")
    res = detect_artifacts(FeatureContext.from_arrays(mods, seg))
    assert res["details"]["gibbs_ringing"] == {"detected": False}


def test_device_edt_exact_vs_scipy():
    """The separable min-plus squared-EDT is EXACT: d² terms are integers
    below 2^24, so the f32 kernel matches scipy's f64 EDT bit-for-bit
    after sqrt."""
    import jax.numpy as jnp
    from scipy.ndimage import distance_transform_edt

    from braintpu.features.devstats import _edt_sq

    rng = np.random.default_rng(3)
    for shape in [(12, 15, 9), (31, 8, 17)]:
        mask = rng.random(shape) > 0.7
        mask[0, 0, 0] = False  # guarantee a background voxel
        dev = np.sqrt(np.asarray(_edt_sq(jnp.asarray(mask))))
        host = distance_transform_edt(mask)
        np.testing.assert_allclose(dev, host, rtol=1e-6, atol=1e-5)


def test_morphology_stats_match_host():
    from scipy.ndimage import (
        binary_dilation,
        binary_erosion,
        distance_transform_edt,
    )

    from braintpu.features.devstats import compute_morphology_stats

    mods, seg = synth_tumor_blob(19)
    t1ce = mods["t1ce"]
    wt = seg > 0
    dev = compute_morphology_stats(t1ce, wt)

    surface = wt & ~binary_erosion(wt)
    assert dev["surface_count"] == int(surface.sum())
    signed = distance_transform_edt(wt) - distance_transform_edt(~wt)
    grads = np.gradient(signed)
    gm = np.sqrt(grads[0] ** 2 + grads[1] ** 2 + grads[2] ** 2)[surface]
    np.testing.assert_allclose(dev["grad_mean"], gm.mean(), rtol=1e-5)
    np.testing.assert_allclose(dev["grad_std"], gm.std(), rtol=1e-4)

    peri = binary_dilation(wt, iterations=5) & ~wt
    outer = binary_dilation(wt) & ~wt
    assert dev["peri_count"] == int(peri.sum())
    assert dev["outer_count"] == int(outer.sum())
    np.testing.assert_allclose(dev["wt_t1ce_mean"], t1ce[wt].mean(), rtol=1e-5)
    np.testing.assert_allclose(dev["peri_t1ce_mean"], t1ce[peri].mean(), rtol=1e-5)
    np.testing.assert_allclose(dev["outer_mean"], t1ce[outer].mean(), rtol=1e-5)
    np.testing.assert_allclose(dev["outer_std"], t1ce[outer].std(), rtol=1e-4)
    np.testing.assert_allclose(dev["inner_mean"], t1ce[surface].mean(), rtol=1e-5)


def test_step4_identical_under_device_flag(monkeypatch):
    from braintpu.features.step4_morphology import analyze_morphology

    mods, seg = synth_tumor_blob(23)
    monkeypatch.delenv("BRAINTPU_DEVICE_FEATURES", raising=False)
    host = analyze_morphology(FeatureContext.from_arrays(mods, seg))
    monkeypatch.setenv("BRAINTPU_DEVICE_FEATURES", "1")
    dev = analyze_morphology(FeatureContext.from_arrays(mods, seg))

    hb, db = host["border_regularity"], dev["border_regularity"]
    np.testing.assert_allclose(db["regularity_score"], hb["regularity_score"], rtol=1e-4)
    assert db["classification"] == hb["classification"]
    assert db["surface_voxel_count"] == hb["surface_voxel_count"]

    hm, dm = host["margin_definition"], dev["margin_definition"]
    # contrast is a difference of close f32 means — absolute noise floor
    np.testing.assert_allclose(
        dm["margin_sharpness"], hm["margin_sharpness"], rtol=1e-3, atol=1e-5
    )
    np.testing.assert_allclose(
        dm["contrast_ratio"], hm["contrast_ratio"], rtol=1e-3, atol=1e-5
    )
    assert dm["classification"] == hm["classification"]

    hs, ds = host["shape_descriptors"], dev["shape_descriptors"]
    np.testing.assert_allclose(ds["surface_area_mm2"], hs["surface_area_mm2"], rtol=1e-6)
    np.testing.assert_allclose(ds["sphericity"], hs["sphericity"], rtol=1e-6)


def test_step4_no_tumor_under_device_flag(monkeypatch):
    from braintpu.features.step4_morphology import analyze_morphology

    mods, _ = synth_tumor_blob(29)
    seg = np.zeros(mods["t1"].shape, np.int32)
    monkeypatch.setenv("BRAINTPU_DEVICE_FEATURES", "1")
    res = analyze_morphology(FeatureContext.from_arrays(mods, seg))
    assert res["border_regularity"]["classification"] == "No tumor"
    assert res["margin_definition"]["classification"] == "No tumor"


def test_parenchyma_stats_match_host():
    from scipy.ndimage import distance_transform_edt

    from braintpu.features.devstats import compute_parenchyma_stats

    mods, seg = synth_tumor_blob(31)
    t1, flair = mods["t1"], mods["flair"]
    wt = seg > 0
    brain = brain_mask_from(t1)
    dev = compute_parenchyma_stats(t1, flair, brain, wt)

    normal = brain & ~wt
    bd = distance_transform_edt(brain)
    deep = normal & (bd > np.percentile(bd[brain], 60))
    cort = normal & (bd < np.percentile(bd[brain], 40))
    assert dev["normal_count"] == int(normal.sum())
    assert dev["brain_count"] == int(brain.sum())
    # f32 sqrt can flip voxels tied at the threshold: allow a hair's width
    assert abs(dev["deep_count"] - int(deep.sum())) <= 3
    assert abs(dev["cortical_count"] - int(cort.sum())) <= 3
    np.testing.assert_allclose(dev["deep_t1_mean"], t1[deep].mean(), rtol=1e-3)
    np.testing.assert_allclose(dev["cortical_t1_mean"], t1[cort].mean(), rtol=1e-3)
    np.testing.assert_allclose(
        dev["cortical_flair_mean"], flair[cort].mean(), rtol=1e-3
    )


def test_step6_identical_under_device_flag(monkeypatch):
    from braintpu.features.step6_normal_structures import analyze_normal_structures

    mods, seg = synth_tumor_blob(37)
    monkeypatch.delenv("BRAINTPU_DEVICE_FEATURES", raising=False)
    host = analyze_normal_structures(FeatureContext.from_arrays(mods, seg))
    monkeypatch.setenv("BRAINTPU_DEVICE_FEATURES", "1")
    dev = analyze_normal_structures(FeatureContext.from_arrays(mods, seg))

    hp, dp = host["parenchyma"], dev["parenchyma"]
    np.testing.assert_allclose(
        dp["periventricular_assessment"]["hyperintensity_ratio"],
        hp["periventricular_assessment"]["hyperintensity_ratio"],
        rtol=1e-3,
    )
    np.testing.assert_allclose(
        dp["gray_white_differentiation"]["ratio"],
        hp["gray_white_differentiation"]["ratio"],
        rtol=1e-3,
    )
    assert (
        dp["gray_white_differentiation"]["assessment"]
        == hp["gray_white_differentiation"]["assessment"]
    )
    assert dp["overall_assessment"] == hp["overall_assessment"]
    np.testing.assert_allclose(
        dp["normal_brain_volume_cm3"], hp["normal_brain_volume_cm3"]
    )


def test_device_volumes_shared_upload_parity():
    """Every wrapper given a shared DeviceVolumes (one upload per case)
    returns exactly what the per-call upload path returns — the arrays
    are identical device values, only the transfer count differs."""
    from braintpu.features.devstats import (
        DeviceVolumes,
        compute_artifact_stats,
        compute_case_stats,
        compute_mass_effect_stats,
        compute_morphology_stats,
        compute_parenchyma_stats,
    )

    mods, seg = synth(11)
    brain = brain_mask_from(mods["t1"])
    wt = tumor_masks_from_seg(seg)["wt"]
    dev = DeviceVolumes(mods, seg, brain)

    def flat_eq(a, b, path=""):
        assert type(a) is type(b), path
        if isinstance(a, dict):
            assert a.keys() == b.keys(), path
            for k in a:
                flat_eq(a[k], b[k], f"{path}.{k}")
        elif isinstance(a, np.ndarray):
            np.testing.assert_array_equal(a, b, err_msg=path)
        else:
            assert a == b, f"{path}: {a} != {b}"

    flat_eq(
        compute_case_stats(mods, seg, brain, dev=dev),
        compute_case_stats(mods, seg, brain),
    )
    flat_eq(
        compute_mass_effect_stats(mods["t1"], wt, brain, dev=dev),
        compute_mass_effect_stats(mods["t1"], wt, brain),
    )
    flat_eq(
        compute_artifact_stats(mods, brain, wt, dev=dev),
        compute_artifact_stats(mods, brain, wt),
    )
    flat_eq(
        compute_morphology_stats(mods["t1ce"], wt, dev=dev),
        compute_morphology_stats(mods["t1ce"], wt),
    )
    flat_eq(
        compute_parenchyma_stats(mods["t1"], mods["flair"], brain, wt, dev=dev),
        compute_parenchyma_stats(mods["t1"], mods["flair"], brain, wt),
    )


def test_feature_context_single_device_volumes(monkeypatch):
    """The context builds DeviceVolumes once and routes every device
    kernel through it (no per-kernel re-upload)."""
    import braintpu.features.devstats as ds

    monkeypatch.setenv("BRAINTPU_DEVICE_FEATURES", "1")
    mods, seg = synth(12)
    ctx = FeatureContext.from_arrays(mods, seg)
    builds = []
    orig = ds.DeviceVolumes.__init__

    def counting(self, *a, **kw):
        builds.append(1)
        orig(self, *a, **kw)

    monkeypatch.setattr(ds.DeviceVolumes, "__init__", counting)
    ctx.region_stats("wt", "t1")
    ctx.mass_effect_stats()
    ctx.artifact_stats()
    ctx.morphology_stats()
    ctx.parenchyma_stats()
    assert sum(builds) == 1


def test_device_feature_groups_parsing(monkeypatch):
    """BRAINTPU_DEVICE_FEATURES resolves per-group: off/all/explicit list;
    'auto' is off on CPU-only hosts (tests pin JAX_PLATFORMS=cpu)."""
    import braintpu.features.devstats as ds

    monkeypatch.setenv("BRAINTPU_DEVICE_FEATURES", "0")
    assert ds.device_feature_groups() == frozenset()
    assert not ds.device_features_enabled()
    monkeypatch.setenv("BRAINTPU_DEVICE_FEATURES", "1")
    assert ds.device_feature_groups() == frozenset(ds.GROUPS)
    assert ds.device_features_enabled("stats")
    monkeypatch.setenv("BRAINTPU_DEVICE_FEATURES", "artifacts, parenchyma")
    assert ds.device_feature_groups() == {"artifacts", "parenchyma"}
    assert ds.device_features_enabled("artifacts")
    assert not ds.device_features_enabled("stats")
    assert ds.device_features_enabled()  # any group active
    monkeypatch.setenv("BRAINTPU_DEVICE_FEATURES", "artifacts,bogus")
    assert ds.device_feature_groups() == {"artifacts"}
    monkeypatch.delenv("BRAINTPU_DEVICE_FEATURES", raising=False)
    # default 'auto': no accelerator in the test env -> host path
    assert ds.device_feature_groups() == frozenset()


def test_hybrid_group_routing(monkeypatch):
    """With only 'artifacts' routed to the device, the context keeps the
    shared-sort stats on host while step5's artifact detector goes through
    the device kernel."""
    monkeypatch.setenv("BRAINTPU_DEVICE_FEATURES", "artifacts")
    mods, seg = synth(13)
    ctx = FeatureContext.from_arrays(mods, seg)
    assert not ctx._use_device_stats("stats")
    assert ctx._use_device_stats("artifacts")
    from braintpu.features import step5_quality

    out = step5_quality.analyze_quality(ctx)
    # same schema/decisions as the host run
    monkeypatch.setenv("BRAINTPU_DEVICE_FEATURES", "0")
    ctx2 = FeatureContext.from_arrays(mods, seg)
    ref = step5_quality.analyze_quality(ctx2)
    assert out["artifact_detection"]["artifacts_detected"] == \
        ref["artifact_detection"]["artifacts_detected"]


def test_device_volumes_halfwidth_and_background_upload(monkeypatch):
    """Half-width (int16) upload is exact for integer-valued volumes, the
    narrow seg dtype widens back losslessly, and the background-upload
    thread hands the SAME DeviceVolumes to device_volumes()."""
    import jax.numpy as jnp

    from braintpu.features.devstats import DeviceVolumes

    mods, seg = synth(14)
    int_mods = {k: np.round(np.abs(v) * 10).astype(np.float32) for k, v in mods.items()}
    brain = brain_mask_from(int_mods["t1"])
    dv = DeviceVolumes(int_mods, seg, brain)
    assert dv._raw.dtype == jnp.int16  # integral values ride half-width
    assert dv._seg_raw.dtype == jnp.int8  # BraTS labels fit int8
    assert dv.data.dtype == jnp.float32 and dv.seg.dtype == jnp.int32
    np.testing.assert_array_equal(
        np.asarray(dv.modality("t1")), int_mods["t1"]
    )
    np.testing.assert_array_equal(np.asarray(dv.seg), np.round(seg).astype(np.int32))

    # non-integral values must stay f32 (the round-trip check fails)
    frac = dict(int_mods)
    frac["t1"] = int_mods["t1"] + 0.5
    dv2 = DeviceVolumes(frac, seg, brain)
    assert dv2._raw.dtype == jnp.float32

    # background upload: start_device_upload builds once, join hands it over
    monkeypatch.setenv("BRAINTPU_DEVICE_FEATURES", "artifacts")
    ctx = FeatureContext.from_arrays(int_mods, seg)
    ctx.start_device_upload()
    assert ctx._device_upload is not None
    first = ctx.device_volumes()
    assert ctx._device_upload is None
    assert ctx.device_volumes() is first

    # and the kernels accept the background-built volumes
    from braintpu.features.devstats import compute_artifact_stats

    wt = tumor_masks_from_seg(seg)["wt"]
    a = compute_artifact_stats(int_mods, brain, wt, dev=first)
    b = compute_artifact_stats(int_mods, brain, wt)
    assert a["inner_count"] == b["inner_count"]
    np.testing.assert_allclose(a["inner_mean"], b["inner_mean"], rtol=1e-6)
