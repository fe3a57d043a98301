"""Sliding-window inference engine tests (grid, Gaussian, aggregation, e2e)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from braintpu.infer import (
    InferenceEngine,
    MIRROR_COMBOS,
    ModelBundle,
    calculate_volumes,
    gaussian_importance_map,
    patch_grid,
    predict_probs,
    region_probs_to_labels,
    sliding_window_starts,
    stack_folds,
)
from braintpu.io import brats
from braintpu.models import UNetConfig, init_params


def tiny_cfg(norm="batch"):
    return UNetConfig(
        in_channels=4,
        num_classes=3,
        base_features=4,
        max_features=16,
        num_pool=2,
        conv_per_stage=2,
        norm=norm,
        group_norm_groups=2,
        patch_size=(16, 16, 16),
        compute_dtype=jnp.float32,
    )


def test_gaussian_map_matches_nnunet_semantics():
    g = gaussian_importance_map((16, 16, 16))
    assert g.shape == (16, 16, 16)
    assert g.dtype == np.float32
    assert g.max() == pytest.approx(1.0)
    assert g.min() > 0  # zero-floor clamp
    center = g[8, 8, 8]
    assert center == pytest.approx(1.0)
    assert g[0, 0, 0] < 0.01  # strong falloff

    # cross-check against scipy directly
    from scipy.ndimage import gaussian_filter

    imp = np.zeros((16, 16, 16))
    imp[8, 8, 8] = 1
    ref = gaussian_filter(imp, [2, 2, 2], mode="constant")
    ref = (ref / ref.max()).astype(np.float32)
    ref[ref == 0] = ref[ref > 0].min()
    np.testing.assert_allclose(g, ref, rtol=1e-5)


def test_sliding_window_starts_formula():
    # size == patch → single patch at 0
    assert sliding_window_starts((16,), (16,)) == ((0,),)
    # nnU-Net formula: size 24, patch 16, target step 8 → 2 steps: 0 and 8
    assert sliding_window_starts((24,), (16,)) == ((0, 8),)
    # size 40, patch 16 → ceil(24/8)+1 = 4 steps, actual step 8
    assert sliding_window_starts((40,), (16,)) == ((0, 8, 16, 24),)
    # uneven: size 30, patch 16 → ceil(14/8)+1 = 3 steps of 7
    assert sliding_window_starts((30,), (16,)) == ((0, 7, 14),)


def test_patch_grid_covers_volume():
    grid = patch_grid((24, 16, 30), (16, 16, 16))
    assert grid.shape == (2 * 1 * 3, 3)
    ends = grid + 16
    assert ends[:, 0].max() == 24
    assert ends[:, 1].max() == 16
    assert ends[:, 2].max() == 30


def test_mirror_combos_complete():
    assert len(MIRROR_COMBOS) == 8
    assert len(set(MIRROR_COMBOS)) == 8


def test_aggregation_weights_sum():
    """With a constant-output 'network', the blended output must be constant
    regardless of patch overlap (weights normalize out)."""
    cfg = tiny_cfg()
    params = init_params(cfg, jax.random.PRNGKey(0))
    # zero all weights → logits 0 → sigmoid 0.5 everywhere
    params = jax.tree_util.tree_map(jnp.zeros_like, params)
    stacked = stack_folds([params])
    vol = jnp.asarray(np.random.default_rng(0).normal(size=(4, 24, 16, 30)).astype(np.float32))
    probs = np.asarray(predict_probs(stacked, vol, cfg, tta=False))
    np.testing.assert_allclose(probs, 0.5, atol=1e-5)


def test_tta_equivariance_on_symmetric_input():
    """TTA-averaged prediction of a flip-symmetric volume is flip-symmetric."""
    cfg = tiny_cfg()
    params = init_params(cfg, jax.random.PRNGKey(1))
    stacked = stack_folds([params])
    rng = np.random.default_rng(3)
    half = rng.normal(size=(4, 16, 16, 8)).astype(np.float32)
    vol = np.concatenate([half, half[:, :, :, ::-1]], axis=3)  # symmetric in z
    probs = np.asarray(predict_probs(stacked, jnp.asarray(vol), cfg, tta=True))
    np.testing.assert_allclose(probs, probs[:, :, ::-1, :], atol=2e-4)


def test_fold_ensemble_is_mean():
    cfg = tiny_cfg()
    p1 = init_params(cfg, jax.random.PRNGKey(2))
    p2 = init_params(cfg, jax.random.PRNGKey(3))
    vol = jnp.asarray(np.random.default_rng(1).normal(size=(4, 16, 16, 16)).astype(np.float32))
    probs_1 = np.asarray(predict_probs(stack_folds([p1]), vol, cfg, tta=False))
    probs_2 = np.asarray(predict_probs(stack_folds([p2]), vol, cfg, tta=False))
    probs_12 = np.asarray(predict_probs(stack_folds([p1, p2]), vol, cfg, tta=False))
    np.testing.assert_allclose(probs_12, (probs_1 + probs_2) / 2, atol=1e-5)


def test_region_probs_to_labels_overwrite_order():
    probs = np.zeros((2, 2, 2, 3), np.float32)
    probs[0, 0, 0] = [0.9, 0.1, 0.1]  # WT only → 1
    probs[1, 0, 0] = [0.9, 0.9, 0.1]  # WT+TC → 2
    probs[0, 1, 0] = [0.9, 0.9, 0.9]  # all → 3
    probs[1, 1, 0] = [0.1, 0.1, 0.9]  # ET overrides even without WT → 3
    seg = np.asarray(region_probs_to_labels(jnp.asarray(probs)))
    assert seg[0, 0, 0] == 1
    assert seg[1, 0, 0] == 2
    assert seg[0, 1, 0] == 3
    assert seg[1, 1, 0] == 3
    assert seg[0, 0, 1] == 0


def test_calculate_volumes():
    seg = np.zeros((10, 10, 10), np.uint8)
    seg[:2] = 1  # 200 NCR
    seg[2:4] = 2  # 200 ED
    seg[4:5] = 3  # 100 ET
    v = calculate_volumes(seg, voxel_volume_cm3=0.001, et_label=3)
    assert v["NCR"] == pytest.approx(0.2)
    assert v["ED"] == pytest.approx(0.2)
    assert v["ET"] == pytest.approx(0.1)
    assert v["TC"] == pytest.approx(0.3)
    assert v["WT"] == pytest.approx(0.5)


def test_engine_end_to_end_synthetic(synth_case):
    """Full engine on a synthetic case: run, save, reload, sanity-check."""
    cfg = tiny_cfg()
    folds = [init_params(cfg, jax.random.PRNGKey(i)) for i in range(2)]
    bundle = ModelBundle.from_folds(cfg, folds)
    assert bundle.folded  # BN folding happened
    engine = InferenceEngine(models=[bundle], tta=False)
    cases = brats.find_cases(synth_case)
    out_path = synth_case / "pred_seg.nii.gz"
    seg, info = engine.predict_case(cases[0], out_path)
    assert seg.shape == (48, 52, 44)
    assert set(np.unique(seg)) <= {0, 1, 2, 3}
    assert out_path.exists()
    assert "volumes_cm3" in info and info["total_s"] > 0

    from braintpu.io import nifti

    reloaded = nifti.load(out_path)
    np.testing.assert_array_equal(np.asarray(reloaded.dataobj), seg)


def test_engine_label_vs_softmax_ensemble(synth_case):
    cfg = tiny_cfg()
    b1 = ModelBundle.from_folds(cfg, [init_params(cfg, jax.random.PRNGKey(0))])
    b2 = ModelBundle.from_folds(cfg, [init_params(cfg, jax.random.PRNGKey(9))])
    cases = brats.find_cases(synth_case)
    from braintpu.io.brats import load_case_volumes

    data, _, _ = load_case_volumes(cases[0])
    kw = dict(tta=False, et_min_voxels=0, output_convention="internal")
    seg_soft, _ = InferenceEngine(models=[b1, b2], **kw).predict_case_array(data)
    seg_label, _ = InferenceEngine(
        models=[b1, b2], ensemble="label", **kw
    ).predict_case_array(data)
    assert seg_soft.shape == seg_label.shape
    # BEHAVIORAL pin (not just shape): label mode must equal the
    # repo-parity recipe round((l1+l2)/2) over the per-model INTERNAL
    # label maps (run_brats2021_inference_singlethread.py:288-312 averages
    # internal labels BEFORE any convention remap — the 1↔2 swap makes the
    # two orders inequivalent).  A label mode that silently falls through
    # to the softmax branch fails here.
    l1, _ = InferenceEngine(models=[b1], ensemble="label", **kw).predict_case_array(data)
    l2, _ = InferenceEngine(models=[b2], ensemble="label", **kw).predict_case_array(data)
    manual = np.round(
        (l1.astype(np.float32) + l2.astype(np.float32)) / 2.0
    ).astype(np.uint8)
    np.testing.assert_array_equal(seg_label, manual)
    # and with random weights the two ensemble semantics genuinely differ
    # somewhere (otherwise this test compares nothing)
    assert (seg_soft != seg_label).any()


def test_fullconv_matches_sliding_on_single_patch_volume():
    """When the volume is exactly one patch, the sliding grid has a single
    patch and the Gaussian normalizes out — fullconv must match it exactly,
    with and without mirror TTA."""
    from braintpu.infer import predict_probs_fullconv

    cfg = tiny_cfg()
    folds = [init_params(cfg, jax.random.PRNGKey(i)) for i in range(2)]
    stacked = stack_folds(folds)
    vol = jnp.asarray(
        np.random.default_rng(7).normal(size=(4, 16, 16, 16)).astype(np.float32)
    )
    for tta in (False, True):
        probs_sw = np.asarray(predict_probs(stacked, vol, cfg, tta=tta))
        probs_fc = np.asarray(predict_probs_fullconv(stacked, vol, cfg, tta=tta))
        np.testing.assert_allclose(probs_fc, probs_sw, atol=1e-5)


def test_fullconv_shape_and_axial_guards():
    from braintpu.infer import fullconv_predict

    cfg = tiny_cfg()
    stacked = stack_folds([init_params(cfg, jax.random.PRNGKey(0))])
    bad = jnp.zeros((10, 12, 12, 4), jnp.float32)  # 10 % 4 != 0
    with pytest.raises(ValueError, match="multiple"):
        fullconv_predict(stacked, bad, cfg)

    axial_cfg = UNetConfig(
        base_features=4,
        max_features=16,
        num_pool=2,
        patch_size=(16, 16, 16),
        compute_dtype=jnp.float32,
        axial_attention=True,
        attn_heads=1,
        attn_dim_head=4,
    )
    axial_params = init_params(axial_cfg, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="axial"):
        fullconv_predict(
            stack_folds([axial_params]), jnp.zeros((16, 16, 16, 4)), axial_cfg
        )


def test_engine_fullconv_mode(synth_case):
    """fullconv engine runs end-to-end and agrees with sliding mode labels on
    an easy (strongly saturated) synthetic prediction field."""
    # Receptive field must be well inside the patch, or every sliding-window
    # voxel is border-affected and the mode comparison measures only the
    # zero-pad context delta (at the real 128-patch scale RF/patch ≈ 1.4
    # but 50 % overlap + Gaussian blending keeps agreement >99 %; here we
    # use a shallow net where patch ≫ RF to make the bound tight).
    cfg = UNetConfig(
        in_channels=4, num_classes=3, base_features=4, max_features=8,
        num_pool=1, conv_per_stage=1, norm="batch",
        patch_size=(32, 32, 32), compute_dtype=jnp.float32,
    )

    def saturate(params):
        # scale the seg heads so sigmoids saturate: near-0.5 probabilities
        # flip on any numerical delta and measure nothing
        for stage in params["decoder"]:
            stage["seg"]["w"] = stage["seg"]["w"] * 12.0
        return params

    folds = [saturate(init_params(cfg, jax.random.PRNGKey(i))) for i in range(2)]
    bundle = ModelBundle.from_folds(cfg, folds)
    cases = brats.find_cases(synth_case)
    from braintpu.io.brats import load_case_volumes

    data, _, _ = load_case_volumes(cases[0])
    seg_fc, info = InferenceEngine(models=[bundle], tta=False, mode="fullconv").predict_case_array(data)
    seg_sw, _ = InferenceEngine(models=[bundle], tta=False).predict_case_array(data)
    assert seg_fc.shape == seg_sw.shape == data.shape[1:]
    assert set(np.unique(seg_fc)) <= {0, 1, 2, 3}
    assert info["total_s"] > 0
    # The modes differ only in patch-border context and blending; random
    # weights leave a rough prediction field whose decision surfaces are
    # large at toy scale, so threshold-marginal voxels genuinely flip
    # between modes (~2-12 % depending on seed — that is the math, not a
    # bug; trained weights measure >=0.99999 agreement, PERF.md).  The
    # bug-sensitive invariant is agreement on DECISIVELY classified
    # voxels: anywhere both outputs are neighborhood-uniform, the labels
    # must match exactly — a geometry bug (axis swap, crop off-by-one)
    # misaligns whole regions and fails this hard, while the loose global
    # bound below catches small shifts that slip past the stable mask.
    agreement = float(np.mean(seg_fc == seg_sw))
    assert agreement >= 0.85, f"fullconv vs sliding agreement {agreement:.4f}"

    def stable(seg):
        m = np.ones(seg.shape, bool)
        for ax in range(3):
            m &= np.roll(seg, 1, ax) == seg
            m &= np.roll(seg, -1, ax) == seg
        return m

    mask = stable(seg_fc) & stable(seg_sw)
    assert float(mask.mean()) > 0.2, "stable mask degenerate — field not saturated"
    stable_agree = float(np.mean(seg_fc[mask] == seg_sw[mask]))
    assert stable_agree >= 0.999, f"decisive-voxel agreement {stable_agree:.5f}"


def test_calculate_volumes_internal_convention():
    """Internal space swaps 1=ED / 2=NCR relative to BraTS (labels/convert.py);
    volumes must follow the convention or NCR/ED (and TC) come out swapped."""
    seg = np.zeros((10, 10, 10), np.uint8)
    seg[:2] = 1  # internal 1 = ED (200 voxels)
    seg[2:4] = 2  # internal 2 = NCR (200)
    seg[4:5] = 3  # ET (100)
    v = calculate_volumes(seg, voxel_volume_cm3=0.001, et_label=3, convention="internal")
    assert v["ED"] == pytest.approx(0.2)
    assert v["NCR"] == pytest.approx(0.2)
    assert v["TC"] == pytest.approx(0.3)  # NCR + ET, not ED + ET
    assert v["WT"] == pytest.approx(0.5)


def test_single_model_label_ensemble_skips_et_postprocess():
    """ensemble='label' with ONE model must behave like the repo-parity
    label pipeline — no ET min-size rule — not fall through to the softmax
    branch (regression: `len(probs) > 1` guard routed single-model label
    runs into et_min_size_postprocess)."""
    import jax
    import jax.numpy as jnp

    from braintpu.infer import InferenceEngine, ModelBundle
    from braintpu.infer.engine import uncrop_labels  # noqa: F401  (API)
    from braintpu.models.unet3d import UNetConfig, init_params

    cfg = UNetConfig(norm="instance", base_features=8, num_pool=2,
                     patch_size=(16, 16, 16), compute_dtype=jnp.float32)
    folds = [init_params(cfg, jax.random.PRNGKey(0))]
    label_eng = InferenceEngine(
        models=[ModelBundle.from_folds(cfg, folds)], mode="fullconv",
        tta=False, ensemble="label", et_min_voxels=200,
        output_convention="internal",
    )

    class FakePre:
        undo_slices = (slice(None),) * 3

    # probabilities with a tiny (<200 voxel) ET region: label mode must
    # keep it; the softmax branch would relabel it to NCR
    probs = np.zeros((8, 8, 8, 3), np.float32)
    probs[..., 0] = 0.9  # WT everywhere
    probs[:2, :2, :2, 1] = 0.9  # TC corner
    probs[:2, :2, :2, 2] = 0.9  # ET corner (8 voxels)
    seg = label_eng._ensemble_labels([jnp.asarray(probs)], FakePre())
    assert (seg == 3).sum() == 8  # ET survives in label mode

    softmax_eng = InferenceEngine(
        models=[ModelBundle.from_folds(cfg, folds)], mode="fullconv",
        tta=False, ensemble="softmax", et_min_voxels=200,
        output_convention="internal",
    )
    seg_s = softmax_eng._ensemble_labels([jnp.asarray(probs)], FakePre())
    assert (seg_s == 3).sum() == 0  # postprocess relabels the tiny ET


def test_predict_cases_batched_matches_per_case(tmp_path):
    """Batched multi-case fullconv equals per-case fullconv predictions."""
    import jax
    import jax.numpy as jnp

    from braintpu.infer import InferenceEngine, ModelBundle
    from braintpu.io import nifti
    from braintpu.io.brats import find_cases
    from braintpu.models.unet3d import UNetConfig, init_params

    rng = np.random.default_rng(0)
    aff = np.eye(4)
    for k in range(2):
        d = tmp_path / f"BraTS-GLI-0900{k}-000"
        d.mkdir()
        base = np.zeros((28, 30, 26), np.float32)
        base[3:25, 4:27, 3:23] = rng.normal(400, 60, (22, 23, 20)).astype(np.float32)
        for mod in ["t1", "t1ce", "t2", "flair"]:
            nifti.save(base + rng.normal(0, 5, base.shape).astype(np.float32) * (base > 0),
                       d / f"BraTS-GLI-0900{k}-000_{mod}.nii.gz", affine=aff)
    cases = find_cases(tmp_path)
    assert len(cases) == 2
    cfg = UNetConfig(norm="group", base_features=8, num_pool=2,
                     patch_size=(16, 16, 16), group_norm_groups=4,
                     compute_dtype=jnp.float32)
    folds = [init_params(cfg, jax.random.PRNGKey(f)) for f in range(2)]
    engine = InferenceEngine(
        models=[ModelBundle.from_folds(cfg, folds, name="m")],
        mode="fullconv", tta=False, et_min_voxels=0,
    )
    batched = engine.predict_cases_batched(
        cases, output_dir=tmp_path / "out", keep_volumes=True
    )
    assert len(batched) == 2
    for case, (seg_b, info) in zip(cases, batched):
        seg_s, _ = engine.predict_case(case)
        np.testing.assert_array_equal(seg_b, seg_s)
        assert info["batch_size"] == 2
        assert (tmp_path / "out" / f"{case.case_id}.nii.gz").exists()

    # with output_dir and default keep_volumes, entries are info-only —
    # long throughput runs must not hold every written volume in host RAM
    info_only = engine.predict_cases_batched(cases, output_dir=tmp_path / "out2")
    assert all(seg is None for seg, _ in info_only)
    assert all("output_path" in info for _, info in info_only)

    # case-level DP over a mesh: same results, batch sharded across the
    # virtual devices (with mesh-size padding exercised: 2 cases on 4)
    from braintpu.parallel import make_mesh

    mesh = make_mesh(jax.devices()[:4], data=4)
    mesh_engine = InferenceEngine(
        models=[ModelBundle.from_folds(cfg, folds, name="m")],
        mode="fullconv", tta=False, et_min_voxels=0, mesh=mesh,
    )
    sharded = mesh_engine.predict_cases_batched(cases)
    assert len(sharded) == 2
    for (seg_b, _), (seg_m, _) in zip(batched, sharded):
        np.testing.assert_array_equal(seg_b, seg_m)


def test_fullconv_spatial_sharding_matches_single_device():
    """GSPMD spatial partitioning (X axis over the mesh) must reproduce the
    single-device whole-volume forward — for both folded-BN (pure conv:
    halo exchange only) and GroupNorm (whole-volume stats become
    cross-device reductions)."""
    from braintpu.infer import fullconv_predict, fullconv_predict_spatial
    from braintpu.parallel import make_mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 (virtual) devices")
    mesh = make_mesh(jax.devices()[:4], data=4)
    rng = np.random.default_rng(11)
    # X = 32 = 4 shards x 2**num_pool x 2
    vol = jnp.asarray(rng.normal(size=(32, 16, 16, 4)).astype(np.float32))
    for norm in ("batch", "group"):
        cfg = tiny_cfg(norm)
        stacked = stack_folds(
            [init_params(cfg, jax.random.PRNGKey(i)) for i in range(2)]
        )
        for num_mirror in (1, 8):
            ref = np.asarray(
                fullconv_predict(stacked, vol, cfg, num_mirror=num_mirror)
            )
            got = np.asarray(
                fullconv_predict_spatial(
                    stacked, vol, cfg, mesh, num_mirror=num_mirror
                )
            )
            np.testing.assert_allclose(got, ref, atol=2e-5)


def test_fullconv_spatial_alignment_guard():
    from braintpu.infer import fullconv_predict_spatial
    from braintpu.parallel import make_mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 (virtual) devices")
    mesh = make_mesh(jax.devices()[:4], data=4)
    cfg = tiny_cfg()
    stacked = stack_folds([init_params(cfg, jax.random.PRNGKey(0))])
    # X=24 is conv-divisible (div=4) but not by 4 shards x div = 16
    bad = jnp.zeros((24, 16, 16, 4), jnp.float32)
    with pytest.raises(ValueError, match="mesh axis"):
        fullconv_predict_spatial(stacked, bad, cfg, mesh)


def test_engine_spatial_shard_matches_plain_fullconv():
    """spatial_shard engine == plain fullconv engine, incl. the X padding
    path (crop extent not divisible by mesh x pool grid)."""
    from braintpu.infer import InferenceEngine, ModelBundle
    from braintpu.parallel import make_mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 (virtual) devices")
    cfg = tiny_cfg()
    folds = [init_params(cfg, jax.random.PRNGKey(i)) for i in range(2)]
    bundle = ModelBundle.from_folds(cfg, folds)
    rng = np.random.default_rng(5)
    data = np.zeros((4, 30, 24, 20), np.float32)
    data[:, 2:25, 3:21, 2:18] = rng.normal(
        500, 60, (4, 23, 18, 16)
    ).astype(np.float32)
    from braintpu.infer import predict_probs_fullconv
    from braintpu.pre import preprocess_case

    mesh = make_mesh(jax.devices()[:4], data=4)
    sharded = InferenceEngine(
        models=[bundle], mode="fullconv", tta=False, et_min_voxels=0,
        mesh=mesh, spatial_shard=True,
    )
    # the helper pads X to the mesh x pool grid and slices it back; its
    # contract is "fullconv of the padded volume" (extra background border
    # — same class of effect as fullconv's bucket padding), so compare
    # against the single-device forward of the SAME padded input
    pre = preprocess_case(data, patch_size=(4, 4, 4), pad_multiple=4)
    vol = jnp.asarray(pre.data)  # (C, X, Y, Z)
    X = vol.shape[1]
    assert X % (4 * 4)  # X not mesh-aligned → the padding path is exercised
    target = -(-X // 16) * 16
    xpad = jnp.moveaxis(vol, 0, -1)
    xpad = jnp.pad(xpad, ((0, target - X), (0, 0), (0, 0), (0, 0)))
    from braintpu.infer import fullconv_predict

    ref = np.asarray(
        fullconv_predict(bundle.params_stacked, xpad, cfg, num_mirror=1,
                         folded=bundle.folded)
    )[:X]
    got = np.asarray(sharded._spatial_fullconv(vol, bundle, 0))
    np.testing.assert_allclose(got, ref, atol=2e-5)

    # and the full engine path runs end-to-end, labels in range
    seg_s, _ = sharded.predict_case_array(data)
    assert seg_s.shape == data.shape[1:]
    assert set(np.unique(seg_s)) <= {0, 1, 2, 3}


def test_bf16_weight_precast_restricted_to_folded_bn():
    """The bf16 weight pre-cast must apply ONLY to folded-BN bundles.

    On the TPU backend, the TTA sliding-window executable compiled against
    bf16-STORED weights of an unfolded GroupNorm net computes garbage (NaN
    probabilities → empty segmentations) even though the program is
    numerically identical to the f32-stored one (weights are cast to the
    compute dtype at point of use) and a CPU replay of the bf16-stored
    program is clean — a backend miscompilation, measured 2026-08-20 on
    the trained model2-GN checkpoint (engine._cast_matmul_weights
    docstring, PERF.md round-5 addendum).  This pins the contract that
    keeps GN/instance bundles on f32-stored weights.
    """
    # fold_bn=False on a BN net keeps the norm ops in the forward pass —
    # structurally the program class that miscompiles — so it must NOT be
    # cast either: the gate keys on the bundle's folded flag, not cfg.norm
    for norm, fold_bn, expect_cast in (
        ("batch", True, True),
        ("batch", False, False),
        ("group", True, False),
        ("instance", True, False),
    ):
        cfg = tiny_cfg(norm=norm)
        cfg = cfg.__class__(**{**cfg.__dict__, "compute_dtype": jnp.bfloat16})
        bundle = ModelBundle.from_folds(
            cfg, [init_params(cfg, jax.random.PRNGKey(0))], fold_bn=fold_bn
        )
        w_dtypes = {
            leaf.dtype
            for path, leaf in jax.tree_util.tree_leaves_with_path(bundle.params_stacked)
            if getattr(path[-1], "key", None) == "w" and leaf.ndim >= 5
        }
        if expect_cast:
            assert w_dtypes == {jnp.dtype(jnp.bfloat16)}, (norm, w_dtypes)
        else:
            assert w_dtypes == {jnp.dtype(jnp.float32)}, (norm, w_dtypes)
        # norm/scale/shift leaves stay f32 in every case
        other = {
            leaf.dtype
            for path, leaf in jax.tree_util.tree_leaves_with_path(bundle.params_stacked)
            if getattr(path[-1], "key", None) in ("scale", "shift", "b")
        }
        assert jnp.dtype(jnp.bfloat16) not in other
