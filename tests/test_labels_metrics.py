"""Label conversion and evaluation-metric golden tests."""

import numpy as np
import jax.numpy as jnp

from braintpu.labels import (
    brats2021_to_brats2025,
    et_min_size_postprocess,
    internal_to_brats2021,
    internal_to_brats2025,
    keep_largest_component,
)
from braintpu.metrics import evaluate_pair, evaluate_segmentation


def test_internal_to_brats2025():
    seg = np.array([0, 1, 2, 3, 1, 2])
    out = np.asarray(internal_to_brats2025(seg))
    np.testing.assert_array_equal(out, [0, 2, 1, 3, 2, 1])


def test_internal_to_brats2021():
    seg = np.array([0, 1, 2, 3])
    out = np.asarray(internal_to_brats2021(seg))
    np.testing.assert_array_equal(out, [0, 2, 1, 4])


def test_float_labels_rounded():
    seg = np.array([0.2, 0.9, 2.1, 2.6])
    out = np.asarray(internal_to_brats2025(seg))
    np.testing.assert_array_equal(out, [0, 2, 1, 3])


def test_2021_to_2025():
    seg = np.array([0, 1, 2, 4])
    np.testing.assert_array_equal(np.asarray(brats2021_to_brats2025(seg)), [0, 1, 2, 3])


def test_normalize_to_brats2025_accepts_both_vintages():
    from braintpu.labels import normalize_to_brats2025

    seg = np.array([0, 1, 2, 3, 4], dtype=np.int32)
    # both ET spellings land on 3; NCR/ED untouched — safe when the
    # vintage is unknown (the strict 2021→2025 map sends 3 to 0)
    np.testing.assert_array_equal(
        np.asarray(normalize_to_brats2025(seg)), [0, 1, 2, 3, 3]
    )


def test_et_min_size_rule():
    seg = np.zeros((10, 10, 10), dtype=np.uint8)
    seg[0:3, 0:3, 0:3] = 3  # 27 ET voxels < 200
    out = et_min_size_postprocess(seg, et_label=3, replace_with=2, min_voxels=200)
    assert (out == 3).sum() == 0
    assert (out == 2).sum() == 27
    # big enough ET untouched
    seg2 = np.zeros((10, 10, 10), dtype=np.uint8)
    seg2[0:7, 0:7, 0:7] = 3  # 343 >= 200
    out2 = et_min_size_postprocess(seg2)
    assert (out2 == 3).sum() == 343


def test_keep_largest_component():
    mask = np.zeros((12, 12, 12), dtype=bool)
    mask[0:4, 0:4, 0:4] = True  # 64 voxels
    mask[8:10, 8:10, 8:10] = True  # 8 voxels
    out, n = keep_largest_component(mask)
    assert n == 2
    assert out.sum() == 64


def test_dice_golden_values():
    """Hand-computed confusion on a tiny example."""
    pred = np.array([0, 1, 1, 1, 2, 0])
    gt = np.array([0, 1, 1, 0, 2, 2])
    m = evaluate_pair(pred, gt, 1)
    # label 1: tp=2 fp=1 fn=0 tn=3
    assert abs(m.dice - (4 / 5)) < 1e-6
    assert abs(m.iou - (2 / 3)) < 1e-6
    assert abs(m.sensitivity - 1.0) < 1e-6
    assert abs(m.specificity - 0.75) < 1e-6
    assert (m.tp, m.fp, m.fn, m.tn) == (2, 1, 0, 3)


def test_perfect_prediction():
    gt = np.random.default_rng(0).integers(0, 4, (16, 16, 16))
    res = evaluate_segmentation(gt, gt)
    assert res["mean_dice"] > 0.999999
    for k in ("WT", "TC", "ET"):
        assert res["compound"][k]["dice"] > 0.999999


def test_compound_region_definitions():
    """WT=[1,2,3], TC=[1,3], ET=[3] in 2025 space (ref lines 130-151)."""
    pred = np.zeros((8, 8, 8), dtype=np.uint8)
    gt = np.zeros((8, 8, 8), dtype=np.uint8)
    pred[0, 0, 0] = 1  # NCR
    gt[0, 0, 0] = 2  # ED — same voxel, different label
    res = evaluate_segmentation(pred, gt)
    # WT agrees (both tumor), TC does not (pred in core, gt not)
    assert res["compound"]["WT"]["dice"] > 0.999999
    assert res["compound"]["TC"]["dice"] < 1e-6
    assert res["per_label"][1]["dice"] < 1e-6


def test_mean_dice_formula():
    pred = np.zeros((6, 6, 6), dtype=np.uint8)
    gt = np.zeros((6, 6, 6), dtype=np.uint8)
    pred[:3], gt[:3] = 2, 2  # ED only, perfect
    res = evaluate_segmentation(pred, gt)
    wt = res["compound"]["WT"]["dice"]
    tc = res["compound"]["TC"]["dice"]
    et = res["compound"]["ET"]["dice"]
    assert abs(res["mean_dice"] - np.mean([wt, tc, et])) < 1e-9


def test_brats_to_internal_roundtrip():
    """brats2025_to_internal is the involution inverse of internal_to_brats2025;
    brats2021_to_internal maps ET 4 -> 3."""
    import numpy as np

    from braintpu.labels import (
        brats2021_to_internal,
        brats2025_to_internal,
        internal_to_brats2021,
        internal_to_brats2025,
    )

    seg = np.array([0, 1, 2, 3, 0, 3, 2, 1])
    as2025 = np.asarray(internal_to_brats2025(seg))
    back = np.asarray(brats2025_to_internal(as2025))
    np.testing.assert_array_equal(back, seg)
    as2021 = np.asarray(internal_to_brats2021(seg))
    back21 = np.asarray(brats2021_to_internal(as2021))
    np.testing.assert_array_equal(back21, seg)


def test_remap_host_and_device_paths_agree():
    """numpy input stays on host (numpy out); device input stays device."""
    rng = np.random.default_rng(3)
    seg_u8 = rng.integers(0, 4, (11, 13, 9)).astype(np.uint8)
    host = internal_to_brats2021(seg_u8)
    assert isinstance(host, np.ndarray) and host.dtype == np.uint8
    dev = internal_to_brats2021(jnp.asarray(seg_u8))
    assert not isinstance(dev, np.ndarray)
    np.testing.assert_array_equal(host, np.asarray(dev))
    # non-uint8 host dtypes (generic path) incl. out-of-range labels -> 0
    seg_i32 = np.array([[0, 1, 2, 3, 7, -2]], dtype=np.int32)
    np.testing.assert_array_equal(
        internal_to_brats2021(seg_i32), [[0, 2, 1, 4, 0, 0]]
    )
    seg_f = seg_u8.astype(np.float32) + 0.4
    np.testing.assert_array_equal(internal_to_brats2021(seg_f), host)
