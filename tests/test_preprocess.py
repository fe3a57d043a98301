"""Preprocessing semantics tests (crop, masked z-score, padding, resize)."""

import numpy as np
import jax.numpy as jnp

from braintpu.pre import (
    crop_to_nonzero,
    pad_to_patch,
    preprocess_case,
    resize_nearest,
    resize_trilinear,
    zscore_masked,
)


def _stack_with_brain(shape=(20, 24, 18), C=4, seed=0):
    rng = np.random.default_rng(seed)
    data = np.zeros((C,) + shape, dtype=np.float32)
    brain = np.zeros(shape, dtype=bool)
    brain[4:16, 6:20, 3:15] = True
    for c in range(C):
        vals = rng.normal(500 + 50 * c, 60, brain.sum()).astype(np.float32)
        vals = np.clip(vals, 1.0, None)
        data[c][brain] = vals
    return data, brain


def test_crop_to_nonzero_bbox():
    data, brain = _stack_with_brain()
    cropped, mask, info = crop_to_nonzero(data)
    assert info.lo == (4, 6, 3)
    assert info.hi == (16, 20, 15)
    assert cropped.shape == (4, 12, 14, 12)
    assert mask.shape == (12, 14, 12)
    np.testing.assert_array_equal(cropped, data[(slice(None),) + info.slices])


def test_crop_fills_holes():
    """A zero-intensity cavity inside the brain must stay inside the mask."""
    data, brain = _stack_with_brain()
    data[:, 9:11, 10:12, 8:10] = 0.0  # interior hole across all channels
    _, mask, _ = crop_to_nonzero(data)
    assert mask[5, 5, 6]  # hole voxel (in cropped coords 9-4=5,...) is filled


def test_zscore_masked_stats():
    data, brain = _stack_with_brain()
    cropped, mask, _ = crop_to_nonzero(data)
    out = np.asarray(zscore_masked(jnp.asarray(cropped), jnp.asarray(mask)))
    for c in range(4):
        vals = out[c][mask]
        assert abs(vals.mean()) < 1e-4
        assert abs(vals.std() - 1.0) < 1e-3
        # background exactly zero
        assert np.all(out[c][~mask] == 0)


def test_zscore_matches_reference_formula():
    """Biased std + 1e-8 smoothing, identical to nnU-Net nonCT."""
    rng = np.random.default_rng(1)
    data = rng.normal(10, 3, (1, 6, 6, 6)).astype(np.float32)
    mask = rng.random((6, 6, 6)) > 0.3
    out = np.asarray(zscore_masked(jnp.asarray(data), jnp.asarray(mask)))
    ref = data[0].copy()
    v = ref[mask]
    ref_vals = (v - v.mean()) / (v.std() + 1e-8)
    np.testing.assert_allclose(out[0][mask], ref_vals, rtol=1e-4, atol=1e-5)


def test_pad_to_patch_centered():
    data = np.ones((2, 10, 30, 7), dtype=np.float32)
    padded, undo = pad_to_patch(data, (16, 16, 16))
    assert padded.shape == (2, 16, 30, 16)
    # centered: diff 6 -> lo 3; diff 9 -> lo 4
    assert undo == (slice(3, 13), slice(0, 30), slice(4, 11))
    np.testing.assert_array_equal(np.asarray(padded)[(slice(None),) + undo], data)
    # outside is zero
    assert float(np.asarray(padded).sum()) == data.sum()


def test_preprocess_case_end_to_end():
    data, brain = _stack_with_brain()
    res = preprocess_case(data, patch_size=(16, 16, 16))
    assert all(s >= 16 for s in res.data.shape[1:])
    assert res.crop.lo == (4, 6, 3)


def test_resize_trilinear_identity_and_upscale():
    vol = np.random.default_rng(0).random((2, 8, 8, 8)).astype(np.float32)
    out = np.asarray(resize_trilinear(jnp.asarray(vol), (8, 8, 8)))
    np.testing.assert_array_equal(out, vol)
    up = np.asarray(resize_trilinear(jnp.asarray(vol), (16, 16, 16)))
    assert up.shape == (2, 16, 16, 16)
    # value range preserved by interpolation
    assert up.min() >= vol.min() - 1e-6 and up.max() <= vol.max() + 1e-6


def test_resize_trilinear_matches_skimage_convention():
    """Compare against scipy map_coordinates with the same center-aligned grid."""
    from scipy.ndimage import map_coordinates

    vol = np.random.default_rng(2).random((5, 6, 7)).astype(np.float64)
    new_shape = (9, 4, 11)
    out = np.asarray(resize_trilinear(jnp.asarray(vol[None]), new_shape))[0]
    grids = np.meshgrid(
        *[(np.arange(n) + 0.5) * o / n - 0.5 for n, o in zip(new_shape, vol.shape)],
        indexing="ij",
    )
    ref = map_coordinates(vol, np.array(grids), order=1, mode="nearest")
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_resize_nearest_labels():
    seg = np.zeros((6, 6, 6), dtype=np.int32)
    seg[2:4, 2:4, 2:4] = 3
    out = np.asarray(resize_nearest(jnp.asarray(seg), (12, 12, 12)))
    assert set(np.unique(out)) == {0, 3}
    assert out[5, 5, 5] == 3


def test_fill_holes_matches_scipy():
    """fill_holes (one labeling pass) == scipy binary_fill_holes exactly."""
    from scipy import ndimage as ndi

    from braintpu.pre.preprocess import fill_holes

    rng = np.random.default_rng(7)
    for _ in range(8):
        mask = rng.random((24, 20, 17)) > 0.62
        np.testing.assert_array_equal(
            fill_holes(mask), ndi.binary_fill_holes(mask)
        )
    # deterministic shapes: nested shell, border-touching cavity, all-False/True
    shell = np.zeros((16, 16, 16), bool)
    shell[2:14, 2:14, 2:14] = True
    shell[5:11, 5:11, 5:11] = False  # interior hole -> filled
    open_cavity = shell.copy()
    open_cavity[5:11, 5:11, 0:11] = False  # tunnel to the border -> kept open
    for m in (shell, open_cavity, np.zeros((5, 5, 5), bool), np.ones((5, 5, 5), bool)):
        np.testing.assert_array_equal(fill_holes(m), ndi.binary_fill_holes(m))


def test_zscore_masked_np_matches_jitted():
    """Host variant (used by the training loader) computes the identical
    masked z-score as the jitted device version."""
    from braintpu.pre.preprocess import zscore_masked_np

    rng = np.random.default_rng(7)
    data = rng.normal(40, 9, (4, 7, 6, 5)).astype(np.float32)
    mask = rng.random((7, 6, 5)) > 0.4
    a = np.asarray(zscore_masked(jnp.asarray(data), jnp.asarray(mask)))
    b = zscore_masked_np(data, mask)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_preprocess_case_normalizes_like_crop_order():
    """Padding before the masked z-score (one compile per bucket) must give
    the same values as normalizing the crop then padding (the old order)."""
    data, brain = _stack_with_brain()
    res = preprocess_case(data, patch_size=(16, 16, 16))
    cropped, mask, _ = crop_to_nonzero(np.asarray(data, np.float32))
    ref = np.asarray(zscore_masked(jnp.asarray(cropped), jnp.asarray(mask)))
    got = np.asarray(res.data)[(slice(None),) + res.undo_slices]
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
    # padding region is exactly zero
    total = np.zeros(res.data.shape, np.float32)
    total[(slice(None),) + res.undo_slices] = got
    np.testing.assert_array_equal(np.asarray(res.data), total)
