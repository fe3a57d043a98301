"""Bounding-box morphology helpers must equal the full-volume scipy ops."""

import numpy as np
import pytest
from scipy import ndimage

from braintpu.features.boxops import (
    bbox_slices,
    binary_dilation_bbox,
    binary_erosion_bbox,
)


def random_mask(rng, shape=(40, 44, 36), p=0.001, blobs=3):
    m = np.zeros(shape, bool)
    for _ in range(blobs):
        c = [rng.integers(4, s - 4) for s in shape]
        r = int(rng.integers(2, 7))
        zz, yy, xx = np.ogrid[: shape[0], : shape[1], : shape[2]]
        m |= ((zz - c[0]) ** 2 + (yy - c[1]) ** 2 + (xx - c[2]) ** 2) <= r**2
    return m


@pytest.mark.parametrize("iterations", [1, 2, 5, 10])
def test_dilation_matches_scipy(rng, iterations):
    m = random_mask(rng)
    got = binary_dilation_bbox(m, iterations=iterations)
    want = ndimage.binary_dilation(m, iterations=iterations)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("iterations", [1, 2, 3])
def test_erosion_matches_scipy(rng, iterations):
    m = random_mask(rng)
    got = binary_erosion_bbox(m, iterations=iterations)
    want = ndimage.binary_erosion(m, iterations=iterations)
    np.testing.assert_array_equal(got, want)


def test_mask_touching_volume_edge():
    """Clipped boxes at the volume boundary keep scipy's border semantics."""
    m = np.zeros((20, 20, 20), bool)
    m[0:5, 0:5, 0:5] = True  # touches three faces
    m[17:, 17:, 17:] = True  # touches the other corner
    for it in (1, 3):
        np.testing.assert_array_equal(
            binary_dilation_bbox(m, iterations=it),
            ndimage.binary_dilation(m, iterations=it),
        )
        np.testing.assert_array_equal(
            binary_erosion_bbox(m, iterations=it),
            ndimage.binary_erosion(m, iterations=it),
        )


def test_empty_mask():
    m = np.zeros((8, 8, 8), bool)
    assert bbox_slices(m) is None
    assert not binary_dilation_bbox(m, 3).any()
    assert not binary_erosion_bbox(m, 1).any()


def test_bbox_slices_pad_clip():
    m = np.zeros((10, 10, 10), bool)
    m[2:4, 5:6, 0:2] = True
    sl = bbox_slices(m, pad=2)
    assert sl == (slice(0, 6), slice(3, 8), slice(0, 4))


def test_edt_matches_scipy(rng):
    """boxops.edt (native int32 squared-EDT + sqrt) is bit-identical to
    scipy.ndimage.distance_transform_edt at unit sampling — including masks
    with full-True lines and masks touching the volume border."""
    from braintpu.features.boxops import edt

    for _ in range(4):
        m = random_mask(rng, shape=(37, 41, 29), blobs=4)
        np.testing.assert_array_equal(edt(m), ndimage.distance_transform_edt(m))
    # dense mask (full-True z-lines exercise the INF propagation)
    m = np.ones((16, 18, 14), bool)
    m[0, 0, 0] = False
    np.testing.assert_array_equal(edt(m), ndimage.distance_transform_edt(m))
    # anisotropic sampling falls back to scipy (same answer either way)
    m = random_mask(rng, shape=(20, 22, 18))
    np.testing.assert_array_equal(
        edt(m, sampling=(1.0, 2.0, 1.5)),
        ndimage.distance_transform_edt(m, sampling=(1.0, 2.0, 1.5)),
    )


def test_edt_empty_and_inverse(rng):
    from braintpu.features.boxops import edt

    m = np.zeros((10, 10, 10), bool)
    np.testing.assert_array_equal(edt(m), np.zeros_like(m, float))
    m = random_mask(rng, shape=(24, 24, 24))
    np.testing.assert_array_equal(edt(~m), ndimage.distance_transform_edt(~m))
