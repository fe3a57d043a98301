"""NIfTI codec round-trip and header-semantics tests."""

import gzip
import struct

import numpy as np
import pytest

from braintpu.io import nifti


@pytest.mark.parametrize("dtype", [np.float32, np.int16, np.uint8, np.float64, np.int32])
@pytest.mark.parametrize("gz", [False, True])
def test_roundtrip_dtypes(tmp_path, dtype, gz):
    rng = np.random.default_rng(3)
    data = (rng.normal(100, 30, (11, 9, 7))).astype(dtype)
    affine = np.array(
        [
            [-1.0, 0, 0, 90.0],
            [0, 1.0, 0, -126.0],
            [0, 0, 1.2, -72.0],
            [0, 0, 0, 1.0],
        ]
    )
    path = tmp_path / ("x.nii.gz" if gz else "x.nii")
    nifti.save(data, path, affine=affine)
    img = nifti.load(path)
    assert img.shape == data.shape
    np.testing.assert_array_equal(np.asarray(img.dataobj), data)
    np.testing.assert_allclose(img.affine, affine, atol=1e-5)
    np.testing.assert_allclose(img.get_zooms(), (1.0, 1.0, 1.2), atol=1e-5)


def test_fortran_order_on_disk(tmp_path):
    """Voxel (1,0,0) must be the second element on disk (Fortran order)."""
    data = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    path = tmp_path / "f.nii"
    nifti.save(data, path)
    raw = path.read_bytes()
    flat = np.frombuffer(raw[352 : 352 + 24 * 4], dtype="<f4")
    assert flat[0] == data[0, 0, 0]
    assert flat[1] == data[1, 0, 0]  # x varies fastest


def test_scl_slope_inter_applied(tmp_path):
    data = np.arange(8, dtype=np.int16).reshape(2, 2, 2)
    path = tmp_path / "s.nii"
    nifti.save(data, path)
    raw = bytearray(path.read_bytes())
    struct.pack_into("<2f", raw, 112, 2.0, 5.0)  # slope=2, inter=5
    path.write_bytes(bytes(raw))
    img = nifti.load(path)
    np.testing.assert_allclose(img.get_fdata(), data.astype(np.float64) * 2 + 5)


def test_4d_roundtrip(tmp_path):
    data = np.random.default_rng(0).random((5, 6, 7, 4)).astype(np.float32)
    path = tmp_path / "v4.nii.gz"
    nifti.save(data, path)
    img = nifti.load(path)
    assert img.shape == (5, 6, 7, 4)
    np.testing.assert_array_equal(np.asarray(img.dataobj), data)


def test_qform_fallback(tmp_path):
    """If sform_code == 0, the affine comes from the quaternion fields."""
    data = np.zeros((4, 4, 4), dtype=np.float32)
    affine = np.diag([2.0, 2.0, 2.5, 1.0])
    affine[:3, 3] = (-4, -4, -5)
    path = tmp_path / "q.nii"
    nifti.save(data, path, affine=affine)
    raw = bytearray(path.read_bytes())
    struct.pack_into("<h", raw, 254, 0)  # sform_code = 0
    path.write_bytes(bytes(raw))
    img = nifti.load(path)
    np.testing.assert_allclose(img.affine, affine, atol=1e-5)


def test_deterministic_gzip_bytes(tmp_path):
    data = np.ones((3, 3, 3), dtype=np.float32)
    p1, p2 = tmp_path / "a.nii.gz", tmp_path / "b.nii.gz"
    nifti.save(data, p1)
    nifti.save(data, p2)
    assert p1.read_bytes() == p2.read_bytes()


def test_reject_garbage(tmp_path):
    path = tmp_path / "bad.nii"
    path.write_bytes(b"\x00" * 400)
    with pytest.raises(nifti.NiftiError):
        nifti.load(path)


def test_negative_determinant_affine_roundtrip(tmp_path):
    """LPS-flavored affine (negative determinant) must survive the qform path."""
    data = np.zeros((4, 4, 4), dtype=np.float32)
    affine = np.diag([-1.0, -1.0, 1.0, 1.0])
    affine[:3, 3] = (10.0, 20.0, -5.0)
    path = tmp_path / "n.nii"
    nifti.save(data, path, affine=affine)
    img = nifti.load(path)
    np.testing.assert_allclose(img.affine, affine, atol=1e-5)
    # and via qform only
    raw = bytearray(path.read_bytes())
    struct.pack_into("<h", raw, 254, 0)
    path.write_bytes(bytes(raw))
    img2 = nifti.load(path)
    np.testing.assert_allclose(img2.affine, affine, atol=1e-4)
