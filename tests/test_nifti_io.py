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


def test_corrupt_inputs_raise_cleanly(tmp_path):
    """Truncated/corrupt files must raise a clean error (NiftiError or the
    gzip/OS layer's), never return a garbage array or crash unhandled."""
    import gzip as _gz

    import numpy as np

    good = tmp_path / "good.nii.gz"
    nifti.save(np.arange(64, dtype=np.float32).reshape(4, 4, 4), good,
               affine=np.eye(4))
    raw = good.read_bytes()

    candidates = {
        "empty": b"",
        "tiny": b"\x1f\x8b",
        "truncated_gzip": raw[: len(raw) // 2],
        "not_gzip_not_nifti": b"A" * 1000,
        "gzip_of_garbage": _gz.compress(b"B" * 600),
        "truncated_payload": _gz.compress(_gz.decompress(raw)[:360]),
    }
    for name, blob in candidates.items():
        p = tmp_path / f"{name}.nii.gz"
        p.write_bytes(blob)
        with pytest.raises(Exception) as exc_info:
            img = nifti.load(p)
            np.asarray(img.dataobj)  # force the decode
        assert isinstance(
            exc_info.value, (nifti.NiftiError, OSError, EOFError, ValueError)
        ), (name, type(exc_info.value), exc_info.value)


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


def test_roundtrip_fuzz(tmp_path):
    """Randomized shape × dtype × affine × compression round-trips.

    Catches layout/stride/padding mistakes the fixed-shape tests can't:
    singleton axes, 4D volumes, rotated/sheared affines, both writers
    (native parallel-gzip and the Python fallback pick per extension).
    """
    rng = np.random.default_rng(42)
    dtypes = [np.float32, np.int16, np.uint8, np.float64, np.int32]
    for trial in range(25):
        ndim = int(rng.integers(3, 5))
        shape = tuple(int(rng.integers(1, 14)) for _ in range(ndim))
        dtype = dtypes[trial % len(dtypes)]
        if np.issubdtype(dtype, np.floating):
            data = rng.normal(0, 50, shape).astype(dtype)
        else:
            info = np.iinfo(dtype)
            data = rng.integers(
                max(info.min, -1000), min(info.max, 1000), shape
            ).astype(dtype)
        # random invertible affine: rotation-ish block + shear + translation
        A = rng.normal(0, 1, (3, 3)) * 0.3 + np.diag(rng.uniform(0.5, 2.0, 3))
        if abs(np.linalg.det(A)) < 1e-2:
            A = A + np.eye(3)
        affine = np.eye(4)
        affine[:3, :3] = A
        affine[:3, 3] = rng.uniform(-100, 100, 3)
        gz = bool(trial % 2)
        path = tmp_path / f"f{trial}{'.nii.gz' if gz else '.nii'}"
        nifti.save(data, path, affine=affine)
        img = nifti.load(path)
        assert img.shape == shape
        np.testing.assert_array_equal(np.asarray(img.dataobj), data)
        np.testing.assert_allclose(img.affine, affine, atol=1e-4)
        zooms = np.sqrt((affine[:3, :3] ** 2).sum(axis=0))[: min(ndim, 3)]
        np.testing.assert_allclose(img.get_zooms()[: len(zooms)], zooms,
                                   rtol=1e-4)


def test_big_endian_read(tmp_path):
    """Files written by big-endian tools (dim[0] byte-swapped) must load."""
    data = np.arange(2 * 3 * 4, dtype=np.int16).reshape(2, 3, 4)
    path = tmp_path / "le.nii"
    nifti.save(data, path, affine=np.eye(4))
    raw = bytearray(path.read_bytes())
    hdr = np.frombuffer(bytes(raw[:348]), dtype=np.uint8).copy()
    # byte-swap every multi-byte header field by re-encoding through numpy:
    # reinterpret the little-endian header as the struct layout and swap
    import struct as _s

    def swap(fmt, off):
        n = _s.calcsize("<" + fmt)
        vals = _s.unpack("<" + fmt, bytes(raw[off:off + n]))
        raw[off:off + n] = _s.pack(">" + fmt, *vals)

    swap("i", 0)            # sizeof_hdr
    swap("8h", 40)          # dim
    swap("2h", 70)          # datatype, bitpix
    swap("8f", 76)          # pixdim
    swap("f", 108)          # vox_offset
    swap("f", 112)          # scl_slope
    swap("f", 116)          # scl_inter
    swap("2h", 252)         # qform_code, sform_code (2 shorts at 252)
    swap("6f", 256)         # quatern b,c,d + qoffset x,y,z
    swap("12f", 280)        # srow
    body = bytes(raw[352:])
    swapped_body = np.frombuffer(body, dtype="<i2").astype(">i2").tobytes()
    path2 = tmp_path / "be.nii"
    path2.write_bytes(bytes(raw[:352]) + swapped_body)
    img = nifti.load(path2)
    assert img.shape == data.shape
    np.testing.assert_array_equal(np.asarray(img.dataobj), data)
