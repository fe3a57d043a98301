"""Native (C++) NIfTI batch-loader tests.

The native decoder (braintpu/native/nifti_native.cpp) accelerates the
host-side hot path of the data layer — gzip inflation of the four modality
files per case (reference equivalent: nibabel loads inside
feature_extraction/utils.py:15 and prepare_input,
run_brats2021_inference_singlethread.py:26-78).  These tests verify
bit-parity against the pure-Python codec and the graceful fallback.
"""

import numpy as np
import pytest

from braintpu.io import nifti
from braintpu import native


requires_native = pytest.mark.skipif(
    not native.native_available(), reason="g++/zlib toolchain unavailable"
)


def _write_vol(tmp_path, name, shape=(9, 7, 5), dtype=np.float32, gz=True, seed=0):
    rng = np.random.default_rng(seed)
    data = rng.normal(120.0, 40.0, shape).astype(dtype)
    affine = np.array(
        [
            [-1.0, 0, 0, 90.0],
            [0, 1.0, 0, -126.0],
            [0, 0, 1.5, -72.0],
            [0, 0, 0, 1.0],
        ]
    )
    path = tmp_path / (name + (".nii.gz" if gz else ".nii"))
    nifti.save(data, path, affine=affine)
    return path, data, affine


@requires_native
@pytest.mark.parametrize("dtype", [np.float32, np.int16, np.uint8, np.float64, np.int32])
@pytest.mark.parametrize("gz", [False, True])
def test_native_matches_python_codec(tmp_path, dtype, gz):
    path, data, affine = _write_vol(tmp_path, "v", dtype=dtype, gz=gz, seed=3)
    out, aff, zooms = native.read_nifti_f32(path)
    assert out.shape == data.shape
    assert out.dtype == np.float32
    np.testing.assert_allclose(out, data.astype(np.float32), rtol=1e-6)
    np.testing.assert_allclose(aff, affine, atol=1e-5)
    np.testing.assert_allclose(zooms, (1.0, 1.0, 1.5), atol=1e-5)


@requires_native
def test_native_batch_parallel(tmp_path):
    paths, datas = [], []
    for i in range(4):
        p, d, _ = _write_vol(tmp_path, f"mod{i}", shape=(12, 10, 8), seed=i)
        paths.append(p)
        datas.append(d)
    vols = native.read_batch_f32(paths)
    assert len(vols) == 4
    for v, d in zip(vols, datas):
        np.testing.assert_allclose(v, d, rtol=1e-6)


@requires_native
def test_native_errors_on_garbage(tmp_path):
    bad = tmp_path / "bad.nii.gz"
    bad.write_bytes(b"not a nifti at all")
    with pytest.raises(IOError):
        native.read_nifti_f32(bad)


@requires_native
def test_case_loader_uses_native(tmp_path, monkeypatch):
    """load_case_volumes returns identical stacks with and without native."""
    from braintpu.io import brats

    case_dir = tmp_path / "BraTS-GLI-00000-000"
    case_dir.mkdir()
    expect = []
    for i, mod in enumerate(["t1", "t1ce", "t2", "flair"]):
        p, d, _ = _write_vol(case_dir, f"BraTS-GLI-00000-000_{mod}", seed=10 + i)
        expect.append(d)
    cases = brats.find_cases(tmp_path)
    assert len(cases) == 1
    stack_native, affine, zooms = brats.load_case_volumes(cases[0])

    # Force the pure-Python path and compare.
    monkeypatch.setattr(native, "read_batch_f32", _raise_io)
    stack_py, affine_py, zooms_py = brats.load_case_volumes(cases[0])
    np.testing.assert_allclose(stack_native, stack_py, rtol=1e-6)
    np.testing.assert_allclose(affine, affine_py, atol=1e-5)
    np.testing.assert_allclose(zooms, zooms_py, atol=1e-5)
    np.testing.assert_allclose(stack_native, np.stack(expect), rtol=1e-6)


def _raise_io(*a, **k):
    raise IOError("forced fallback")


def test_load_header_streams(tmp_path):
    path, data, affine = _write_vol(tmp_path, "h", shape=(6, 5, 4))
    shape, aff, zooms = nifti.load_header(path)
    assert shape == data.shape
    np.testing.assert_allclose(aff, affine, atol=1e-5)
    np.testing.assert_allclose(zooms, (1.0, 1.0, 1.5), atol=1e-5)


def test_native_rejects_bitpix_dtype_mismatch(tmp_path):
    """A header declaring datatype=64 (8 B/voxel) with bitpix=8 and a short
    payload must be rejected, not overread (bounds were checked with bitpix)."""
    import gzip
    import struct

    import numpy as np

    from braintpu.io import nifti as pynifti
    from braintpu.native import native_available, read_batch_f32

    if not native_available():
        import pytest

        pytest.skip("native lib unavailable")

    # build a valid 4x4x4 int16 file, then corrupt datatype to double
    p = tmp_path / "evil.nii.gz"
    data = np.arange(64, dtype=np.int16).reshape(4, 4, 4)
    pynifti.save(data, p, affine=np.eye(4))
    raw = bytearray(gzip.decompress(p.read_bytes()))
    struct.pack_into("<h", raw, 70, 64)  # datatype=float64, bitpix stays 16
    p.write_bytes(gzip.compress(bytes(raw)))

    try:
        out = read_batch_f32([str(p)])
    except (ValueError, RuntimeError, OSError):
        pass  # explicit rejection is the expected outcome
    else:
        # if a fallback decoded it anyway, the VALUES must be sane for the
        # actual int16 payload — a native reader that sizes the output from
        # the (lying) header and overreads returns garbage of the right
        # shape, which a shape-only assert would bless
        assert out[0].shape == (4, 4, 4)
        np.testing.assert_array_equal(
            out[0].ravel(), np.arange(64, dtype=np.float32)
        )


def test_native_write_gz_roundtrip(tmp_path):
    """Parallel multi-member gzip: readable, deterministic, spans chunks."""
    gzip = pytest.importorskip("gzip")
    if not native.native_available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(0)
    # > 4 MB so the payload spans multiple gzip members
    payload = rng.integers(0, 256, 9 << 20, dtype=np.uint8).tobytes()
    p = tmp_path / "multi.gz"
    native.write_gz(p, payload)
    with gzip.open(p, "rb") as f:
        assert f.read() == payload
    first = p.read_bytes()
    native.write_gz(p, payload)
    assert p.read_bytes() == first  # byte-deterministic
    native.write_gz(p, b"")
    with gzip.open(p, "rb") as f:
        assert f.read() == b""


def test_save_uses_native_writer_and_python_reads_it(tmp_path):
    """nifti.save routes .gz through the native writer; load round-trips."""
    vol = np.arange(5 << 18, dtype=np.float32).reshape(64, 64, -1)
    p = tmp_path / "vol.nii.gz"
    nifti.save(vol, p)
    img = nifti.load(p)
    np.testing.assert_array_equal(img.get_fdata(np.float32), vol)


@requires_native
def test_native_qform_only_falls_back_to_python_affine(tmp_path):
    """sform_code=0 files carry their affine in the quaternion fields; the
    native header reader must NOT hand back the (zero/garbage) srow — it
    raises, and load_f32 falls back to the Python codec's qform affine."""
    path, data, affine = _write_vol(tmp_path, "qonly", gz=False)
    raw = bytearray(path.read_bytes())
    import struct as _s

    raw[254:256] = _s.pack("<h", 0)          # sform_code = 0
    raw[280:328] = b"\x00" * 48              # srow zeroed (undefined)
    path.write_bytes(bytes(raw))

    with pytest.raises(IOError):
        native.read_nifti_f32(path)

    got, aff, zooms = nifti.load_f32(path)
    np.testing.assert_allclose(got, data, rtol=1e-6)
    # the python codec reconstructs the affine from qform; rotation+offset
    # must match the original sform affine
    np.testing.assert_allclose(aff, affine, atol=1e-4)
