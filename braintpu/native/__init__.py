"""Native runtime components (C++): parallel NIfTI batch decoding.

The shared library is built on demand with the system toolchain
(:func:`build_native`) and loaded through ctypes; every entry point has a
pure-Python fallback, so the framework works without a compiler — native is
an accelerator, not a dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "build_native",
    "native_available",
    "read_nifti_f32",
    "read_batch_f32",
    "write_gz",
    "edt_sq",
]

_DIR = Path(__file__).parent
_SRC = _DIR / "nifti_native.cpp"
_LIB = _DIR / "libbraintpu_nifti.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False

_ERRORS = {
    1: "cannot open file",
    2: "gzip decode error",
    3: "malformed NIfTI header",
    4: "unsupported datatype",
    5: "output buffer too small",
}


def build_native(force: bool = False) -> bool:
    """Compile the shared library with g++ (idempotent); True on success."""
    global _build_failed
    if (
        _LIB.exists()
        and not force
        # stale check: rebuild whenever the source is newer than the library
        # (dlopen caches by path, so rebuilding after a load is unreliable —
        # always rebuild BEFORE the first CDLL)
        and _LIB.stat().st_mtime >= _SRC.stat().st_mtime
    ):
        return True
    try:
        subprocess.run(
            [
                "g++",
                "-O3",
                "-shared",
                "-fPIC",
                "-std=c++17",
                str(_SRC),
                "-o",
                str(_LIB),
                "-lz",
                "-lpthread",
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        _build_failed = True
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not build_native():  # no-op when the library is fresh
            return None
        try:
            lib = ctypes.CDLL(str(_LIB))
        except OSError:
            _build_failed = True
            return None
        lib.nifti_read_header.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.nifti_read_f32.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
        ]
        lib.nifti_read_batch_f32.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.nifti_write_gz.argtypes = [
            ctypes.c_char_p,
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.edt_sq_i32.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def _read_header(lib, path) -> Tuple[Tuple[int, ...], np.ndarray, Tuple[float, ...]]:
    dims = (ctypes.c_int64 * 8)()
    dtype = ctypes.c_int32()
    affine = (ctypes.c_float * 12)()
    zooms = (ctypes.c_float * 3)()
    sform = ctypes.c_int32()
    rc = lib.nifti_read_header(
        os.fspath(path).encode(), dims, ctypes.byref(dtype), affine, zooms,
        ctypes.byref(sform),
    )
    if rc != 0:
        raise IOError(f"{path}: {_ERRORS.get(rc, rc)}")
    if int(sform.value) <= 0:
        # qform-only file: srow is undefined (often all zeros) — a zero 3x3
        # affine would silently corrupt output orientation downstream.
        # Raise so callers take the pure-Python codec, which reconstructs
        # the affine from the quaternion/pixdim fields.
        raise IOError(
            f"{path}: sform_code=0 (qform-only) — native affine unsupported")
    ndim = dims[0]
    shape = tuple(int(dims[i]) for i in range(1, 1 + ndim))
    aff = np.eye(4, dtype=np.float64)
    aff[:3, :] = np.ctypeslib.as_array(affine).reshape(3, 4)
    return shape, aff, tuple(float(z) for z in zooms)


def read_nifti_f32(path) -> Tuple[np.ndarray, np.ndarray, Tuple[float, ...]]:
    """Native single-file read → (data f32 Fortran-order, affine, zooms).

    Raises IOError on failure; callers fall back to :mod:`braintpu.io.nifti`.
    """
    lib = _load()
    if lib is None:
        raise IOError("native library unavailable")
    shape, affine, zooms = _read_header(lib, path)
    n = int(np.prod(shape))
    flat = np.empty(n, np.float32)
    rc = lib.nifti_read_f32(
        os.fspath(path).encode(), flat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n
    )
    if rc != 0:
        raise IOError(f"{path}: {_ERRORS.get(rc, rc)}")
    return flat.reshape(shape, order="F"), affine, zooms


def write_gz(path, payload: bytes, level: int = 4) -> None:
    """Parallel gzip-compress ``payload`` to ``path`` (multi-member stream).

    Fixed 4 MB chunks, each deflated on its own thread as an independent
    gzip member — valid RFC-1952, readable by every gzip reader, and
    byte-deterministic (the split depends only on the payload length).
    Raises IOError when the native library is unavailable; callers fall
    back to Python ``gzip``.
    """
    lib = _load()
    if lib is None:
        raise IOError("native library unavailable")
    rc = lib.nifti_write_gz(os.fspath(path).encode(), payload, len(payload), level, 0)
    if rc != 0:
        raise IOError(f"{path}: {_ERRORS.get(rc, rc)}")


def edt_sq(mask: np.ndarray) -> np.ndarray:
    """Exact SQUARED Euclidean distance transform at unit sampling (int32).

    ``np.sqrt(edt_sq(mask))`` is bit-identical to
    ``scipy.ndimage.distance_transform_edt(mask)``: the minimal squared
    distance is a unique integer, and float64 sqrt is correctly rounded.
    Raises IOError when the native library is unavailable; callers fall
    back to scipy.
    """
    lib = _load()
    if lib is None:
        raise IOError("native library unavailable")
    m = np.ascontiguousarray(mask, dtype=np.uint8)
    if m.ndim != 3:
        raise ValueError(f"edt_sq expects a 3-D mask, got {m.ndim}-D")
    out = np.empty(m.shape, np.int32)
    lib.edt_sq_i32(
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        m.shape[0], m.shape[1], m.shape[2],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out


def read_batch_f32(paths: Sequence) -> List[np.ndarray]:
    """Parallel native batch read (one inflate thread per file)."""
    lib = _load()
    if lib is None:
        raise IOError("native library unavailable")
    metas = [_read_header(lib, p) for p in paths]
    buffers = [np.empty(int(np.prod(shape)), np.float32) for shape, _, _ in metas]
    c_paths = (ctypes.c_char_p * len(paths))(*[os.fspath(p).encode() for p in paths])
    c_outs = (ctypes.POINTER(ctypes.c_float) * len(paths))(
        *[b.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) for b in buffers]
    )
    c_caps = (ctypes.c_int64 * len(paths))(*[b.size for b in buffers])
    rc = lib.nifti_read_batch_f32(c_paths, len(paths), c_outs, c_caps)
    if rc != 0:
        raise IOError(f"batch read failed: {_ERRORS.get(rc, rc)}")
    return [
        b.reshape(shape, order="F") for b, (shape, _, _) in zip(buffers, metas)
    ]
