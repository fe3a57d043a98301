"""Test configuration: run everything on the XLA CPU backend with a virtual
8-device mesh so multi-chip sharding logic is exercised without TPU hardware.

Must set env vars before the first `import jax` anywhere in the test session.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Some environments pre-register an accelerator plugin and pin
# jax_platforms before conftest runs; override explicitly.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def synth_case(tmp_path, rng):
    """A tiny synthetic BraTS case on disk: 4 modalities + seg, 2021 naming."""
    from braintpu.io import nifti

    shape = (48, 52, 44)
    affine = np.diag([1.0, 1.0, 1.0, 1.0])
    affine[:3, 3] = (-24, -26, -22)
    case_dir = tmp_path / "BraTS-GLI-99999-000"
    case_dir.mkdir()
    # brain = ellipsoid of nonzero intensities; background exactly 0
    zz, yy, xx = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    center = np.array(shape) / 2
    brain = (
        ((zz - center[0]) / 18) ** 2
        + ((yy - center[1]) / 20) ** 2
        + ((xx - center[2]) / 16) ** 2
    ) < 1.0
    for mod in ("t1", "t1ce", "t2", "flair"):
        vol = np.zeros(shape, dtype=np.float32)
        vol[brain] = rng.normal(600, 100, brain.sum()).astype(np.float32)
        np.clip(vol, 1.0, None, out=vol, where=brain)
        nifti.save(vol, case_dir / f"BraTS-GLI-99999-000_{mod}.nii.gz", affine=affine)
    # seg: small nested tumor labels 1 (NCR), 2 (ED), 3 (ET) in BraTS-2025 space
    seg = np.zeros(shape, dtype=np.uint8)
    tz, ty, tx = (int(center[0]) + 4, int(center[1]) - 3, int(center[2]) + 2)
    seg[tz - 6 : tz + 6, ty - 6 : ty + 6, tx - 6 : tx + 6] = 2
    seg[tz - 4 : tz + 4, ty - 4 : ty + 4, tx - 4 : tx + 4] = 1
    seg[tz - 2 : tz + 2, ty - 2 : ty + 2, tx - 2 : tx + 2] = 3
    nifti.save(seg, case_dir / "BraTS-GLI-99999-000_seg.nii.gz", affine=affine)
    return case_dir
