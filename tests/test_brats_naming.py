"""BraTS naming-scheme conversion and case discovery tests."""

import gzip

import numpy as np

from braintpu.io import brats, nifti


def test_convert_filename_2025():
    name, gz = brats.convert_filename_2025_to_2021("BraTS-GLI-00003-000-t1n.nii.gz")
    assert name == "BraTS-GLI-00003-000_t1.nii.gz" and not gz
    name, gz = brats.convert_filename_2025_to_2021("BraTS-GLI-00003-000-t1c.nii")
    assert name == "BraTS-GLI-00003-000_t1ce.nii.gz" and gz
    name, gz = brats.convert_filename_2025_to_2021("BraTS-GLI-00003-000-t2f.nii.gz")
    assert name == "BraTS-GLI-00003-000_flair.nii.gz"
    name, gz = brats.convert_filename_2025_to_2021("BraTS-GLI-00003-000-seg.nii.gz")
    assert name == "BraTS-GLI-00003-000_seg.nii.gz"
    assert brats.convert_filename_2025_to_2021("random_file.nii.gz") == (None, False)


def test_rename_folder(tmp_path):
    case = "BraTS-GLI-00042-000"
    vol = np.zeros((4, 4, 4), dtype=np.float32)
    for suf in ("t1n", "t1c", "t2w", "t2f", "seg"):
        nifti.save(vol, tmp_path / f"{case}-{suf}.nii.gz")
    # plus one uncompressed file
    nifti.save(vol, tmp_path / f"{case}-t1n.nii")
    (tmp_path / f"{case}-t1n.nii.gz").unlink()

    changes = brats.rename_brats2025_folder(tmp_path)
    assert len(changes) == 5
    for suf in ("t1", "t1ce", "t2", "flair", "seg"):
        p = tmp_path / f"{case}_{suf}.nii.gz"
        assert p.exists(), suf
        img = nifti.load(p)  # must decode (i.e. was gzipped properly)
        assert img.shape == (4, 4, 4)


def test_find_cases_both_schemes(tmp_path):
    vol = np.zeros((4, 4, 4), dtype=np.float32)
    d1 = tmp_path / "case2021"
    d1.mkdir()
    for suf in ("t1", "t1ce", "t2", "flair", "seg"):
        nifti.save(vol, d1 / f"BraTS2021_00495_{suf}.nii.gz")
    d2 = tmp_path / "case2025"
    d2.mkdir()
    for suf in ("t1n", "t1c", "t2w", "t2f"):
        nifti.save(vol, d2 / f"BraTS-GLI-00003-000-{suf}.nii.gz")
    d3 = tmp_path / "incomplete"
    d3.mkdir()
    nifti.save(vol, d3 / "BraTS2021_00001_t1.nii.gz")

    cases = brats.find_cases(tmp_path)
    by_id = {c.case_id: c for c in cases}
    assert set(by_id) == {"BraTS2021_00495", "BraTS-GLI-00003-000"}
    assert by_id["BraTS2021_00495"].seg_path is not None
    assert by_id["BraTS-GLI-00003-000"].seg_path is None
    # channel order
    paths = by_id["BraTS2021_00495"].ordered_paths()
    assert [p.name.split("_")[-1].split(".")[0] for p in paths] == [
        "t1",
        "t1ce",
        "t2",
        "flair",
    ]


def test_load_case_volumes(synth_case):
    cases = brats.find_cases(synth_case)
    assert len(cases) == 1
    data, affine, zooms = brats.load_case_volumes(cases[0])
    assert data.shape == (4, 48, 52, 44)
    assert data.dtype == np.float32
    assert zooms[:3] == (1.0, 1.0, 1.0)
    assert affine[0, 3] == -24


def test_case_prefetcher_yields_all_cases(tmp_path):
    """CasePrefetcher overlaps loads but yields every case in order with the
    same data as a direct load."""
    import numpy as np

    from braintpu.io import nifti
    from braintpu.io.brats import CasePrefetcher, find_cases, load_case_volumes

    aff = np.eye(4)
    rng = np.random.default_rng(0)
    for k in range(3):
        d = tmp_path / f"BraTS-GLI-0880{k}-000"
        d.mkdir()
        for mod in ["t1", "t1ce", "t2", "flair"]:
            nifti.save(rng.normal(size=(6, 7, 8)).astype(np.float32),
                       d / f"BraTS-GLI-0880{k}-000_{mod}.nii.gz", affine=aff)
    cases = find_cases(tmp_path)
    assert len(cases) == 3
    seen = []
    for case, (data, affine, zooms) in CasePrefetcher(cases, depth=2):
        ref, _, _ = load_case_volumes(case)
        np.testing.assert_array_equal(data, ref)
        seen.append(case.case_id)
    assert seen == [c.case_id for c in cases]


def test_case_prefetcher_reusable(tmp_path):
    """A prefetcher can be iterated more than once (epoch 2, retry after an
    early break) — the decode pool is per-iteration, not per-object."""
    import numpy as np

    from braintpu.io import nifti
    from braintpu.io.brats import CasePrefetcher, find_cases

    aff = np.eye(4)
    rng = np.random.default_rng(1)
    for k in range(2):
        d = tmp_path / f"BraTS-GLI-0881{k}-000"
        d.mkdir()
        for mod in ["t1", "t1ce", "t2", "flair"]:
            nifti.save(rng.normal(size=(5, 6, 7)).astype(np.float32),
                       d / f"BraTS-GLI-0881{k}-000_{mod}.nii.gz", affine=aff)
    pf = CasePrefetcher(find_cases(tmp_path), depth=2)
    first = next(iter(pf))  # partial consumption (break after one case)
    assert first[1][0].shape == (4, 5, 6, 7)
    seen = [case.case_id for case, _ in pf]  # full second pass must work
    assert len(seen) == 2
