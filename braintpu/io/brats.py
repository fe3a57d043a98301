"""BraTS case discovery and naming-scheme handling.

Covers the reference's L1 data layer:
* BraTS-2025 → BraTS-2021 filename conversion
  (ref: /root/reference/convert_brats2025_naming.py:40-85),
* case discovery across both naming schemes
  (ref: /root/reference/run_brats2021_inference_singlethread.py:26-78,
        /root/reference/feature_extraction/utils.py:71-116),
* the canonical modality → channel-index order
  (ref: /root/reference/run_brats2021_inference_singlethread.py:48-53).

Unlike the reference, renaming is non-destructive metadata resolution: we
never copy `_0000..._0003` staging files; the loader reads the four
modalities directly into a (4, X, Y, Z) array in the canonical order.
"""

from __future__ import annotations

import gzip
import os
import re
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from . import nifti

__all__ = [
    "MODALITIES",
    "MODALITY_CHANNEL",
    "SUFFIX_MAP_2025_TO_2021",
    "BRATS2025_PATTERN",
    "convert_filename_2025_to_2021",
    "rename_brats2025_folder",
    "BratsCase",
    "find_cases",
    "load_case_volumes",
    "CasePrefetcher",
]

#: Canonical modality order = nnU-Net channel order (T1→0000 … FLAIR→0003).
MODALITIES: Tuple[str, ...] = ("t1", "t1ce", "t2", "flair")
MODALITY_CHANNEL: Dict[str, int] = {m: i for i, m in enumerate(MODALITIES)}

#: BraTS-2025 suffixes → BraTS-2021 suffixes.
SUFFIX_MAP_2025_TO_2021: Dict[str, str] = {
    "t1n": "t1",
    "t1c": "t1ce",
    "t2w": "t2",
    "t2f": "flair",
    "seg": "seg",
}

BRATS2025_PATTERN = re.compile(
    r"^(?P<case>BraTS-[A-Za-z]+-\d{5}-\d{3})-(?P<suffix>t1n|t1c|t2w|t2f|seg)"
    r"\.(?P<ext>nii(?:\.gz)?)$"
)

_2021_SUFFIX = r"(?P<suffix>t1ce|t1|t2|flair|seg)"
BRATS2021_PATTERN = re.compile(
    rf"^(?P<case>.+)_{_2021_SUFFIX}\.(?P<ext>nii(?:\.gz)?)$"
)


def convert_filename_2025_to_2021(filename: str) -> Tuple[Optional[str], bool]:
    """Map a BraTS-2025 filename to 2021 convention.

    Returns ``(new_name, needs_compression)``; ``(None, False)`` when the name
    is not a 2025-scheme file.  Output always uses ``.nii.gz``.
    """
    m = BRATS2025_PATTERN.match(filename)
    if not m:
        return None, False
    new_suffix = SUFFIX_MAP_2025_TO_2021[m.group("suffix")]
    return f"{m.group('case')}_{new_suffix}.nii.gz", m.group("ext") == "nii"


def rename_brats2025_folder(folder: os.PathLike, dry_run: bool = False) -> List[Tuple[str, str]]:
    """Rename (and gzip-compress when needed) all 2025-scheme files in place.

    Returns the list of ``(old_name, new_name)`` pairs that were (or would be)
    converted.  Files already in 2021 convention are left untouched.
    """
    folder = Path(folder)
    changes: List[Tuple[str, str]] = []
    for entry in sorted(folder.iterdir()):
        if not entry.is_file():
            continue
        new_name, needs_gz = convert_filename_2025_to_2021(entry.name)
        if new_name is None:
            continue
        changes.append((entry.name, new_name))
        if dry_run:
            continue
        dst = folder / new_name
        if needs_gz:
            payload = entry.read_bytes()
            try:
                # parallel multi-member gzip (native runtime); ~35 MB per
                # bare .nii volume makes the single-threaded path noticeable
                from ..native import write_gz

                write_gz(dst, payload)
            except (IOError, ImportError):
                with gzip.open(dst, "wb") as f_out:
                    f_out.write(payload)
            entry.unlink()
        else:
            entry.rename(dst)
    return changes


@dataclass
class BratsCase:
    """A resolved BraTS case: one path per modality (+ optional ground truth)."""

    case_id: str
    modality_paths: Dict[str, Path]  # keys: t1, t1ce, t2, flair
    seg_path: Optional[Path] = None
    folder: Optional[Path] = None

    @property
    def is_complete(self) -> bool:
        return all(m in self.modality_paths for m in MODALITIES)

    def ordered_paths(self) -> List[Path]:
        """Paths in canonical channel order (T1, T1ce, T2, FLAIR)."""
        return [self.modality_paths[m] for m in MODALITIES]


def _scan_folder(folder: Path) -> Dict[str, BratsCase]:
    cases: Dict[str, BratsCase] = {}
    for entry in sorted(folder.iterdir()):
        if not entry.is_file() or ".nii" not in entry.name:
            continue
        suffix = None
        case_id = None
        m25 = BRATS2025_PATTERN.match(entry.name)
        if m25:
            case_id = m25.group("case")
            suffix = SUFFIX_MAP_2025_TO_2021[m25.group("suffix")]
        else:
            m21 = BRATS2021_PATTERN.match(entry.name)
            if m21:
                case_id = m21.group("case")
                suffix = m21.group("suffix")
        if case_id is None:
            continue
        case = cases.setdefault(case_id, BratsCase(case_id, {}, folder=folder))
        if suffix == "seg":
            case.seg_path = entry
        else:
            case.modality_paths[suffix] = entry
    return cases


def find_cases(root: os.PathLike, recursive: bool = True) -> List[BratsCase]:
    """Discover BraTS cases under ``root`` (both 2021 and 2025 naming).

    A case is returned only if all four modalities are present; cases keep the
    ground-truth `seg` path when one exists alongside.
    """
    root = Path(root)
    folders = [root]
    if recursive:
        folders += [p for p in sorted(root.rglob("*")) if p.is_dir()]
    out: List[BratsCase] = []
    seen = set()
    for folder in folders:
        for case_id, case in _scan_folder(folder).items():
            key = (case_id, str(folder))
            if case.is_complete and key not in seen:
                seen.add(key)
                out.append(case)
    return out


def load_case_volumes(case: BratsCase) -> Tuple[np.ndarray, np.ndarray, Tuple[float, ...]]:
    """Load the four modalities as a float32 (4, X, Y, Z) stack.

    Returns ``(data, affine, zooms)``.  All modalities must share a shape;
    the affine/zooms of the first modality are used (BraTS volumes are
    co-registered on a 1 mm isotropic grid).
    """
    paths = case.ordered_paths()
    try:
        # Fast path: native batch decoder (one zlib-inflate thread per file).
        from braintpu import native

        vols = native.read_batch_f32(paths)
        shapes = {v.shape for v in vols}
        if len(shapes) != 1:
            raise ValueError(f"modality shape mismatch for {case.case_id}: {shapes}")
        _, affine, zooms = nifti.load_header(paths[0])
        return np.stack(vols, axis=0), affine, zooms
    except ValueError:
        raise
    except Exception:
        pass  # native unavailable or decode failure — pure-Python fallback
    imgs = [nifti.load(p) for p in paths]
    shapes = {im.shape for im in imgs}
    if len(shapes) != 1:
        raise ValueError(f"modality shape mismatch for {case.case_id}: {shapes}")
    data = np.stack([im.get_fdata(dtype=np.float32) for im in imgs], axis=0)
    return data, imgs[0].affine, imgs[0].get_zooms()

class CasePrefetcher:
    """Overlap host-side NIfTI decode with device compute (SURVEY §2.2 "PP").

    Wraps a case list into an iterator of ``(case, (data, affine, zooms))``
    where case *k+1*'s 4-modality decode + decompression runs on a
    background thread while the consumer segments case *k* on the device.
    The reference is strictly serial (one subprocess per stage); here the
    host's decode latency hides entirely behind device time.

    Usage::

        for case, loaded in CasePrefetcher(cases):
            data, affine, zooms = loaded
            ...
    """

    def __init__(self, cases: Sequence[BratsCase], depth: int = 1):
        self._cases = list(cases)
        self._depth = max(1, depth)

    def __iter__(self):
        import collections
        import concurrent.futures as cf

        # one pool per iteration: the prefetcher stays reusable (epoch 2,
        # retry after an early break) instead of raising 'cannot schedule
        # new futures after shutdown' on the second pass
        pool = cf.ThreadPoolExecutor(max_workers=self._depth)
        pending = collections.deque()
        idx = 0
        try:
            while idx < len(self._cases) or pending:
                while idx < len(self._cases) and len(pending) <= self._depth:
                    case = self._cases[idx]
                    pending.append((case, pool.submit(load_case_volumes, case)))
                    idx += 1
                case, fut = pending.popleft()
                yield case, fut.result()
        finally:
            pool.shutdown(wait=False, cancel_futures=True)

    def __len__(self):
        return len(self._cases)
