"""Apply hardware-validated kernel flags recorded by the capture tooling.

The Pallas fast paths (fused stage kernel, fused upconv — see
ops/stage_pallas.py, ops/upconv_pallas.py) default to off because an
unvalidated Mosaic compile can wedge this environment's shared remote
compile service (PERF.md "known-good facts").  ``tools/auto_capture.py``
probes them on real TPU (compile + exact-arithmetic parity + speed) and
records the flags that passed in ``tools/capture_summary.json``; this
module applies that record at process start so every entry point — the
CLI, the REST service, bench.py — runs the fastest *validated*
configuration without anyone remembering env vars.

Precedence: explicit environment settings always win; setting
``BRAINTPU_NO_TUNED=1`` (or the bench-specific ``BRAINTPU_BENCH_NO_TUNED``)
disables application entirely.  Flags must be set before the first jit
trace of the affected shapes — entry points call this before any jax
work.

Search order for the record: ``$BRAINTPU_TUNED_FLAGS_FILE``, then
``<repo>/tools/capture_summary.json`` (the dev layout), then
``~/.cache/braintpu/capture_summary.json``.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

__all__ = ["apply_validated_flags", "find_summary"]


def find_summary() -> Optional[str]:
    explicit = os.environ.get("BRAINTPU_TUNED_FLAGS_FILE")
    if explicit:
        # an explicit path is an explicit choice: never fall through to a
        # stale repo/home record that could re-enable kernels the operator
        # tried to pin away from
        return explicit if os.path.isfile(explicit) else None
    pkg_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    candidates = [
        os.path.join(pkg_root, "tools", "capture_summary.json"),
        os.path.expanduser("~/.cache/braintpu/capture_summary.json"),
    ]
    for c in candidates:
        if os.path.isfile(c):
            return c
    return None


def apply_validated_flags(verbose: bool = False) -> Dict[str, str]:
    """Set recorded ``BRAINTPU_*`` flags that are absent from the env.

    Returns the flags actually applied (empty when disabled, no record
    exists, or everything was already set explicitly).
    """
    if (os.environ.get("BRAINTPU_NO_TUNED") == "1"
            or os.environ.get("BRAINTPU_BENCH_NO_TUNED") == "1"):
        return {}
    path = find_summary()
    if path is None:
        return {}
    try:
        with open(path) as f:
            flags = json.load(f).get("flags") or {}
    except (OSError, ValueError):
        return {}
    applied = {}
    for k, v in flags.items():
        if k.startswith("BRAINTPU_") and k not in os.environ:
            os.environ[k] = str(v)
            applied[k] = str(v)
    if applied and verbose:
        import sys

        print(f"# applying TPU-validated kernel flags from {path}: {applied}",
              file=sys.stderr)
    return applied
