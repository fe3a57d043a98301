"""Loud-failure guards in the measurement tools.

A mistyped --checkpoints path must never silently measure random weights
under a trained label (ADVICE r4): every tool that accepts --checkpoints
refuses to run when the path holds no */fold_0.npz.  These run the tools
as subprocesses (their import paths are cheap until the guard fires) on
CPU with tiny shapes so the failure is fast and environment-independent.
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _run(argv, timeout=180):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable, *argv], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=timeout,
    )


@pytest.mark.parametrize(
    "argv",
    [
        ["tools/serve_firstjob.py", "--checkpoints", "/nonexistent_ckpts"],
        ["tools/pipeline_meas.py", "--checkpoints", "/nonexistent_ckpts",
         "--cases", "1", "--shape", "32,32,32"],
        ["tools/coldstart_attr.py", "--checkpoints", "/nonexistent_ckpts",
         "--shape", "32,32,32"],
    ],
    ids=["serve_firstjob", "pipeline_meas", "coldstart_attr"],
)
def test_bad_checkpoints_fails_loudly(argv):
    res = _run(argv)
    assert res.returncode != 0, res.stdout + res.stderr
    assert "fold_0.npz" in (res.stdout + res.stderr)
