"""bench.py helper units: tuned-flag application + watchdog.

These guard the unattended-capture plumbing: the driver's end-of-round
`python bench.py` must pick up TPU-validated kernel flags (and ONLY
those), and a wedged device must degrade to a parsable failure line
rather than a silent hang.
"""

import importlib.util
import json
import os
import threading

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def bench(tmp_path, monkeypatch):
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write_summary(path, flags):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump({"flags": flags}, f)


def test_tuned_flags_applied(bench, monkeypatch, tmp_path):
    summary = os.path.join(REPO, "tools", "capture_summary.json")
    existed = os.path.exists(summary)
    backup = open(summary).read() if existed else None
    try:
        _write_summary(summary, {"BRAINTPU_FUSED_STAGES": "1",
                                 "BRAINTPU_UPCONV_STRATEGY": "select",
                                 "NOT_A_BRAINTPU_FLAG": "1"})
        monkeypatch.delenv("BRAINTPU_FUSED_STAGES", raising=False)
        monkeypatch.delenv("BRAINTPU_UPCONV_STRATEGY", raising=False)
        monkeypatch.delenv("NOT_A_BRAINTPU_FLAG", raising=False)
        monkeypatch.delenv("BRAINTPU_BENCH_NO_TUNED", raising=False)
        bench._apply_tuned_flags()
        assert os.environ.get("BRAINTPU_FUSED_STAGES") == "1"
        assert os.environ.get("BRAINTPU_UPCONV_STRATEGY") == "select"
        # only BRAINTPU_* keys may be applied from the summary
        assert "NOT_A_BRAINTPU_FLAG" not in os.environ
    finally:
        # _apply_tuned_flags mutates os.environ directly and monkeypatch
        # records nothing for vars that were absent — scrub the applied
        # flags so later tests don't silently run under a tuned config
        os.environ.pop("BRAINTPU_FUSED_STAGES", None)
        os.environ.pop("BRAINTPU_UPCONV_STRATEGY", None)
        if existed:
            open(summary, "w").write(backup)
        else:
            os.remove(summary)


def test_tuned_flags_explicit_env_wins(bench, monkeypatch):
    summary = os.path.join(REPO, "tools", "capture_summary.json")
    existed = os.path.exists(summary)
    backup = open(summary).read() if existed else None
    try:
        _write_summary(summary, {"BRAINTPU_FUSED_STAGES": "1"})
        monkeypatch.setenv("BRAINTPU_FUSED_STAGES", "0")
        bench._apply_tuned_flags()
        assert os.environ["BRAINTPU_FUSED_STAGES"] == "0"
        # and the opt-out disables application entirely
        monkeypatch.delenv("BRAINTPU_FUSED_STAGES", raising=False)
        monkeypatch.setenv("BRAINTPU_BENCH_NO_TUNED", "1")
        bench._apply_tuned_flags()
        assert "BRAINTPU_FUSED_STAGES" not in os.environ
    finally:
        if existed:
            open(summary, "w").write(backup)
        else:
            os.remove(summary)


def test_tuned_flags_missing_or_bad_summary(bench, monkeypatch):
    summary = os.path.join(REPO, "tools", "capture_summary.json")
    existed = os.path.exists(summary)
    backup = open(summary).read() if existed else None
    try:
        if existed:
            os.remove(summary)
        monkeypatch.delenv("BRAINTPU_BENCH_NO_TUNED", raising=False)
        bench._apply_tuned_flags()  # no file: no-op, no raise
        _write_summary(summary, None)
        open(summary, "w").write("not json")
        bench._apply_tuned_flags()  # corrupt file: no-op, no raise
    finally:
        if existed:
            open(summary, "w").write(backup)
        elif os.path.exists(summary):
            os.remove(summary)


def test_watchdog_fires_and_cancels(bench, monkeypatch):
    fired = {}
    monkeypatch.setattr(os, "_exit", lambda code: fired.setdefault("code", code))
    monkeypatch.setenv("BRAINTPU_BENCH_WATCHDOG", "0.2")
    t = bench._arm_watchdog(999.0)
    assert isinstance(t, threading.Timer)
    t.join(1.0)
    assert fired.get("code") == 3

    monkeypatch.setenv("BRAINTPU_BENCH_WATCHDOG", "0")
    assert bench._arm_watchdog(999.0) is None

    monkeypatch.setenv("BRAINTPU_BENCH_WATCHDOG", "30")
    t = bench._arm_watchdog(999.0)
    t.cancel()


def test_find_summary_search_order(monkeypatch, tmp_path):
    from braintpu.utils import tuned

    # explicit env wins over everything
    p = tmp_path / "explicit.json"
    p.write_text("{}")
    monkeypatch.setenv("BRAINTPU_TUNED_FLAGS_FILE", str(p))
    assert tuned.find_summary() == str(p)
    # a non-existent explicit path is honored, NOT silently replaced by a
    # stale repo/home record (which could re-enable pinned-away kernels)
    monkeypatch.setenv("BRAINTPU_TUNED_FLAGS_FILE", str(tmp_path / "nope"))
    assert tuned.find_summary() is None
    # without the env var the repo/home caches are searched
    monkeypatch.delenv("BRAINTPU_TUNED_FLAGS_FILE")
    found = tuned.find_summary()
    assert found is None or found.endswith("capture_summary.json")
