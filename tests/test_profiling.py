"""Observability-layer tests: StageTimer spans, honest device timing, and
the xplane trace analyzer (SURVEY.md §5 — the reference has no profiling
story; these are the tools that found the conv-path bottlenecks).

The xplane tests synthesize a tiny XSpace protobuf with the TF schema —
the same wire format `jax.profiler.trace` writes — so `aggregate_trace`
and `latest_xplane` are exercised without TPU hardware.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pytest

from braintpu.utils.profiling import StageTimer, timed_device
from braintpu.utils.xprof import aggregate_trace, format_table, latest_xplane


# ---------------------------------------------------------------- StageTimer


def test_stage_timer_nesting_and_summary():
    t = StageTimer()
    with t.span("outer"):
        with t.span("inner_a"):
            time.sleep(0.01)
        with t.span("inner_b"):
            pass
    with t.span("second_root"):
        pass

    summary = t.summary()
    assert [s["name"] for s in summary] == ["outer", "second_root"]
    outer = summary[0]
    assert [c["name"] for c in outer["children"]] == ["inner_a", "inner_b"]
    # parent spans at least its children
    assert outer["seconds"] >= outer["children"][0]["seconds"]
    assert outer["children"][0]["seconds"] >= 0.01


def test_stage_timer_exception_closes_span():
    t = StageTimer()
    with pytest.raises(ValueError):
        with t.span("boom"):
            raise ValueError("x")
    # span ended despite the exception; stack unwound so new roots work
    assert t.summary()[0]["name"] == "boom"
    assert t.summary()[0]["seconds"] >= 0
    with t.span("after"):
        pass
    assert [s["name"] for s in t.summary()] == ["boom", "after"]


def test_stage_timer_report_and_save(tmp_path):
    t = StageTimer()
    with t.span("segmenting"):
        with t.span("model1"):
            pass
    report = t.report()
    lines = report.splitlines()
    assert lines[0].startswith("segmenting")
    assert lines[1].startswith("  model1")  # indented child
    out = tmp_path / "spans.json"
    t.save(out)
    loaded = json.loads(out.read_text())
    assert loaded[0]["name"] == "segmenting"
    assert loaded[0]["children"][0]["name"] == "model1"


def test_timed_device_syncs_and_returns_result():
    import jax.numpy as jnp

    def fn(x):
        return jnp.sum(x * 2.0)

    x = jnp.arange(16.0)
    result, seconds = timed_device(fn, x, repeats=2)
    assert float(result) == float(np.arange(16.0).sum() * 2.0)
    assert seconds >= 0.0


# ------------------------------------------------------------------- xplane


def _write_xspace(path, plane_name="/device:TPU:0", line_name="XLA Ops",
                  events=(("fusion.1", 2.0, 2), ("copy.3", 1.0, 1))):
    """Serialize a minimal XSpace: one plane, one line, the given events
    (name, total_ms, count) split into `count` equal-duration occurrences."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    plane = xs.planes.add()
    plane.name = plane_name
    for i, (name, _, _) in enumerate(events, start=1):
        meta = plane.event_metadata[i]
        meta.id = i
        meta.name = name
    line = plane.lines.add()
    line.name = line_name
    for i, (_, total_ms, count) in enumerate(events, start=1):
        for _ in range(count):
            ev = line.events.add()
            ev.metadata_id = i
            ev.duration_ps = int(total_ms / count * 1e9)
    with open(path, "wb") as f:
        f.write(xs.SerializeToString())


def test_latest_xplane_picks_newest(tmp_path):
    pytest.importorskip("tensorflow.tsl.profiler.protobuf")
    assert latest_xplane(str(tmp_path)) is None
    for stamp in ("2026_01_01_00_00_00", "2026_02_02_00_00_00"):
        d = tmp_path / "plugins" / "profile" / stamp
        d.mkdir(parents=True)
        _write_xspace(d / "host.xplane.pb")
    newest = latest_xplane(str(tmp_path))
    assert newest is not None and "2026_02_02" in newest


def test_aggregate_trace_per_op_table(tmp_path):
    pytest.importorskip("tensorflow.tsl.profiler.protobuf")
    d = tmp_path / "plugins" / "profile" / "2026_01_01_00_00_00"
    d.mkdir(parents=True)
    _write_xspace(
        d / "host.xplane.pb",
        events=(("fusion.1", 4.0, 2), ("dot.7", 6.0, 3), ("copy.2", 1.0, 1)),
    )
    # accepts a logdir (resolves newest capture) or the .pb directly
    for target in (str(tmp_path), str(d / "host.xplane.pb")):
        ops = aggregate_trace(target)
        assert [o.name for o in ops] == ["dot.7", "fusion.1", "copy.2"]
        dot = ops[0]
        assert dot.total_ms == pytest.approx(6.0)
        assert dot.count == 3
        assert dot.mean_ms == pytest.approx(2.0)
    table = format_table(ops, top=2)
    assert "dot.7" in table and "fusion.1" in table
    assert "copy.2" not in table.split("(all")[0].splitlines()[-1]
    assert "(all 3 ops)" in table


def test_aggregate_trace_rejects_host_only_capture(tmp_path):
    pytest.importorskip("tensorflow.tsl.profiler.protobuf")
    d = tmp_path / "plugins" / "profile" / "2026_01_01_00_00_00"
    d.mkdir(parents=True)
    # a CPU/host plane only — no TPU/GPU device plane
    _write_xspace(d / "host.xplane.pb", plane_name="/host:CPU")
    with pytest.raises(ValueError, match="no device plane"):
        aggregate_trace(str(tmp_path))
    with pytest.raises(FileNotFoundError):
        aggregate_trace(str(tmp_path / "empty"))


def test_cli_profile_report_renders_table(tmp_path, capsys):
    pytest.importorskip("tensorflow.tsl.profiler.protobuf")
    from braintpu import cli

    d = tmp_path / "plugins" / "profile" / "2026_01_01_00_00_00"
    d.mkdir(parents=True)
    _write_xspace(d / "host.xplane.pb", events=(("conv_fusion.9", 5.0, 5),))
    rc = cli.main(["profile-report", str(tmp_path)])
    out = capsys.readouterr().out
    assert rc == 0
    assert "conv_fusion.9" in out and "(all 1 ops)" in out


# ----------------------------------------------------------------- cli data


def test_cli_data_audits_local_folder(tmp_path, capsys):
    from braintpu.io import nifti
    from braintpu import cli

    case = tmp_path / "BraTS-GLI-02000-000"
    case.mkdir()
    vol = np.zeros((4, 4, 4), np.float32)
    aff = np.eye(4)
    for mod in ("t1", "t1ce", "t2", "flair", "seg"):
        nifti.save(vol, case / f"BraTS-GLI-02000-000_{mod}.nii.gz", affine=aff)

    rc = cli.main(["data", "--root", str(tmp_path)])
    out = capsys.readouterr().out
    assert rc == 0
    assert "1 complete cases, 1 with ground truth" in out
    assert "BraTS-GLI-02000-000" in out


def test_cli_data_prints_access_instructions(capsys):
    from braintpu import cli

    rc = cli.main(["data"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "synapse" in out.lower()
