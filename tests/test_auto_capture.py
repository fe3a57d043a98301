"""tools/auto_capture.py — the unattended TPU capture pipeline.

A bug here would squander a relay window (the scarcest resource in this
environment — round 1's benchmark was lost to an outage), so the flag
decision, bench invocation/parsing, and end-to-end phase ordering are
all exercised with stubbed probes and a stubbed bench subprocess.
"""

import importlib.util
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def ac(tmp_path, monkeypatch):
    """A fresh auto_capture module with results redirected to tmp."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    spec = importlib.util.spec_from_file_location(
        "auto_capture_under_test", os.path.join(REPO, "tools", "auto_capture.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(mod, "RESULTS", str(tmp_path / "results.jsonl"))
    monkeypatch.setattr(mod, "SUMMARY", str(tmp_path / "summary.json"))
    monkeypatch.setattr(mod, "relay_up", lambda *a, **k: True)
    # liveness is proven by a real jax child in production; stub it here
    # so main()-level tests don't spawn interpreters
    monkeypatch.setattr(mod, "_device_live", lambda *a, **k: True)
    mod.RESUME_WAIT_S = 0.1
    return mod


ALL_SHAPES = {
    "tiny-smoke": True, "patch-l2": True, "patch-l1": True,
    "bucket-l1-gn": True, "patch-l0-bn": True, "bucket-l0-gn64": True,
    "bucket-l0-concat": True, "tta-batch8-bn-l0": True,
    "tta-batch8-gn-l1": True,
}


def test_decide_flags_all_pass(ac):
    flags = ac.decide_flags(
        {"parity": True, "shapes": dict(ALL_SHAPES), "hang": False},
        {"best": "select", "detail": {}},
    )
    assert flags == {
        "BRAINTPU_FUSED_STAGES": "1",
        "BRAINTPU_FUSED_BATCHED": "1",
        "BRAINTPU_PALLAS_UPCONV": "1",
        "BRAINTPU_UPCONV_STRATEGY": "select",
    }


def test_decide_flags_batched_shape_fails(ac):
    shapes = dict(ALL_SHAPES, **{"tta-batch8-gn-l1": False})
    flags = ac.decide_flags(
        {"parity": True, "shapes": shapes, "hang": False},
        {"best": None, "detail": {}},
    )
    assert flags == {"BRAINTPU_FUSED_STAGES": "1"}


def test_decide_flags_parity_fails(ac):
    flags = ac.decide_flags(
        {"parity": False, "shapes": dict(ALL_SHAPES), "hang": False},
        {"best": None, "detail": {}},
    )
    assert flags == {}


def test_decide_flags_single_shape_fails(ac):
    shapes = dict(ALL_SHAPES, **{"bucket-l0-gn64": False})
    flags = ac.decide_flags(
        {"parity": True, "shapes": shapes, "hang": False},
        {"best": "reshape", "detail": {}},
    )
    # no fused stages, but the independent upconv kernel still qualifies
    assert flags == {
        "BRAINTPU_PALLAS_UPCONV": "1",
        "BRAINTPU_UPCONV_STRATEGY": "reshape",
    }


def test_decide_flags_hang_truncates_shapes(ac):
    # a Mosaic hang stops shape escalation — remaining shapes absent, and
    # their absence must NOT count as passing
    shapes = {"tiny-smoke": True, "patch-l2": False}
    flags = ac.decide_flags(
        {"parity": True, "shapes": shapes, "hang": True},
        {"best": None, "detail": {}},
    )
    assert flags == {}


def test_decide_flags_no_shapes(ac):
    # relay died before any shape probe ran: empty dict must not enable
    flags = ac.decide_flags(
        {"parity": True, "shapes": {}, "hang": False}, {"best": None}
    )
    assert flags == {}


def _fake_bench_run(result_line, rc=0):
    def fake(cmd, **kw):
        class P:
            returncode = rc
            stdout = "# warmup noise\n" + result_line + "\n"
            stderr = "steady"
        assert cmd[1].endswith("bench.py")
        fake.calls.append((cmd, kw.get("env", {})))
        return P()
    fake.calls = []
    return fake


def test_run_bench_parses_and_logs(ac, monkeypatch):
    line = json.dumps({"metric": "m", "value": 7.5, "unit": "s/case",
                       "vs_baseline": 44.0})
    fake = _fake_bench_run(line)
    monkeypatch.setattr(ac.subprocess, "run", fake)
    rec = ac.run_bench("bench-x", ["--mode", "sliding"],
                       {"BRAINTPU_FUSED_STAGES": "1"}, 60.0)
    assert rec["ok"] and rec["result"]["value"] == 7.5
    assert rec["flags"] == {"BRAINTPU_FUSED_STAGES": "1"}
    cmd, env = fake.calls[0]
    assert "--mode" in cmd and "sliding" in cmd
    assert env["BRAINTPU_FUSED_STAGES"] == "1"
    # a stale capture_summary.json must never leak extra flags into a
    # bench child — this run's flags are explicit
    assert env["BRAINTPU_BENCH_NO_TUNED"] == "1"
    logged = [json.loads(ln) for ln in open(ac.RESULTS)]
    assert logged[-1]["step"] == "bench-x" and logged[-1]["ok"]


def test_run_bench_negative_value_not_ok(ac, monkeypatch):
    # bench.py emits value=-1 when the tunnel dies mid-run — must not
    # count as a capture EVEN with rc=0 (rc=2 alone would mask a missing
    # value>0 check)
    line = json.dumps({"metric": "m", "value": -1.0, "unit": "s/case",
                       "vs_baseline": 0.0})
    monkeypatch.setattr(ac.subprocess, "run", _fake_bench_run(line, rc=0))
    rec = ac.run_bench("bench-dead", [], {}, 60.0)
    assert not rec["ok"]
    monkeypatch.setattr(ac.subprocess, "run", _fake_bench_run(line, rc=2))
    assert not ac.run_bench("bench-dead-rc", [], {}, 60.0)["ok"]


def test_run_bench_timeout(ac, monkeypatch):
    def boom(cmd, **kw):
        raise subprocess.TimeoutExpired(cmd, 60.0)
    monkeypatch.setattr(ac.subprocess, "run", boom)
    rec = ac.run_bench("bench-hang", [], {}, 60.0)
    assert not rec["ok"] and "TIMEOUT" in rec["error"]


def test_main_phase_ordering_and_summary(ac, monkeypatch):
    """End-to-end with stubbed probes + bench: safe benches run BEFORE any
    probe, fused re-benches only after, summary carries the best value."""
    import tpu_probe as tp

    # this test exercises the phase machinery with every probe passing;
    # the known-hang pin lists (which force-fail their shapes without
    # poking the compiler) are cleared so the all-pass path is reachable
    monkeypatch.setattr(tp, "STAGE_KNOWN_HANGS", set())
    monkeypatch.setattr(tp, "UPCONV_KNOWN_HANGS", set())
    events = []

    def fake_run_child(code, arg, timeout, env_extra=None):
        import tpu_probe
        if code is tpu_probe._CHILD_STAGE_PARITY:
            events.append("probe:parity")
            return {"probe": "stage:tpu-parity", "ok": True}
        if code is tpu_probe._CHILD_STAGE:
            events.append(f"probe:stage:{arg[0]}")
            return {"probe": f"stage:{arg[0]}", "ok": True}
        if code is tpu_probe._CHILD_UPCONV:
            events.append(f"probe:upconv:{arg[-1]}")
            # make "select" faster so the decision prefers it
            return {"probe": "upconv", "ok": True,
                    "run_s": 0.01 if arg[-1] == "select" else 0.02}
        events.append("probe:other")
        return {"probe": "other", "ok": True}

    import tpu_probe
    monkeypatch.setattr(tpu_probe, "run_child", fake_run_child)
    monkeypatch.setattr(ac.tpu_probe, "run_child", fake_run_child)

    def fake_bench(cmd, **kw):
        env = kw.get("env", {})
        fused = env.get("BRAINTPU_FUSED_STAGES") == "1"
        mode = cmd[cmd.index("--mode") + 1] if "--mode" in cmd else "fullconv"
        events.append(f"bench:{mode}:{'fused' if fused else 'safe'}")
        val = 6.0 if fused else 11.0

        class P:
            returncode = 0
            stdout = json.dumps({"metric": "m", "value": val,
                                 "unit": "s/case", "vs_baseline": 1.0}) + "\n"
            stderr = ""
        return P()

    monkeypatch.setattr(ac.subprocess, "run", fake_bench)
    monkeypatch.setattr(sys, "argv", ["auto_capture.py"])
    assert ac.main() == 0

    bench_events = [e for e in events if e.startswith("bench:")]
    probe_events = [e for e in events if e.startswith("probe:")]
    # safe benches strictly precede every probe; fused strictly after
    first_probe = events.index(probe_events[0])
    assert all(events.index(b) < first_probe
               for b in bench_events if b.endswith(":safe"))
    assert all(events.index(b) > first_probe
               for b in bench_events if b.endswith(":fused"))
    assert "bench:fullconv:safe" in events and "bench:sliding:safe" in events
    assert "bench:fullconv:fused" in events and "bench:sliding:fused" in events

    summary = json.load(open(ac.SUMMARY))
    assert summary["flags"]["BRAINTPU_UPCONV_STRATEGY"] == "select"
    assert summary["flags"]["BRAINTPU_FUSED_BATCHED"] == "1"
    assert summary["best"]["fullconv_s_per_case"] == 6.0
    assert summary["best"]["sliding_s_per_case"] == 6.0


def test_main_yields_to_foreign_bench(ac, monkeypatch):
    """When the round driver's bench.py appears, the capture stops starting
    new steps, finalizes the summary, and exits 0 (TPU freed)."""
    calls = {"n": 0}

    def fake_bench(cmd, **kw):
        calls["n"] += 1

        class P:
            returncode = 0
            stdout = json.dumps({"metric": "m", "value": 11.0,
                                 "unit": "s/case", "vs_baseline": 1.0}) + "\n"
            stderr = ""
        return P()

    monkeypatch.setattr(ac.subprocess, "run", fake_bench)
    # foreign bench appears after the first safe bench completes
    monkeypatch.setattr(
        ac, "_foreign_bench_running", lambda: calls["n"] >= 1
    )
    monkeypatch.setattr(sys, "argv", ["auto_capture.py"])
    assert ac.main() == 0
    assert calls["n"] == 1  # second safe bench never started
    summary = json.load(open(ac.SUMMARY))
    assert summary["yielded_to_driver"] is True


def test_foreign_bench_detection_ignores_own_children(ac):
    """A bench.py THIS process spawned (ppid == us, like the capture's own
    bench children) must not trigger the yield; the scan only fires on
    processes with a different parent (the round driver's)."""
    p = subprocess.Popen(
        [sys.executable, "-c", "import time; time.sleep(10)", "bench.py"],
    )
    try:
        # our direct child carries 'bench.py' in its cmdline but has
        # ppid == os.getpid(), so it is not foreign
        assert ac._foreign_bench_running() is False
    finally:
        p.kill()
        p.wait()


def test_main_relay_never_up(ac, monkeypatch, capsys):
    monkeypatch.setattr(ac, "relay_up", lambda *a, **k: False)
    monkeypatch.setattr(sys, "argv", ["auto_capture.py"])
    assert ac.main() == 2


def test_main_waits_out_dead_backend(ac, monkeypatch):
    """Relay ports open but device never answers: no capture step may
    start, and main gives up with rc 2 at the watch deadline."""
    monkeypatch.setattr(ac, "_device_live", lambda *a, **k: False)
    clock = {"t": 0.0}
    monkeypatch.setattr(ac.time, "monotonic", lambda: clock["t"])
    monkeypatch.setattr(
        ac.time, "sleep", lambda s: clock.__setitem__("t", clock["t"] + s)
    )
    started = []
    monkeypatch.setattr(
        ac.subprocess, "run",
        lambda *a, **k: started.append(a) or (_ for _ in ()).throw(
            AssertionError("bench started with dead backend")),
    )
    monkeypatch.setattr(sys, "argv", ["auto_capture.py"])
    assert ac.main() == 2
    assert not started
