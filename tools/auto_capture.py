"""Unattended TPU capture: run the full benchmark suite the moment the
axon relay appears, safest numbers first.

Round 1 lost its benchmark capture to a relay outage (BENCH_r01.json
rc=2), and the relay flaps without warning — so this script is designed
to be left running in the background and to convert ANY tunnel window,
however brief, into a complete driver-grade measurement with zero
interactive latency.

Ordering is safety-first (see PERF.md "known-good facts"): a pathological
Mosaic/XLA compile wedges the shared remote compile service for EVERY
jax process on the box, and only waiting revives it.  Therefore:

  1. Capture the validated-XLA-path benchmarks FIRST (fused kernels off —
     these lowerings were measured working in round 1).  Once those JSON
     lines are on disk the session has a result no matter what happens.
  2. Only then run the Pallas compile probes (tools/tpu_probe.py child
     processes, hard per-probe timeouts, smallest shape first).
  3. Re-run the benchmarks with whichever opt-in kernel flags the probes
     proved out (BRAINTPU_FUSED_STAGES / BRAINTPU_FUSED_BATCHED /
     BRAINTPU_PALLAS_UPCONV + BRAINTPU_UPCONV_STRATEGY).
  4. Low-priority probes (int8 MXU rate, device feature kernels) last.

Every step appends one JSON line to tools/capture_results.jsonl; the
final decision summary lands in tools/capture_summary.json.

Usage:
    python tools/auto_capture.py --watch 12      # poll up to 12 h
    python tools/auto_capture.py                 # relay must be up now
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from braintpu._relay import relay_up  # noqa: E402

import tpu_probe  # noqa: E402

RESULTS = os.path.join(REPO, "tools", "capture_results.jsonl")
SUMMARY = os.path.join(REPO, "tools", "capture_summary.json")

#: if the relay drops mid-capture, poll this long for it to return
#: before abandoning the remaining steps.
RESUME_WAIT_S = 2 * 3600.0


def _log(rec: dict) -> None:
    rec = dict(rec, ts=round(time.time(), 1))
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def _wait_relay(budget_s: float) -> bool:
    deadline = time.monotonic() + budget_s
    while not relay_up():
        if time.monotonic() >= deadline:
            return False
        time.sleep(20.0)
    return True


def _foreign_bench_running() -> bool:
    """Is a bench.py WE didn't spawn running on this box?

    Only one process can hold the TPU; when the round driver launches its
    own `python bench.py`, this capture must stop starting new steps so
    the driver's capture (the one that counts) isn't blocked behind ours.
    """
    me = os.getpid()
    try:
        for pid in os.listdir("/proc"):
            if not pid.isdigit() or int(pid) == me:
                continue
            try:
                with open(f"/proc/{pid}/cmdline", "rb") as f:
                    cmd = f.read().decode(errors="replace")
                with open(f"/proc/{pid}/stat") as f:
                    # comm (field 2) may contain spaces — parse after the
                    # last ')' so e.g. 'tmux: server' can't shift fields
                    stat_rest = f.read().rsplit(")", 1)[-1].split()
                    ppid = int(stat_rest[1])  # state, ppid, ...
            except (OSError, ValueError, IndexError):
                continue
            if "bench.py" in cmd and ppid != me:
                return True
    except OSError:
        pass
    return False


def _should_abort() -> bool:
    if _foreign_bench_running():
        _log({"step": "yield", "ok": False,
              "reason": "foreign bench.py detected (round driver?) — "
                        "stopping to free the TPU"})
        return True
    return False


class _Yield(Exception):
    """Stop the capture: the round driver wants the TPU."""


def _device_live(timeout_s: float = 240.0) -> bool:
    """TCP listeners are necessary but not sufficient: a half-attached
    relay (pump without orchestrator backend) or a wedged remote compile
    service accepts connections yet hangs every jax call.  A tiny cached
    matmul in a killable child is the authoritative liveness signal."""
    rec = tpu_probe.run_child(tpu_probe._CHILD_SMOKE, None, timeout_s)
    return bool(rec.get("ok"))


def _wait_device(budget_s: float) -> bool:
    """Wait until the relay is up AND a jax op actually completes."""
    deadline = time.monotonic() + budget_s
    while True:
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            return False
        if not _wait_relay(remaining):
            return False
        if _device_live():
            return True
        _log({"step": "smoke-retry", "ok": False,
              "reason": "relay ports open but device not answering; "
                        "retrying in 5 min"})
        time.sleep(300.0)


def run_bench(name: str, extra_args, env_extra, timeout_s: float) -> dict:
    """Run bench.py in a subprocess; parse its one JSON result line."""
    if _should_abort():
        raise _Yield
    if not _wait_relay(RESUME_WAIT_S):
        rec = {"step": name, "ok": False, "error": "relay down, gave up"}
        _log(rec)
        return rec
    env = dict(os.environ)
    # This tool decides flags EXPLICITLY per phase; a stale
    # capture_summary.json from a previous run must never leak extra
    # kernel flags into a bench child (bench.py's _apply_tuned_flags
    # would re-enable kernels the CURRENT probes may just have rejected).
    env["BRAINTPU_BENCH_NO_TUNED"] = "1"
    # align bench.py's internal hang watchdog with THIS step's budget —
    # its 1800 s default would kill a healthy-but-slow run we explicitly
    # granted a longer timeout (sliding/batched get +1200 s)
    env.setdefault("BRAINTPU_BENCH_WATCHDOG", str(max(timeout_s - 120.0, 60.0)))
    env.update(env_extra or {})
    # bench.py's own preflight already polls 5 min; that is enough here.
    t0 = time.time()
    try:
        p = subprocess.run(
            [sys.executable, "bench.py", *extra_args],
            cwd=REPO, env=env, capture_output=True, text=True,
            timeout=timeout_s,
        )
        parsed = None
        for ln in (p.stdout or "").splitlines():
            ln = ln.strip()
            if ln.startswith("{"):
                try:  # stray brace-prefixed prints must not kill the watcher
                    parsed = json.loads(ln)
                except ValueError:
                    continue
        rec = {
            "step": name, "ok": p.returncode == 0 and parsed is not None
            and parsed.get("value", -1) > 0,
            "rc": p.returncode, "result": parsed,
            "flags": {k: v for k, v in (env_extra or {}).items()},
            "stderr_tail": (p.stderr or "")[-500:],
        }
    except subprocess.TimeoutExpired:
        rec = {"step": name, "ok": False,
               "error": f"TIMEOUT after {timeout_s}s"}
    rec["wall_s"] = round(time.time() - t0, 1)
    _log(rec)
    return rec


def probe_stage(timeout_s: float) -> dict:
    """Stage-kernel parity + per-shape compile probes; True only if every
    production shape compiles, runs, and matches exact arithmetic."""
    out = {"parity": False, "shapes": {}, "hang": False}
    if not _wait_relay(RESUME_WAIT_S):
        return out
    rec = tpu_probe.run_child(tpu_probe._CHILD_STAGE_PARITY, None, timeout_s)
    out["parity"] = bool(rec.get("ok"))
    if "error" in rec:
        out["hang"] = True
        return out
    for spec in tpu_probe.STAGE_SHAPES:
        if spec[0] in tpu_probe.STAGE_KNOWN_HANGS:
            # a recorded nondeterministic Mosaic hang wedges the shared
            # compile service; count the shape as failed without poking
            out["shapes"][spec[0]] = False
            continue
        if _should_abort():
            raise _Yield
        rec = tpu_probe.run_child(tpu_probe._CHILD_STAGE, spec, timeout_s)
        out["shapes"][spec[0]] = bool(rec.get("ok"))
        if "error" in rec:  # possible Mosaic hang — stop escalating
            out["hang"] = True
            break
    return out


def probe_upconv(timeout_s: float) -> dict:
    """Try both interleave strategies; return the faster exact one."""
    out = {"best": None, "detail": {}, "hang": False}
    for strategy in ("lanes", "reshape", "select"):
        if not _wait_relay(RESUME_WAIT_S):
            return out
        ok, worst = True, 0.0
        for spec in tpu_probe.UPCONV_SHAPES:
            if (spec[0], strategy) in tpu_probe.UPCONV_KNOWN_HANGS:
                # a recorded Mosaic hang wedges the shared compile service;
                # treat the strategy as failed at this shape without poking
                ok = False
                break
            if _should_abort():
                raise _Yield
            rec = tpu_probe.run_child(
                tpu_probe._CHILD_UPCONV, list(spec) + [strategy], timeout_s
            )
            if not rec.get("ok"):
                ok = False
                if "error" in rec:  # timeout = possible Mosaic hang: the
                    # other strategy would poke the same wedged compile
                    # service — stop escalating entirely
                    out["hang"] = True
                break
            worst = max(worst, rec.get("run_s", 0.0))
        out["detail"][strategy] = {"ok": ok, "worst_run_s": worst}
        if out["hang"]:
            return out
        if ok and (out["best"] is None
                   or worst < out["detail"][out["best"]]["worst_run_s"]):
            out["best"] = strategy
    return out


def decide_flags(stage: dict, upconv: dict) -> dict:
    """Probe results → the opt-in env flags they justify.

    Fused stages require exact-arithmetic parity ON TPU plus every
    single-volume production shape compiling and running; the batched
    (sliding-window TTA) flag additionally requires the tta-batch shapes.
    The upconv flag carries the faster exact strategy, if any.
    """
    single = [n for n in stage["shapes"] if not n.startswith("tta-")]
    batched = [n for n in stage["shapes"] if n.startswith("tta-")]
    fused_ok = (stage["parity"] and single
                and all(stage["shapes"][n] for n in single))
    fused_batched_ok = (fused_ok and batched
                        and all(stage["shapes"][n] for n in batched))
    flags = {}
    if fused_ok:
        flags["BRAINTPU_FUSED_STAGES"] = "1"
    if fused_batched_ok:
        flags["BRAINTPU_FUSED_BATCHED"] = "1"
    if upconv.get("best"):
        flags["BRAINTPU_PALLAS_UPCONV"] = "1"
        flags["BRAINTPU_UPCONV_STRATEGY"] = upconv["best"]
    return flags


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--watch", type=float, default=0.0, metavar="HOURS")
    ap.add_argument("--probe-timeout", type=float, default=420.0)
    ap.add_argument("--bench-timeout", type=float, default=2700.0)
    ap.add_argument("--skip-safe", action="store_true",
                    help="skip phase 1 (safe benches already captured)")
    args = ap.parse_args()

    if not _wait_device(max(args.watch * 3600.0, 1.0)):
        _log({"step": "relay", "ok": False})
        return 2
    _log({"step": "relay", "ok": True, "device_live": True})

    summary: dict = {"started": time.time(), "flags": {}}

    try:
        return _capture(args, summary)
    except _Yield:
        summary["yielded_to_driver"] = True
        summary["finished"] = time.time()
        with open(SUMMARY, "w") as f:
            json.dump(summary, f, indent=1, default=str)
        _log({"step": "done-early", "reason": "yielded to driver bench",
              "flags": summary.get("flags", {})})
        return 0


def _bail_if_wedged(probe: dict, summary: dict, step: str) -> bool:
    """A Mosaic hang can wedge the shared remote compile service; every
    further probe would burn its full timeout producing records that
    misread as "kernel rejected".  After any hung probe, re-verify device
    liveness and finalize the summary with what was captured so far."""
    if not (probe.get("hang") and not _device_live()):
        return False
    _log({"step": step, "ok": False})
    summary["finished"] = time.time()
    with open(SUMMARY, "w") as f:
        json.dump(summary, f, indent=1, default=str)
    return True


def _capture(args, summary) -> int:
    # ---- Phase 1: SAFE captures (validated XLA lowerings, kernels off) --
    safe_env = {"BRAINTPU_FUSED_STAGES": "0", "BRAINTPU_PALLAS_UPCONV": "0",
                "BRAINTPU_FUSED_BATCHED": "0"}
    if not args.skip_safe:
        summary["safe_fullconv"] = run_bench(
            "bench-fullconv-safe", [], safe_env, args.bench_timeout)
        summary["safe_sliding"] = run_bench(
            "bench-sliding-safe", ["--mode", "sliding"], safe_env,
            args.bench_timeout + 1200)
        summary["safe_batched"] = run_bench(
            "bench-batched-safe", ["--mode", "batched"], safe_env,
            args.bench_timeout + 1200)

    # ---- Phase 2: kernel compile probes (killable children) ------------
    stage = probe_stage(args.probe_timeout)
    summary["stage_probe"] = stage
    _log({"step": "stage-probe-summary", **stage})

    if _bail_if_wedged(stage, summary, "wedged-after-stage-probe"):
        return 1

    upconv = probe_upconv(args.probe_timeout)
    summary["upconv_probe"] = upconv
    _log({"step": "upconv-probe-summary", **upconv})

    if _bail_if_wedged(upconv, summary, "wedged-after-upconv-probe"):
        return 1

    # ---- Phase 3: flag decision + fused re-benches ---------------------
    flags = decide_flags(stage, upconv)
    summary["flags"] = flags
    _log({"step": "flag-decision", "flags": flags})

    if flags:
        summary["fused_fullconv"] = run_bench(
            "bench-fullconv-fused", [], flags, args.bench_timeout)
        summary["fused_sliding"] = run_bench(
            "bench-sliding-fused", ["--mode", "sliding"], flags,
            args.bench_timeout + 1200)
        if summary["fused_fullconv"].get("ok"):
            summary["fused_batched"] = run_bench(
                "bench-batched-fused", ["--mode", "batched"], flags,
                args.bench_timeout + 1200)

        # Compiling + exact parity is necessary but NOT sufficient to
        # endorse the kernels: round 3 measured the fused stage path at
        # 19.0 s/case vs 9.77 s pure-XLA (channel-minor lane padding costs
        # 4x HBM traffic on ci<128 stages, while XLA picks spatial-minor
        # layouts).  Keep the flags in the tuned record ONLY if the fused
        # benches actually beat the safe ones end-to-end.
        def _v(rec):
            r = (rec or {}).get("result") or {}
            v = r.get("value")
            return v if v and v > 0 else None

        sf, ff = _v(summary.get("safe_fullconv")), _v(summary.get("fused_fullconv"))
        ss, fs = _v(summary.get("safe_sliding")), _v(summary.get("fused_sliding"))
        # strict: a missing safe number (e.g. --skip-safe) must never
        # default to endorsement — no comparison, no flags
        faster = (sf is not None and ff is not None and ff < sf
                  and (fs is None or ss is None or fs <= ss))
        if not faster:
            summary["flags_rejected_slower"] = flags
            flags = {}
            summary["flags"] = flags
            _log({"step": "flag-decision-final", "flags": flags,
                  "reason": "fused benches did not beat safe benches"})

    # ---- Phase 4: low-priority probes ----------------------------------
    # every step re-checks for a foreign bench.py: this phase can hold the
    # TPU for ~1 h and the yield guarantee must cover it too
    phase4 = [(tpu_probe._CHILD_INT8, None, args.probe_timeout, None),
              (tpu_probe._CHILD_FEATURES, None,
               max(args.probe_timeout, 600.0), None)]
    # per-model trace-grade timings for the PERF table, with profiler
    # traces for per-op attribution (kernel decisions)
    trace_env = {"BRAINTPU_PROBE_TRACE_DIR":
                 os.path.join(REPO, "tools", "traces")}
    for which in ("bn", "gn"):
        for mirrors in (1, 8):
            phase4.append((tpu_probe._CHILD_FULLCONV, [which, mirrors],
                           900.0, {**(flags or safe_env), **trace_env}))
    if _wait_relay(60.0):
        for code, parg, tmo, penv in phase4:
            if _should_abort():
                raise _Yield
            tpu_probe.run_child(code, parg, tmo, penv)

    summary["finished"] = time.time()

    def _val(rec):
        r = (rec or {}).get("result") or {}
        return r.get("value")

    summary["best"] = {
        "fullconv_s_per_case": min(
            [v for v in (_val(summary.get("safe_fullconv")),
                         _val(summary.get("fused_fullconv"))) if v and v > 0],
            default=None),
        "sliding_s_per_case": min(
            [v for v in (_val(summary.get("safe_sliding")),
                         _val(summary.get("fused_sliding"))) if v and v > 0],
            default=None),
    }
    with open(SUMMARY, "w") as f:
        json.dump(summary, f, indent=1, default=str)
    _log({"step": "done", "best": summary["best"], "flags": flags})
    return 0


if __name__ == "__main__":
    sys.exit(main())
