"""Measure `cli serve` readiness + first-request latency (VERDICT r4 item 3).

Starts the production server in a fresh subprocess (background engine
warm-up on), then records:

  port_bind_s       process start → port accepting connections
  warm_ready_s      process start → "engine warmup done" in the log
  first_job_s       POST /api/analyze (AFTER warm) → job completed
  second_job_s      the steady-state request latency

The reference's first job pays its full ~5-6 min pipeline inside the
request (/root/reference/api.py:220-240); here the warm-up absorbs the
program-load cost at startup so requests pay only their own compute.

Appends a record to tools/coldstart_attr.jsonl (kind=serve_firstjob).

Usage: python tools/serve_firstjob.py [--shape 160,160,120] [--port 8873]
"""

from __future__ import annotations

import argparse
import json
import socket
import subprocess
import sys
import time
import urllib.request
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def port_open(port: int) -> bool:
    with socket.socket() as s:
        s.settimeout(0.5)
        return s.connect_ex(("127.0.0.1", port)) == 0


def post_case(port: int, case_dir: Path) -> str:
    boundary = "briq"
    body = (
        f"--{boundary}\r\nContent-Disposition: form-data; name=\"case_id\"\r\n\r\n"
        f"{case_dir.name}\r\n"
    ).encode()
    for p in sorted(case_dir.glob("*.nii.gz")):
        if "_seg" in p.name:
            continue
        mod = p.name.rsplit("_", 1)[1].split(".")[0]  # t1 / t1ce / t2 / flair
        body += (
            f"--{boundary}\r\nContent-Disposition: form-data; "
            f'name="{mod}"; filename="{p.name}"\r\n'
            "Content-Type: application/octet-stream\r\n\r\n"
        ).encode() + p.read_bytes() + b"\r\n"
    body += f"--{boundary}--\r\n".encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/api/analyze",
        data=body,
        headers={"Content-Type": f"multipart/form-data; boundary={boundary}"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())["job_id"]


def wait_job(port: int, job: str, timeout_s: float) -> dict:
    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/api/status/{job}", timeout=30
        ) as r:
            st = json.loads(r.read())
        if st.get("status") in ("completed", "done", "error"):
            return st
        time.sleep(2.0)
    raise TimeoutError(f"job {job} did not finish in {timeout_s}s: {st}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="240,240,155")
    ap.add_argument("--port", type=int, default=8873)
    ap.add_argument("--warm-timeout", type=float, default=900.0)
    ap.add_argument("--out", type=Path, default=REPO / "tools" / "coldstart_attr.jsonl")
    ap.add_argument("--checkpoints", default=None,
                    help="checkpoint root (model{1,2}/fold_N.npz); members "
                    "without an npz fall back to random init")
    ap.add_argument("--folds", type=int, default=5)
    args = ap.parse_args()
    shape = tuple(int(s) for s in args.shape.split(","))
    if args.checkpoints and not sorted(Path(args.checkpoints).glob("*/fold_0.npz")):
        raise SystemExit(
            f"--checkpoints {args.checkpoints!r} contains no */fold_0.npz — "
            "refusing to measure all-random weights under a trained label"
        )

    from braintpu.train.synthetic import write_synth_case

    case_root = Path("/tmp/braintpu_servejob")
    cid = "BraTS-SV-00000-000"
    if not (case_root / cid).exists():
        write_synth_case(case_root, cid, seed=11, shape=shape)

    log = open("/tmp/braintpu_serve.log", "w")
    t0 = time.monotonic()
    proc = subprocess.Popen(
        [sys.executable, "-m", "braintpu.cli", "serve", "--port", str(args.port),
         "--root", "/tmp/braintpu_serve_root", "--random-weights",
         "--folds", str(args.folds)]
        + (["--checkpoints", args.checkpoints] if args.checkpoints else []),
        cwd=REPO, stdout=log, stderr=subprocess.STDOUT, text=True,
    )
    spans = {}
    try:
        while not port_open(args.port):
            if proc.poll() is not None:
                raise SystemExit(f"serve exited rc={proc.returncode}")
            time.sleep(0.5)
        spans["port_bind_s"] = round(time.monotonic() - t0, 1)
        print(f"# port bound at {spans['port_bind_s']}s", flush=True)

        deadline = time.monotonic() + args.warm_timeout
        while time.monotonic() < deadline:
            txt = Path("/tmp/braintpu_serve.log").read_text()
            if "warmup done" in txt or "warmup failed" in txt:
                break
            time.sleep(2.0)
        else:
            raise TimeoutError("engine warmup never finished")
        spans["warm_ready_s"] = round(time.monotonic() - t0, 1)
        spans["warm_ok"] = "warmup done" in txt
        print(f"# warm ready at {spans['warm_ready_s']}s (ok={spans['warm_ok']})",
              flush=True)

        t1 = time.monotonic()
        job = post_case(args.port, case_root / cid)
        st = wait_job(args.port, job, 600)
        spans["first_job_s"] = round(time.monotonic() - t1, 1)
        spans["first_job_status"] = st.get("status")
        print(f"# first job: {spans['first_job_s']}s ({st.get('status')})", flush=True)

        t1 = time.monotonic()
        job = post_case(args.port, case_root / cid)
        st = wait_job(args.port, job, 600)
        spans["second_job_s"] = round(time.monotonic() - t1, 1)
        spans["second_job_status"] = st.get("status")
        print(f"# second job: {spans['second_job_s']}s ({st.get('status')})", flush=True)
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=20)
        except subprocess.TimeoutExpired:
            proc.kill()
        log.close()

    rec = {"kind": "serve_firstjob", "shape": list(shape), "spans": spans,
           "weights": args.checkpoints or "random", "ts": time.time()}
    print(json.dumps(rec, indent=1))
    with open(args.out, "a") as f:
        f.write(json.dumps(rec) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
