"""REST API tests: full upload → poll → report → chat cycle over HTTP."""

import io
import json
import threading
import time
import urllib.request
import uuid

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from braintpu.infer import InferenceEngine, ModelBundle
from braintpu.models import UNetConfig, init_params
from braintpu.serve import CLINICAL_REFUSAL, make_server


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    cfg = UNetConfig(
        in_channels=4,
        num_classes=3,
        base_features=4,
        max_features=16,
        num_pool=2,
        conv_per_stage=2,
        norm="batch",
        patch_size=(16, 16, 16),
        compute_dtype=jnp.float32,
    )
    bundle = ModelBundle.from_folds(cfg, [init_params(cfg, jax.random.PRNGKey(0))])
    engine = InferenceEngine(models=[bundle], tta=False, output_convention="internal")
    root = tmp_path_factory.mktemp("serve_root")
    srv = make_server(engine, root, host="127.0.0.1", port=0)
    port = srv.server_address[1]
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{port}"
    srv.shutdown()


def _req(url, data=None, headers=None, method=None):
    req = urllib.request.Request(url, data=data, headers=headers or {}, method=method)
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            return resp.status, resp.read(), dict(resp.headers)
    except urllib.error.HTTPError as e:
        return e.code, e.read(), dict(e.headers)


def _case_files(synth_case):
    files = {}
    for mod in ("t1", "t1ce", "t2", "flair", "seg"):
        p = synth_case / f"BraTS-GLI-99999-000_{mod}.nii.gz"
        files[mod] = p.read_bytes()
    return files


def _multipart(fields, files):
    boundary = f"----braintpu{uuid.uuid4().hex}"
    buf = io.BytesIO()
    for name, value in fields.items():
        buf.write(f"--{boundary}\r\nContent-Disposition: form-data; name=\"{name}\"\r\n\r\n{value}\r\n".encode())
    for name, data in files.items():
        buf.write(
            f"--{boundary}\r\nContent-Disposition: form-data; name=\"{name}\"; "
            f"filename=\"{name}.nii.gz\"\r\nContent-Type: application/octet-stream\r\n\r\n".encode()
        )
        buf.write(data)
        buf.write(b"\r\n")
    buf.write(f"--{boundary}--\r\n".encode())
    return buf.getvalue(), f"multipart/form-data; boundary={boundary}"


def test_index_page(server):
    code, body, headers = _req(server + "/")
    assert code == 200
    assert b"Brain MRI Analysis" in body


def test_analyze_missing_modalities(server):
    body, ctype = _multipart({"case_id": "X"}, {})
    code, resp, _ = _req(
        server + "/api/analyze", data=body, headers={"Content-Type": ctype}, method="POST"
    )
    assert code == 400
    assert b"Missing required modality" in resp


def test_unknown_job_404(server):
    for path in ("/api/status/nope", "/api/report/nope", "/api/metrics/nope"):
        code, _, _ = _req(server + path)
        assert code == 404


def test_full_job_cycle(server, synth_case):
    files = _case_files(synth_case)
    body, ctype = _multipart({"case_id": "BraTS-GLI-99999-000"}, files)
    code, resp, _ = _req(
        server + "/api/analyze", data=body, headers={"Content-Type": ctype}, method="POST"
    )
    assert code == 200, resp
    job_id = json.loads(resp)["job_id"]

    # poll until done
    deadline = time.time() + 120
    status = None
    while time.time() < deadline:
        code, resp, _ = _req(server + f"/api/status/{job_id}")
        assert code == 200
        status = json.loads(resp)
        if status["status"] in ("done", "error"):
            break
        time.sleep(1)
    assert status and status["status"] == "done", status
    assert status["progress_pct"] == 100

    # report text
    code, resp, _ = _req(server + f"/api/report/{job_id}")
    assert code == 200
    assert b"MRI BRAIN WITH CONTRAST" in resp

    # report PDF
    code, resp, headers = _req(server + f"/api/report/{job_id}/pdf")
    assert code == 200
    assert resp.startswith(b"%PDF")
    assert headers.get("Content-Type") == "application/pdf"

    # metrics (GT was uploaded)
    code, resp, _ = _req(server + f"/api/metrics/{job_id}")
    assert code == 200
    metrics = json.loads(resp)
    assert "mean_dice" in metrics

    # chat: clinical gate refuses with 400
    code, resp, _ = _req(
        server + f"/api/chat/{job_id}",
        data=json.dumps({"question": "What treatment should I get?"}).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    assert code == 400
    assert CLINICAL_REFUSAL.encode() in resp

    # chat: educational question answered (offline → grounded refusal string)
    code, resp, _ = _req(
        server + f"/api/chat/{job_id}",
        data=json.dumps({"question": "What is midline shift?"}).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    assert code == 200
    assert "answer" in json.loads(resp)

    # jobs listing includes this job
    code, resp, _ = _req(server + "/api/jobs")
    assert code == 200
    assert any(j["job_id"] == job_id for j in json.loads(resp)["jobs"])


def test_analyze_rejects_traversal_case_id(server, synth_case):
    """case_id feeds filesystem paths; traversal attempts must 400."""
    files = _case_files(synth_case)
    for evil in ("../../tmp/evil", "a/b", "..", ".hidden"):
        body, ctype = _multipart({"case_id": evil}, files)
        code, resp, _ = _req(
            server + "/api/analyze", data=body, headers={"Content-Type": ctype}, method="POST"
        )
        assert code == 400, (evil, resp)
        assert b"invalid case_id" in resp


def test_analyze_rejects_traversal_field_names(server, synth_case, tmp_path):
    """Upload FIELD names feed filesystem paths too — an extra file field
    like 'x/../../tmp/pwn.nii.gz' must 400, never write outside the
    session input dir (regression: arbitrary file write)."""
    files = _case_files(synth_case)
    marker = tmp_path / "pwn.nii.gz"
    files[f"x/../../../../../../../{marker}"] = b"\x1f\x8bpwned"
    body, ctype = _multipart({"case_id": "TRAV-0001"}, files)
    code, resp, _ = _req(
        server + "/api/analyze", data=body, headers={"Content-Type": ctype}, method="POST"
    )
    assert code == 400, resp
    assert b"Unexpected upload field" in resp
    assert not marker.exists()


def test_analyze_json_rejects_invalid_base64(server):
    """Bad base64 in the JSON body must be a 400 response, not a dropped
    connection from an exception escaping the handler."""
    payload = {
        "case_id": "B64-0001",
        "files": {m: "%%%not-base64%%%" for m in ("t1", "t1ce", "t2", "flair")},
    }
    code, resp, _ = _req(
        server + "/api/analyze",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    assert code == 400, resp
    assert b"base64" in resp
    # non-string values too (b64decode would raise TypeError)
    payload["files"] = {m: 7 for m in ("t1", "t1ce", "t2", "flair")}
    code, resp, _ = _req(
        server + "/api/analyze",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    assert code == 400, resp


def test_analyze_json_accepts_wrapped_base64(server, synth_case):
    """RFC-2045-wrapped base64 (newlines every 76 chars, as produced by
    base64.encodebytes / the base64 CLI) must be accepted — validate=True
    alone rejected it."""
    import base64 as _b64

    files = _case_files(synth_case)
    payload = {
        "case_id": "WRAP-0001",
        "files": {m: _b64.encodebytes(files[m]).decode() for m in ("t1", "t1ce", "t2", "flair")},
    }
    code, resp, _ = _req(
        server + "/api/analyze",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    assert code == 200, resp


def test_job_that_dies_early_reports_error(tmp_path):
    """A worker that fails before the pipeline opens its event journal
    (e.g. 'no complete BraTS case') must surface as status=error, not poll
    as 'running / 0%' forever."""
    from braintpu.serve.jobs import JobStore

    store = JobStore(tmp_path / "sessions", tmp_path / "results")
    record = store.create_job("DEAD-0001")

    class _Failed:  # looks like PipelineResult after an early failure
        summary = {"status": "error", "error": "no complete BraTS case in input"}

    store.launch(record["job_id"], lambda rec: _Failed())
    deadline = time.time() + 10
    status = None
    while time.time() < deadline:
        status = store.status(record["job_id"])
        if status and status["status"] == "error":
            break
        time.sleep(0.05)
    assert status is not None and status["status"] == "error"
    assert "no complete BraTS case" in (status["error_message"] or "")

    # a worker that raises outright is caught the same way
    record2 = store.create_job("DEAD-0002")

    def _boom(rec):
        raise RuntimeError("worker exploded")

    store.launch(record2["job_id"], _boom)
    deadline = time.time() + 10
    while time.time() < deadline:
        status = store.status(record2["job_id"])
        if status and status["status"] == "error":
            break
        time.sleep(0.05)
    assert status["status"] == "error"
    assert "worker exploded" in (status["error_message"] or "")


def test_resubmitted_case_id_gets_fresh_job_state(server, synth_case):
    """Two jobs with the SAME case_id must not share status/artifacts
    (regression: results were keyed on case_id, so job 2 reported job 1's
    completed state instantly)."""
    files = _case_files(synth_case)
    body, ctype = _multipart({"case_id": "BraTS-GLI-99999-000"}, files)

    def submit():
        code, resp, _ = _req(
            server + "/api/analyze", data=body, headers={"Content-Type": ctype}, method="POST"
        )
        assert code == 200, resp
        return json.loads(resp)["job_id"]

    job1 = submit()
    deadline = time.time() + 120
    while time.time() < deadline:
        code, resp, _ = _req(server + f"/api/status/{job1}")
        if json.loads(resp)["status"] in ("done", "error"):
            break
        time.sleep(1)
    assert json.loads(resp)["status"] == "done"

    job2 = submit()
    assert job2 != job1
    code, resp, _ = _req(server + f"/api/status/{job2}")
    first_status = json.loads(resp)
    # THE regression signal: job 2's first poll (within ms of submit, long
    # before its worker can finish a segmentation) must NOT report job 1's
    # completed state — 'done' here means results were shared across jobs
    assert first_status["status"] != "done", first_status
    # eventually it completes on its own (fresh deadline: job 1 may have
    # used most of the first budget on a slow box)
    deadline2 = time.time() + 120
    while time.time() < deadline2:
        code, resp, _ = _req(server + f"/api/status/{job2}")
        if json.loads(resp)["status"] in ("done", "error"):
            break
        time.sleep(1)
    assert json.loads(resp)["status"] == "done"


def test_bare_nii_upload_is_gzipped(server, synth_case):
    """Uncompressed .nii uploads must be stored readable (gzipped server-side)."""
    import gzip as _gzip

    files = {
        mod: _gzip.decompress(data) if data[:2] == b"\x1f\x8b" else data
        for mod, data in _case_files(synth_case).items()
    }
    body, ctype = _multipart({"case_id": "BARE-NII-0001"}, files)
    code, resp, _ = _req(
        server + "/api/analyze", data=body, headers={"Content-Type": ctype}, method="POST"
    )
    assert code == 200, resp
    job_id = json.loads(resp)["job_id"]
    deadline = time.time() + 120
    status = None
    while time.time() < deadline:
        code, resp, _ = _req(server + f"/api/status/{job_id}")
        status = json.loads(resp)
        if status["status"] in ("done", "error"):
            break
        time.sleep(1)
    assert status and status["status"] == "done", status


def test_api_never_drops_connection_on_garbage(server):
    """Malformed bodies/headers must yield HTTP error responses, not
    unhandled exceptions that close the socket mid-request."""
    import urllib.error

    cases = [
        # (path, body, content-type)
        ("/api/analyze", b"\x00\xff\x13garbage", "multipart/form-data; boundary=x"),
        ("/api/analyze", b"{not json", "application/json"),
        ("/api/analyze", b"[]", "application/json"),          # non-dict JSON
        ("/api/analyze", json.dumps({"case_id": "A-1", "files": "notadict"}).encode(),
         "application/json"),
        ("/api/analyze", b"", "multipart/form-data"),          # no boundary
        ("/api/chat/doesnotexist", b"{\"question\": 5}", "application/json"),
    ]
    for path, body, ctype in cases:
        try:
            code, resp, _ = _req(
                server + path, data=body,
                headers={"Content-Type": ctype}, method="POST",
            )
        except urllib.error.URLError as e:
            raise AssertionError(f"{path} with {ctype!r} dropped the connection: {e}")
        assert 400 <= code < 500, (path, ctype, code, resp[:200])
