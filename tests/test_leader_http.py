"""HTTP leader: submit -> worker executes -> status transitions."""

import json
import threading
import time
import urllib.request

from zk_evm_tpu.orchestration.leader_http import serve
from zk_evm_tpu.orchestration.queue import run_worker


def _req(url, data=None):
    req = urllib.request.Request(
        url, data=json.dumps(data).encode() if data is not None else None,
        headers={"Content-Type": "application/json"},
        method="POST" if data is not None else "GET")
    with urllib.request.urlopen(req) as r:
        return r.status, json.loads(r.read())


def test_leader_job_lifecycle(tmp_path):
    srv = serve(str(tmp_path), port=0, background=True)
    port = srv.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        code, h = _req(base + "/healthz")
        assert code == 200 and h["ok"]

        code, r = _req(base + "/jobs", {"kind": "square", "v": 9})
        assert code == 202
        job_id = r["job_id"]
        code, st = _req(f"{base}/jobs/{job_id}")
        assert st["status"] == "queued"

        worker = threading.Thread(
            target=run_worker,
            args=(str(tmp_path),),
            kwargs={"handlers": {"square": lambda j: j["v"] ** 2},
                    "max_jobs": 1},
            daemon=True)
        worker.start()
        worker.join(10)
        deadline = time.time() + 10
        while time.time() < deadline:
            code, st = _req(f"{base}/jobs/{job_id}")
            if st["status"] == "done":
                break
            time.sleep(0.05)
        assert st["status"] == "done"
        assert st["result"] == 81

        code, m = _req(base + "/metrics")
        assert code == 200 and "counters" in m

        try:
            _req(f"{base}/jobs/nope")
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        srv.shutdown()


def test_leader_rejects_malformed(tmp_path):
    srv = serve(str(tmp_path), port=0, background=True)
    port = srv.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        req = urllib.request.Request(
            base + "/jobs", data=b"not json", method="POST")
        try:
            urllib.request.urlopen(req)
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        srv.shutdown()
