"""CLI front-end (`python -m zk_evm_tpu`)."""

import json
import os

import pytest

from zk_evm_tpu.__main__ import main

ARTIFACT = "/root/reference/artifacts/witness_b1033.json"


@pytest.mark.skipif(not os.path.exists(ARTIFACT),
                    reason="witness artifact not mounted")
def test_cli_decode(capsys):
    assert main(["decode", ARTIFACT, "--batch-size", "20"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["txns"] == 118 and out["batches"] == 6
    assert out["checkpoint_ok"] is True
    assert out["gas_used"] == 9241825


def test_cli_requires_subcommand():
    with pytest.raises(SystemExit):
        main([])


def test_cli_worker_drains_queue(tmp_path, capsys):
    """`zk_evm_tpu worker --queue DIR` claims and executes queued jobs
    (echo kind here; prove_block shares cmd_prove's code path)."""
    from zk_evm_tpu.orchestration.queue import FsQueue
    q = FsQueue(str(tmp_path))
    jid = q.submit({"kind": "echo", "payload": "hi"})
    assert main(["worker", "--queue", str(tmp_path),
                 "--max-jobs", "1"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["jobs_executed"] == 1
    assert q.wait(jid, timeout=1)["echo"] == "hi"
