"""Filesystem job queue + worker loop (the leader/worker distribution
layer; zero/src/bin/worker.rs twin). Queue mechanics are exercised with
cheap job kinds; the prove_block handler itself is the same code path as
`zk_evm_tpu prove` (covered by test_cli)."""

import threading

from zk_evm_tpu.orchestration.queue import FsQueue, run_worker


def _echo_handlers():
    return {"echo": lambda job: {"echo": job["payload"]},
            "boom": lambda job: 1 / 0}


def test_submit_claim_complete_roundtrip(tmp_path):
    q = FsQueue(str(tmp_path))
    jid = q.submit({"kind": "echo", "payload": 7})
    claimed = q.claim("w0")
    assert claimed is not None and claimed[0] == jid
    assert claimed[1]["payload"] == 7
    assert q.claim("w1") is None          # already claimed
    q.complete(jid, {"echo": 7})
    assert q.wait(jid, timeout=1)["echo"] == 7


def test_worker_loop_executes_and_reports_errors(tmp_path):
    q = FsQueue(str(tmp_path))
    ids = [q.submit({"kind": "echo", "payload": i}) for i in range(5)]
    bad = q.submit({"kind": "boom"})
    unknown = q.submit({"kind": "nope"})
    n = run_worker(str(tmp_path), handlers=_echo_handlers(),
                   max_jobs=7, worker_name="w0")
    assert n == 7
    assert [q.wait(i, timeout=1)["echo"] for i in ids] == list(range(5))
    for jid, match in ((bad, "ZeroDivisionError"), (unknown, "unknown")):
        try:
            q.wait(jid, timeout=1)
            raise AssertionError("expected failure")
        except RuntimeError as e:
            assert match in str(e)


def test_two_workers_share_the_queue(tmp_path):
    """Concurrent workers never double-execute a job (atomic-rename
    claim) and together drain the queue."""
    q = FsQueue(str(tmp_path))
    executed = []
    lock = threading.Lock()

    def handler(job):
        with lock:
            executed.append(job["payload"])
        return {"echo": job["payload"]}

    ids = [q.submit({"kind": "echo", "payload": i}) for i in range(20)]
    ts = [threading.Thread(
        target=run_worker, args=(str(tmp_path),),
        kwargs=dict(handlers={"echo": handler}, idle_timeout=0.5,
                    worker_name=f"w{k}")) for k in range(2)]
    for t in ts:
        t.start()
    for i in ids:
        assert q.wait(i, timeout=10)["echo"] is not None
    for t in ts:
        t.join()
    assert sorted(executed) == list(range(20))


def test_requeue_stale_claims(tmp_path):
    q = FsQueue(str(tmp_path))
    jid = q.submit({"kind": "echo", "payload": 1})
    assert q.claim("dead-worker") is not None
    assert q.claim("w1") is None
    assert q.requeue_stale(max_age_s=0.0) == 1
    claimed = q.claim("w1")
    assert claimed is not None and claimed[0] == jid


def test_queue_map_orders_results(tmp_path):
    q = FsQueue(str(tmp_path))
    t = threading.Thread(
        target=run_worker, args=(str(tmp_path),),
        kwargs=dict(handlers=_echo_handlers(), idle_timeout=0.5))
    t.start()
    out = q.map([{"kind": "echo", "payload": i} for i in range(8)],
                timeout=10)
    t.join()
    assert [r["echo"] for r in out] == list(range(8))


def test_worker_affinity_routing(tmp_path):
    """Heavy/light routing classes (leader.rs:28-70 twin): a light-only
    worker never claims heavy jobs; an unrestricted worker drains both;
    stale requeues preserve the class."""
    from zk_evm_tpu.orchestration.queue import FsQueue
    q = FsQueue(str(tmp_path))
    heavy = [q.submit({"kind": "echo", "payload": i}, klass="heavy")
             for i in range(3)]
    light = q.submit({"kind": "echo", "payload": "agg"}, klass="light")

    got = q.claim("w-light", classes=("light",))
    assert got is not None and got[0] == light
    assert q.claim("w-light", classes=("light",)) is None

    seen = set()
    while (c := q.claim("w-any")) is not None:
        seen.add(c[0])
    assert seen == set(heavy)

    # stale requeue keeps the routing class claimable by class
    q2 = FsQueue(str(tmp_path / "b"))
    jid = q2.submit({"kind": "echo"}, klass="heavy")
    assert q2.claim("w1", classes=("heavy",))[0] == jid
    import os, time
    for f in os.listdir(q2.path):
        if ".claimed." in f:
            old = time.time() - 3600
            os.utime(os.path.join(q2.path, f), (old, old))
    assert q2.requeue_stale(10) == 1
    assert q2.claim("w2", classes=("heavy",))[0] == jid


def test_bounded_block_pool_runs_all_blocks():
    """prove_blocks_bounded: permits bound concurrency, results keep
    block order (zero/src/prover.rs:53-59 twin)."""
    import threading
    import time as _t
    from zk_evm_tpu.orchestration.aggregation import prove_blocks_bounded
    live = []
    peak = []
    lock = threading.Lock()

    def fake_prove(gis):
        with lock:
            live.append(1)
            peak.append(len(live))
        _t.sleep(0.05)
        with lock:
            live.pop()
        return ("proof", gis[0])

    out = prove_blocks_bounded(None, [[i] for i in range(6)],
                               block_pool_size=2,
                               prove_batches=fake_prove)
    assert [p[1] for p in out] == list(range(6))
    assert max(peak) <= 2


def test_bounded_batch_pool_keeps_batch_order():
    """prove_batch_chains: the P4 batch fan-out bounds concurrency and
    keeps batch order (reference: paladin batch jobs,
    zero/src/prover.rs:72-118)."""
    import threading
    import time as _t
    from zk_evm_tpu.orchestration.aggregation import prove_batch_chains
    live = []
    peak = []
    lock = threading.Lock()

    def fake_prove(item):
        bi, gi = item
        with lock:
            live.append(1)
            peak.append(len(live))
        _t.sleep(0.03 if bi % 2 else 0.06)   # uneven batch durations
        with lock:
            live.pop()
        return ("chain", bi, gi)

    out = prove_batch_chains(list(range(10, 16)), fake_prove,
                             batch_pool_size=3)
    assert [(c[1], c[2]) for c in out] == [(i, 10 + i) for i in range(6)]
    assert max(peak) <= 3
    # pool size 1 falls back to the plain sequential loop
    out1 = prove_batch_chains(list(range(10, 13)), fake_prove,
                              batch_pool_size=1)
    assert [(c[1], c[2]) for c in out1] == [(i, 10 + i) for i in range(3)]
