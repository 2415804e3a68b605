"""Metrics registry + timed() integration."""

import json
import time

from zk_evm_tpu import metrics
from zk_evm_tpu.timing import TimingTree, timed


def test_counters_gauges_timers(tmp_path):
    metrics.REGISTRY.reset()
    metrics.inc("x")
    metrics.inc("x", 2)
    metrics.gauge("g", 7.5)
    with metrics.timeit("op"):
        time.sleep(0.01)
    snap = metrics.snapshot()
    assert snap["counters"]["x"] == 3
    assert snap["gauges"]["g"] == 7.5
    assert snap["timers"]["op"]["count"] == 1
    assert snap["timers"]["op"]["total_s"] >= 0.01
    path = tmp_path / "m.json"
    metrics.dump(str(path))
    assert json.loads(path.read_text())["counters"]["x"] == 3


def test_timed_feeds_metrics_without_tree():
    metrics.REGISTRY.reset()
    with timed("loose phase"):
        pass
    assert metrics.snapshot()["timers"]["phase.loose phase"]["count"] == 1


def test_timed_feeds_metrics_with_tree():
    metrics.REGISTRY.reset()
    with TimingTree() as tree:
        with timed("inner"):
            time.sleep(0.002)
    assert metrics.snapshot()["timers"]["phase.inner"]["count"] == 1
    assert tree.root.children[0].name == "inner"


def test_worker_metrics(tmp_path):
    from zk_evm_tpu.orchestration.queue import FsQueue, run_worker
    metrics.REGISTRY.reset()
    q = FsQueue(str(tmp_path))
    q.submit({"kind": "echo", "v": 1})
    q.submit({"kind": "nope"})
    n = run_worker(str(tmp_path), handlers={"echo": lambda j: j["v"]},
                   max_jobs=2)
    assert n == 2
    snap = metrics.snapshot()
    assert snap["counters"]["worker.jobs_completed"] == 1
    assert snap["counters"]["worker.jobs_failed"] == 1
