"""P7 pipelining: ordering, overlap, bounded prefetch, error paths."""

import threading
import time

import pytest

from zk_evm_tpu.orchestration.pipeline import prove_segments_pipelined


class Seg:
    def __init__(self, i):
        self.index = i


def test_order_and_results():
    items = [(Seg(i), i * 10) for i in range(5)]
    proofs = prove_segments_pipelined(iter(items), lambda t: t + 1)
    assert proofs == [1, 11, 21, 31, 41]


def test_producer_overlaps_consumer():
    """Witness gen for segment i+1 starts while segment i proves."""
    events = []
    lock = threading.Lock()

    def gen():
        for i in range(3):
            time.sleep(0.02)
            with lock:
                events.append(("gen", i))
            yield Seg(i), i

    def prove(t):
        time.sleep(0.05)
        with lock:
            events.append(("prove", t))
        return t

    prove_segments_pipelined(gen(), prove, prefetch=2)
    # gen(1) must land before prove(0) completes (overlap)
    assert events.index(("gen", 1)) < events.index(("prove", 1))
    gi = [i for i, e in enumerate(events) if e[0] == "gen"]
    pi = [i for i, e in enumerate(events) if e[0] == "prove"]
    assert gi[1] < pi[0] or gi[2] < pi[1], f"no overlap: {events}"


def test_bounded_prefetch():
    produced = []

    def gen():
        for i in range(6):
            produced.append(i)
            yield Seg(i), i

    seen = []

    def prove(t):
        # by the time we prove item 0, at most 1 (in-flight) + 1
        # (queued) + 1 (being generated) items may exist
        seen.append(len(produced))
        return t

    prove_segments_pipelined(gen(), prove, prefetch=1)
    assert seen[0] <= 3


def test_producer_error_propagates():
    def gen():
        yield Seg(0), 0
        raise RuntimeError("witness gen failed")

    with pytest.raises(RuntimeError, match="witness gen failed"):
        prove_segments_pipelined(gen(), lambda t: t)


def test_prover_error_propagates():
    items = [(Seg(0), 0), (Seg(1), 1)]

    def prove(t):
        if t == 1:
            raise ValueError("bad segment")
        return t

    with pytest.raises(ValueError, match="bad segment"):
        prove_segments_pipelined(iter(items), prove)
