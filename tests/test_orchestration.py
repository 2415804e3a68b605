"""In-process runtime + two-segment continuation pipeline."""

import numpy as np
import pytest

from zk_evm_tpu.orchestration import (Runtime, Operation, Monoid,
                                      SegmentTask, prove_segments)
from zk_evm_tpu.orchestration.prover import SegmentAggMonoid, \
    SegmentProofResult


class _Square(Operation):
    def execute(self, x, abort):
        return x * x


class _Sum(Monoid):
    def empty(self):
        return 0

    def combine(self, a, b, abort):
        return a + b


def test_runtime_map_fold():
    rt = Runtime(num_workers=4)
    xs = list(range(17))
    assert rt.map(_Square(), xs) == [x * x for x in xs]
    assert rt.fold(_Sum(), [x * x for x in xs]) == sum(x * x for x in xs)
    assert rt.fold(_Sum(), []) == 0


def test_segment_chain_check():
    m = SegmentAggMonoid()

    class _A:
        pass
    r0 = SegmentProofResult(0, "p0", {"a": 1}, {"a": 2})
    r1 = SegmentProofResult(1, "p1", {"a": 2}, {"a": 3})
    agg = m.combine(r0, r1, Runtime().abort_signal)
    assert agg.proofs == ["p0", "p1"]
    assert agg.mem_before == {"a": 1} and agg.mem_after == {"a": 3}
    # mismatched continuation rejected
    bad = SegmentProofResult(1, "p1", {"a": 99}, {"a": 3})
    with pytest.raises(AssertionError):
        m.combine(r0, bad, Runtime().abort_signal)


def test_two_segment_pipeline_with_real_proofs():
    """Two memory-continuation segments over real tables: segment 0 writes
    a value (appears in its MemAfter); segment 1 starts from that state."""
    from zk_evm_tpu.tables import all_stark as ast
    from zk_evm_tpu.tables import memory as mem
    from zk_evm_tpu.tables import memory_continuation as mc
    from zk_evm_tpu.tables.segments import Segment
    from zk_evm_tpu.stark import StarkConfig, FriConfig

    cfg = StarkConfig(
        security_bits=1,
        fri_config=FriConfig(rate_bits=1, cap_height=2,
                             proof_of_work_bits=0, num_query_rounds=1,
                             arity_bits=2, final_poly_bits=2))
    starks = ast.all_starks()
    # only the memory-continuation CTLs are active in this scenario
    ctls = [c for c in ast.all_cross_table_lookups()
            if c.name in ("memory", "mem_before", "mem_after")]

    def make_segment(idx, before_vals, ops):
        trace, after_vals = mem.generate_trace(
            ops, mem_before_values=before_vals)
        traces = [None] * ast.NUM_TABLES
        traces[ast.Table.Memory] = trace
        traces[ast.Table.MemBefore] = mc.generate_trace(before_vals)
        traces[ast.Table.MemAfter] = mc.generate_trace(after_vals)
        return SegmentTask(idx, traces, dict(before_vals),
                           dict(after_vals)), after_vals

    # without a CPU table, every non-initial memory row would need a CPU
    # looking view; segments carry pure continuation state here
    task0, after0 = make_segment(0, [((0, Segment.MainMemory, 0), 7),
                                     ((0, Segment.MainMemory, 3), 42)], [])
    task1, _ = make_segment(1, after0, [])

    agg = prove_segments(starks, ctls, cfg, [task0, task1])
    assert agg.first == 0 and agg.last == 1
    assert len(agg.proofs) == 2

    # every segment proof verifies
    from zk_evm_tpu.stark import verify_all
    for p in agg.proofs:
        optional = tuple(i for i, pr in enumerate(p.proofs) if pr is None)
        verify_all(starks, p, ctls, cfg, optional_tables=optional)
