"""In-process runtime + two-segment continuation pipeline."""

import numpy as np
import pytest

from zk_evm_tpu.orchestration import (Runtime, Operation, Monoid,
                                      SegmentTask, prove_segments)
from zk_evm_tpu.orchestration.prover import SegmentAggMonoid, \
    SegmentProofResult
from zk_evm_tpu.stark.multi import AllProof
from zk_evm_tpu.stark.public_values import PublicValues, RegistersData


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


def _fake_proof(regs_before, regs_after, before_cap, after_cap):
    """AllProof stub with just enough structure for the chain checks."""
    from zk_evm_tpu.tables.all_stark import Table, NUM_TABLES

    class _P:
        def __init__(self, cap):
            self.trace_cap = cap
    proofs = [None] * NUM_TABLES
    proofs[Table.MemBefore] = _P(before_cap)
    proofs[Table.MemAfter] = _P(after_cap)
    pv = PublicValues(registers_before=RegistersData(**regs_before),
                      registers_after=RegistersData(**regs_after))
    return AllProof(proofs=proofs, table_in_use=[p is not None
                                                 for p in proofs],
                    public_values=pv)


def test_segment_chain_check():
    m = SegmentAggMonoid()
    cap_a, cap_b, cap_c = [[1, 0, 0, 0]], [[2, 0, 0, 0]], [[3, 0, 0, 0]]
    ra = dict(program_counter=10, gas_used=5)
    rb = dict(program_counter=20, gas_used=9)
    rc = dict(program_counter=30, gas_used=11)
    r0 = SegmentProofResult(0, _fake_proof(ra, rb, cap_a, cap_b))
    r1 = SegmentProofResult(1, _fake_proof(rb, rc, cap_b, cap_c))
    agg = m.combine(r0, r1, Runtime().abort_signal)
    assert agg.first == 0 and agg.last == 1 and len(agg.proofs) == 2
    # mismatched register chain rejected
    bad = SegmentProofResult(1, _fake_proof(rc, rc, cap_b, cap_c))
    with pytest.raises(AssertionError):
        m.combine(r0, bad, Runtime().abort_signal)
    # mismatched cap chain rejected
    bad2 = SegmentProofResult(1, _fake_proof(rb, rc, cap_c, cap_c))
    with pytest.raises(AssertionError):
        m.combine(r0, bad2, Runtime().abort_signal)


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
        regs = RegistersData(program_counter=idx)
        regs_after = RegistersData(program_counter=idx + 1)
        pv = PublicValues(registers_before=regs,
                          registers_after=regs_after)
        return SegmentTask(idx, traces, pv, starks=starks), after_vals

    # without a CPU table, every non-initial memory row would need a CPU
    # looking view; segments carry pure continuation state here
    task0, after0 = make_segment(0, [((0, Segment.MainMemory, 0), 7),
                                     ((0, Segment.MainMemory, 3), 42)], [])
    task1, _ = make_segment(1, after0, [])

    # chain the register claims: segment 1 starts where 0 ended
    task1.public_values.registers_before = \
        task0.public_values.registers_after
    agg = prove_segments(cfg, [task0, task1], ctls=ctls)
    assert agg.first == 0 and agg.last == 1
    assert len(agg.proofs) == 2

    # every segment proof verifies
    from zk_evm_tpu.stark import verify_all
    for p in agg.proofs:
        optional = tuple(i for i, pr in enumerate(p.proofs) if pr is None)
        verify_all(starks, p, ctls, cfg, optional_tables=optional)
