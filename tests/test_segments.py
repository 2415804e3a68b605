"""zk-continuations: the simple-transfer block split into 2 segments
(max_cpu_len_log=15; the optimal %stack search brought the block under
2^16 cycles, so the split point moved down a power of two). Every segment's AIRs hold and CTLs balance, the
registers and MemAfter->MemBefore chains are exact, and the final
segment halts with no live memory.

Mirrors the reference's segmentation logic (generation/segments.rs
SegmentDataIterator + tests/simple_transfer.rs run through
prove_all_segments)."""

import pytest

from zk_evm_tpu.witness.assembler import combined_kernel
from zk_evm_tpu.witness.testing_fixtures import build_simple_transfer_inputs
from zk_evm_tpu.witness.segments import generate_segment_tables
from zk_evm_tpu.stark.debug import check_constraints_np, check_ctl_balance
from zk_evm_tpu.tables.all_stark import (all_cross_table_lookups,
                                         MEMORY_CTL_IDX, Table)
from zk_evm_tpu.stark.public_values import memory_extra_looking_values
from zk_evm_tpu.native import keccak256


@pytest.fixture(scope="module")
def segmented():
    kernel = combined_kernel()
    inputs = build_simple_transfer_inputs()
    results = list(generate_segment_tables(kernel, inputs,
                                           max_cpu_len_log=15))
    return kernel, results


def test_splits_into_two_segments(segmented):
    kernel, results = segmented
    assert len(results) == 2
    for seg, gt in results:
        cpu = gt.traces[Table.Cpu]
        assert cpu.shape[1] <= 1 << 15, "segment exceeded 2^15 CPU rows"
    assert results[-1][1].public_values.registers_after.program_counter \
        == kernel.global_labels["halt"]
    assert len(results[-1][1].mem_after_values) == 0


def test_segment_airs_and_ctls(segmented):
    kernel, results = segmented
    kh = int.from_bytes(keccak256(bytes(kernel.code)), "big")
    ctls = all_cross_table_lookups()
    for seg, gt in results:
        for trace, stark in zip(gt.traces, gt.starks):
            if trace is not None:
                check_constraints_np(stark, trace)
        extra = memory_extra_looking_values(gt.public_values, kh,
                                            len(kernel.code))
        check_ctl_balance(ctls, gt.traces, {MEMORY_CTL_IDX: extra})


def test_segment_chaining(segmented):
    kernel, results = segmented
    for (_, a), (segb, b) in zip(results, results[1:]):
        assert a.public_values.registers_after == \
            b.public_values.registers_before
        assert a.mem_after_values == segb.mem_before_values
        # identical propagated values -> identical MemBefore trace/cap
        assert (a.traces[Table.MemAfter] ==
                b.traces[Table.MemBefore]).all()
