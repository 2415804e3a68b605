"""Memory table: ordered argument, gap filling, zero-init, pruning,
full STARK roundtrip."""

import numpy as np
import pytest

from zk_evm_tpu.challenger import Challenger
from zk_evm_tpu.stark import StarkConfig, FriConfig, prove_stark, verify_stark
from zk_evm_tpu.stark.debug import check_constraints
from zk_evm_tpu.tables import memory as mem
from zk_evm_tpu.tables.segments import Segment


def sample_ops():
    ops = []
    t = 8
    # a write then reads at one address
    ops.append(mem.MemoryOp(True, t, 0, Segment.MainMemory, 5, False,
                            0xDEADBEEF))
    ops.append(mem.MemoryOp(True, t + 3, 0, Segment.MainMemory, 5, True,
                            0xDEADBEEF))
    # fresh read of uninitialized address (must be 0)
    ops.append(mem.MemoryOp(True, t + 6, 0, Segment.MainMemory, 9, True, 0))
    # stack activity in another context
    ops.append(mem.MemoryOp(True, t + 9, 1, Segment.Stack, 0, False, 77))
    ops.append(mem.MemoryOp(True, t + 12, 1, Segment.Stack, 0, True, 77))
    # a large timestamp gap (exercises fill_gaps)
    ops.append(mem.MemoryOp(True, t + 500, 1, Segment.Stack, 0, True, 77))
    # preinitialized segment read of nonzero value without prior write
    ops.append(mem.MemoryOp(True, t + 15, 0, Segment.Code, 3, True, 0x60))
    return ops


def _cfg():
    return StarkConfig(
        security_bits=1,
        fri_config=FriConfig(rate_bits=1, cap_height=2,
                             proof_of_work_bits=0, num_query_rounds=2,
                             arity_bits=2, final_poly_bits=2))


def test_trace_and_row_constraints():
    trace, mem_after = mem.generate_trace(sample_ops())
    assert trace.shape[0] == mem.NUM_COLUMNS
    check_constraints(mem.MemoryStark(), trace)
    # surviving values include the final MainMemory write
    addrs = [a for a, _ in mem_after]
    assert (0, Segment.MainMemory, 5) in addrs


def test_zero_init_violation_caught():
    ops = sample_ops()
    # fresh read of nonzero value in a NON-preinitialized segment
    ops.append(mem.MemoryOp(True, 40, 2, Segment.MainMemory, 4, True, 123))
    trace, _ = mem.generate_trace(ops)
    with pytest.raises(AssertionError):
        check_constraints(mem.MemoryStark(), trace)


def test_memory_stark_roundtrip():
    trace, _ = mem.generate_trace(sample_ops())
    cfg = _cfg()
    proof = prove_stark(mem.MemoryStark(), trace, cfg, Challenger())
    verify_stark(mem.MemoryStark(), proof, cfg, Challenger())


def test_memory_stark_with_pruning():
    trace, mem_after = mem.generate_trace(sample_ops(),
                                          stale_contexts=[1])
    # context 1 values must not survive
    assert all(a[0] != 1 for a, _ in mem_after)
    check_constraints(mem.MemoryStark(), trace)
    cfg = _cfg()
    proof = prove_stark(mem.MemoryStark(), trace, cfg, Challenger())
    verify_stark(mem.MemoryStark(), proof, cfg, Challenger())


def test_memory_rejects_read_mutation():
    ops = sample_ops()
    ops[1] = mem.MemoryOp(True, 11, 0, Segment.MainMemory, 5, True,
                          0xBADBAD)  # read differs from prior write
    trace, _ = mem.generate_trace(ops)
    with pytest.raises(AssertionError):
        check_constraints(mem.MemoryStark(), trace)


def test_vectorized_trace_matches_reference():
    """generate_trace (vectorized) is bit-identical to generate_trace_py
    (the row-at-a-time reference), including value limbs, aux columns,
    pruning, frequencies and the MemAfter export."""
    ops = sample_ops()
    mb = [((0, int(Segment.Code), 3), 0x60),
          ((0, int(Segment.ShiftTable), 0), 1)]
    for kwargs in ({}, {"mem_before_values": mb},
                   {"mem_before_values": mb, "stale_contexts": [1]}):
        t1, a1 = mem.generate_trace(ops, **kwargs)
        t2, a2 = mem.generate_trace_py(ops, **kwargs)
        assert np.array_equal(t1, t2)
        assert a1 == a2


def test_array_pipeline_matches_object_path():
    """derive_memory_ops_arrays + generate_trace_arrays produce the
    identical trace to the MemoryOp-object reference path."""
    import numpy as np
    from zk_evm_tpu.tables import cpu as cputab
    from zk_evm_tpu.witness import traces as tr
    from zk_evm_tpu.witness.assembler import combined_kernel
    from zk_evm_tpu.witness.interpreter import run_kernel
    kernel = combined_kernel()
    interp = run_kernel(kernel, "exp", [0xDEADBEEF, 3, 10])
    cpu_trace, _ = cputab.cpu_rows_from_run(interp)
    t1, a1 = mem.generate_trace_arrays(
        tr.derive_memory_ops_arrays(cpu_trace))
    t2, a2 = mem.generate_trace_py(tr.derive_memory_ops(cpu_trace))
    assert np.array_equal(t1, t2)
    assert a1 == a2
