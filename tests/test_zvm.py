"""Native interpreter core (native/zvm.cpp) vs the pure-python
interpreter: step-for-step trace, coprocessor-log, memory and register
equality on real kernel executions (kernel routines, the simple-transfer
block, and the add11 contract block with user mode + jumpdest
analysis)."""

import numpy as np
import pytest

from zk_evm_tpu.witness import native_vm
from zk_evm_tpu.witness.assembler import combined_kernel
from zk_evm_tpu.witness.interpreter import (Interpreter, MemoryState,
                                            Registers, initial_registers)
from zk_evm_tpu.witness.testing_fixtures import FIXTURES

pytestmark = pytest.mark.skipif(not native_vm.available(),
                                reason="native library not built")


@pytest.fixture(scope="module")
def kernel():
    return combined_kernel()


def _py_interpreter(kernel, **kw):
    """An Interpreter forced onto the pure-python path."""
    import unittest.mock as mock
    with mock.patch.object(native_vm, "make_memory", MemoryState):
        return Interpreter(kernel, **kw)


def _run_block(kernel, inputs, native: bool, cycle_limit=None):
    interp = (Interpreter(kernel) if native
              else _py_interpreter(kernel))
    interp.initialize_from_inputs(inputs)
    interp.run_segment(initial_registers(kernel), cycle_limit=cycle_limit)
    return interp


def _stacks_equal(sp, sn) -> bool:
    if len(sp) != len(sn):
        return False
    k = min(len(sp), 17)   # native snapshots keep the top 17
    return all(sp[-1 - i] == sn[-1 - i] for i in range(k))


def _assert_same_run(pi, ni):
    assert len(pi.trace) == len(ni.trace)
    for i, (ep, en) in enumerate(zip(pi.trace, ni.trace)):
        assert ep[:4] == en[:4], f"step {i}: pc/op/kernel/ctx differ"
        assert ep[5] == en[5], f"step {i}: gas differs"
        assert ep[6] == en[6], f"step {i}: kind differs"
        assert _stacks_equal(ep[4], en[4]), f"step {i}: stack differs"
    assert pi.arith_log == ni.arith_log
    assert pi.logic_log == ni.logic_log
    assert pi.sponge_log == ni.sponge_log
    assert pi.bp_log == ni.bp_log
    assert pi.stale_contexts == ni.stale_contexts
    assert pi.clock == ni.clock
    rp, rn = pi.registers, ni.registers
    assert (rp.program_counter, rp.is_kernel, rp.context, rp.stack_len,
            rp.gas_used) == (rn.program_counter, rn.is_kernel, rn.context,
                             rn.stack_len, rn.gas_used)
    assert pi.final_registers == ni.final_registers
    assert pi.memory.snapshot_all() == ni.memory.snapshot_all()
    assert pi.memory.active_values(pi.stale_contexts) == \
        ni.memory.active_values(ni.stale_contexts)


def test_kernel_routine_matches(kernel):
    from zk_evm_tpu.witness.interpreter import Segment
    for args in ([0xDEADBEEF, 3, 10], [0xDEADBEEF, 0, 7],
                 [0xDEADBEEF, 255, 2]):
        runs = []
        for native in (False, True):
            interp = (Interpreter(kernel,
                                  kernel.global_labels["exp"],
                                  args) if native
                      else _py_interpreter(
                          kernel,
                          initial_offset=kernel.global_labels["exp"],
                          initial_stack=args))
            interp.memory.set(0, Segment.RlpRaw, 0, 0x80)
            interp.run()
            runs.append(interp)
        pi, ni = runs
        assert pi.stack() == ni.stack()
        assert len(pi.trace) == len(ni.trace)
        assert pi.arith_log == ni.arith_log


def test_simple_transfer_matches(kernel):
    inputs = FIXTURES["simple-transfer"]()
    pi = _run_block(kernel, inputs, native=False)
    ni = _run_block(kernel, inputs, native=True)
    _assert_same_run(pi, ni)


def test_add11_contract_matches(kernel):
    """User-mode execution, gas accounting, jumpdest analysis and
    CALL-family context switching all active."""
    inputs = FIXTURES["add11"]()
    pi = _run_block(kernel, inputs, native=False)
    ni = _run_block(kernel, inputs, native=True)
    _assert_same_run(pi, ni)


def test_cycle_limit_segment_matches(kernel):
    """zk-continuation early stop: the exc_stop epilogue fires at the
    cycle budget on both paths."""
    inputs = FIXTURES["simple-transfer"]()
    pi = _run_block(kernel, inputs, native=False, cycle_limit=5000)
    ni = _run_block(kernel, inputs, native=True, cycle_limit=5000)
    _assert_same_run(pi, ni)
    assert pi.final_registers is not None


def test_segment_tables_match(kernel):
    """The strongest end-to-end check: all table traces of the first
    simple-transfer segment are bit-identical across interpreters."""
    import unittest.mock as mock
    from zk_evm_tpu.witness.segments import generate_segment_tables
    inputs = FIXTURES["simple-transfer"]()
    with mock.patch.object(native_vm, "make_memory", MemoryState):
        segs_py = list(generate_segment_tables(kernel, inputs,
                                               max_cpu_len_log=14))
    segs_nat = list(generate_segment_tables(kernel, inputs,
                                            max_cpu_len_log=14))
    assert len(segs_py) == len(segs_nat)
    for (sp, gp), (sn, gn) in zip(segs_py, segs_nat):
        assert gp.table_in_use == gn.table_in_use
        for k, (tp, tn) in enumerate(zip(gp.traces, gn.traces)):
            if tp is None or tn is None:
                assert tp is None and tn is None, k
                continue
            assert np.array_equal(tp, tn), f"table {k} differs"
        assert gp.mem_after_values == gn.mem_after_values
