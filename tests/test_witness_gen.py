"""Full witness generation: the simple-transfer block executed through
the real kernel (init -> main -> txn -> final trie hashing -> halt).

Mirrors /root/reference/evm_arithmetization/tests/simple_transfer.rs:
33-182 — hand-built tries + a real signed type-0 transaction, run
end-to-end in the tracing interpreter. The kernel itself asserts the
before/after trie digests (main.asm hash_initial_tries /
check_txn_trie...), so reaching `halt` IS the correctness check; we
additionally assert the final registers and gas."""

import pytest

from zk_evm_tpu.witness.assembler import combined_kernel
from zk_evm_tpu.witness.interpreter import run_generation
from zk_evm_tpu.witness.testing_fixtures import (build_simple_transfer_inputs,
                                                 build_add11_inputs)


def test_add11_witness_generation():
    kernel = combined_kernel()
    interp = run_generation(kernel, build_add11_inputs(),
                            max_cycles=2_000_000)
    fr = interp.final_registers
    assert fr is not None and fr.program_counter == \
        kernel.global_labels["halt"]
    # the run must actually enter user mode (contract execution)
    assert any(not e[2] for e in interp.trace), "never left kernel mode"
    assert any(e[6] == "syscall" for e in interp.trace), "no syscalls"

    # every row of the recorded trace satisfies the full CPU AIR,
    # including the syscalls_exceptions module on the trap rows
    from zk_evm_tpu.tables.cpu import cpu_rows_from_run
    from zk_evm_tpu.stark.debug import check_constraints_np
    trace, stark = cpu_rows_from_run(interp)
    check_constraints_np(stark, trace)


def test_simple_transfer_witness_generation():
    kernel = combined_kernel()
    inputs = build_simple_transfer_inputs()
    interp = run_generation(kernel, inputs, max_cycles=2_000_000)

    fr = interp.final_registers
    assert fr is not None, "did not reach halt"
    assert fr.program_counter == kernel.global_labels["halt"]
    assert fr.is_kernel
    # The kernel already asserted digests-after == claimed roots before
    # jumping to halt; sanity-check the gas bookkeeping too.
    from zk_evm_tpu.tables.segments import Segment
    from zk_evm_tpu.witness.interpreter import _gm
    gas_after = interp.memory.get(0, Segment.GlobalMetadata,
                                  _gm("BLOCK_GAS_USED_AFTER"))
    assert gas_after == 21032
