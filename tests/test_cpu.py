"""CPU table (decode/clock/halt/control-flow/gas/membus/stack):
host checks on real assembled-kernel executions + proof roundtrip."""

import numpy as np
import pytest

from zk_evm_tpu.challenger import Challenger
from zk_evm_tpu.stark import prove_stark, verify_stark
from zk_evm_tpu.stark.debug import check_constraints
from zk_evm_tpu.tables import cpu
from zk_evm_tpu.tables import cpu_columns as cc
from tests.test_stark import _cfg

SRC = """
GLOBAL stack_test:
    PUSH 5
    PUSH 3
    ADD
    NOT
    POP
    PUSH 6
    PUSH 7
    MUL
    DUP1
    LT
    POP
    JUMPDEST
    PUSH 0xdeadbeef
    JUMP
"""


def _run_custom():
    from zk_evm_tpu.witness import asm_parser as ap, assembler as asmblr
    from zk_evm_tpu.witness.interpreter import Interpreter
    consts, opcodes, _ = asmblr.load_tables()
    k = asmblr.assemble([ap.parse(SRC)], consts, opcodes)
    interp = Interpreter(k, initial_offset=k.global_labels["stack_test"])
    interp.run()
    assert interp.stack() == []
    return interp


def test_flag_for():
    assert cpu.flag_for(0x01, False) == "binary_op"
    assert cpu.flag_for(0x0f, True) == "ternary_op"
    assert cpu.flag_for(0x0f, False) is None      # SUBMOD kernel-only
    assert cpu.flag_for(0x21, False) is None      # KECCAK_GENERAL
    assert cpu.flag_for(0x5b, False) == "jumpdest_keccak_general"
    assert cpu.flag_for(0x9f, False) == "dup_swap"
    assert cpu.flag_for(0xa0, False) is None
    assert cpu.flag_for(0xdf, True) == "m_op_32bytes"


def test_host_gas():
    assert cpu.host_gas(0x01, "binary_op") == 3      # ADD
    assert cpu.host_gas(0x02, "binary_op") == 5      # MUL
    assert cpu.host_gas(0x08, "ternary_op") == 8     # ADDMOD
    assert cpu.host_gas(0x0f, "ternary_op") == 0     # SUBMOD (kernel)
    assert cpu.host_gas(0x56, "jumps") == 8          # JUMP
    assert cpu.host_gas(0x57, "jumps") == 10         # JUMPI
    assert cpu.host_gas(0x19, "not_pop") == 3        # NOT
    assert cpu.host_gas(0x50, "not_pop") == 2        # POP
    assert cpu.host_gas(0x5b, "jumpdest_keccak_general") == 1
    assert cpu.host_gas(0x60, "push_prover_input") == 3
    assert cpu.host_gas(0xee, "push_prover_input") == 0
    assert cpu.host_gas(0xf9, "exit_kernel") is None


def test_custom_program_constraints_and_negatives():
    interp = _run_custom()
    trace, stark = cpu.cpu_rows_from_run(interp)
    check_constraints(stark, trace)

    def tampered():
        t, s = cpu.cpu_rows_from_run(interp)
        return t, s

    # claim the ADD row is a jump
    t, s = tampered()
    add_row = int(np.nonzero(t[cc.OP["binary_op"]])[0][0])
    t[cc.OP["jumps"], add_row] = 1
    t[cc.OP["binary_op"], add_row] = 0
    with pytest.raises(AssertionError):
        check_constraints(s, t)
    # drop the second-operand stack read of the ADD
    t, s = tampered()
    t[cc.MEM_CHANNELS[1].used, add_row] = 0
    with pytest.raises(AssertionError):
        check_constraints(s, t)
    # lie about the read address
    t, s = tampered()
    t[cc.MEM_CHANNELS[1].addr_virtual, add_row] += 3
    with pytest.raises(AssertionError):
        check_constraints(s, t)
    # drop the old-top write-back of a push onto a non-empty stack
    t, s = tampered()
    push_rows = np.nonzero(t[cc.PARTIAL_CHANNEL.used])[0]
    t[cc.PARTIAL_CHANNEL.used, int(push_rows[0])] = 0
    with pytest.raises(AssertionError):
        check_constraints(s, t)
    # wrong stack length after a pop
    t, s = tampered()
    pop_row = int(np.nonzero(t[cc.OP["not_pop"]])[0][-1])  # the POP
    t[cc.STACK_LEN, pop_row + 1] += 1
    with pytest.raises(AssertionError):
        check_constraints(s, t)
    # lie about which slot a DUP reads
    t, s = tampered()
    dup_row = int(np.nonzero(t[cc.OP["dup_swap"]])[0][0])
    t[cc.MEM_CHANNELS[2].addr_virtual, dup_row] += 1
    with pytest.raises(AssertionError):
        check_constraints(s, t)
    # forge the dup'd value (must equal the next top)
    t, s = tampered()
    t[cc.MEM_CHANNELS[2].value[0], dup_row] += 1
    with pytest.raises(AssertionError):
        check_constraints(s, t)
    # broken clock
    t, s = tampered()
    t[cc.CLOCK, 5] = 99
    with pytest.raises(AssertionError):
        check_constraints(s, t)
    # halt rows must sit at the halt label
    t, s = tampered()
    t[cc.PROGRAM_COUNTER, trace.shape[1] - 1] += 1
    with pytest.raises(AssertionError):
        check_constraints(s, t)


EXP_HARNESS = """
GLOBAL exp_harness:
    PUSH ret_exp
    PUSH 3
    PUSH 7
    %jump(exp)
GLOBAL ret_exp:
    POP
    PUSH 0xdeadbeef
    JUMP
"""


def test_exp_kernel_run_constraints():
    """A real kernel execution (harness calling the exp routine, 70
    steps incl. 8 jumps and 18 DUP/SWAPs) satisfies every implemented
    CPU constraint with its recorded channel witness."""
    from zk_evm_tpu.witness import assembler as asmblr
    from zk_evm_tpu.witness.interpreter import Interpreter
    k = asmblr.combined_kernel(extra_sources=[EXP_HARNESS])
    interp = Interpreter(k,
                         initial_offset=k.global_labels["exp_harness"])
    interp.run()
    assert interp.stack() == []
    trace, stark = cpu.cpu_rows_from_run(interp)
    check_constraints(stark, trace)
    # tampering with a recorded native pc is caught
    rows = np.nonzero(trace[cc.OP["dup_swap"]])[0]
    trace[cc.PROGRAM_COUNTER, int(rows[0])] += 1
    with pytest.raises(AssertionError):
        check_constraints(stark, trace)
    # a JUMPI that jumps despite a zero condition is caught
    trace, stark = cpu.cpu_rows_from_run(interp)
    jrows = np.nonzero(trace[cc.OP["jumps"]])[0]
    r = int(jrows[0])
    trace[cc.JUMPS_SHOULD_JUMP, r] ^= 1
    with pytest.raises(AssertionError):
        check_constraints(stark, trace)


def test_user_mode_exit_kernel_and_syscall():
    """Hand-built user-mode segment: EXIT_KERNEL into user code, a
    syscall back; overflow aux + push write-backs filled by the
    builder."""
    # EXIT_KERNEL's kexit_info=7 encodes (pc=7, user mode, gas 0)
    ops = [
        (0xf9, True, "exit_kernel", 0, (7,)),
        (0x60, False, "push_prover_input", 7, ()),
        (0x60, False, "push_prover_input", 9, (5,)),
        (0x01, False, "binary_op", 11, (5, 3)),
        (0x50, False, "not_pop", 12, (8,)),
        (0x60, False, "push_prover_input", 13, ()),
        (0x56, False, "jumps", 15, (99,)),
    ]
    trace = cpu.build_cpu_rows(ops, n_rows=16, halt_pc=99)
    stark = cpu.CpuStark(start_pc=0, halt_pc=99)
    check_constraints(stark, trace)
    # kernel-only EXIT_KERNEL flagged in user mode is caught
    t = cpu.build_cpu_rows(ops, n_rows=16, halt_pc=77)
    t[cc.IS_KERNEL_MODE, 0] = 0
    with pytest.raises(AssertionError):
        check_constraints(stark, t)


EQ_SRC = """
GLOBAL eq_test:
    PUSH 5
    PUSH 5
    EQ
    ISZERO
    POP
    PUSH 9
    PUSH 5
    EQ
    POP
    PUSH 0
    ISZERO
    POP
    PUSH 0xdeadbeef
    JUMP
"""


def test_eq_iszero():
    from zk_evm_tpu.witness import asm_parser as ap, assembler as asmblr
    from zk_evm_tpu.witness.interpreter import Interpreter
    consts, opcodes, _ = asmblr.load_tables()
    k = asmblr.assemble([ap.parse(EQ_SRC)], consts, opcodes)
    interp = Interpreter(k, initial_offset=k.global_labels["eq_test"])
    interp.run()
    assert interp.stack() == []
    trace, stark = cpu.cpu_rows_from_run(interp)
    check_constraints(stark, trace)
    # forged EQ result (flipping the pushed bit) is caught
    rows = np.nonzero(trace[cc.OP["eq_iszero"]])[0]
    trace[cc.MEM_CHANNELS[0].value[0], int(rows[0]) + 1] ^= 1
    with pytest.raises(AssertionError):
        check_constraints(stark, trace)


def test_shift():
    from zk_evm_tpu.witness import asm_parser as ap, assembler as asmblr
    from zk_evm_tpu.witness.interpreter import Interpreter
    consts, opcodes, _ = asmblr.load_tables()
    src = """
GLOBAL shift_test:
    PUSH 3
    PUSH 4
    SHL
    POP
    PUSH 100
    PUSH 300
    SHR
    POP
    PUSH 0xdeadbeef
    JUMP
"""
    k = asmblr.assemble([ap.parse(src)], consts, opcodes)
    interp = Interpreter(k, initial_offset=k.global_labels["shift_test"])
    interp.run()
    assert interp.stack() == []
    trace, stark = cpu.cpu_rows_from_run(interp)
    check_constraints(stark, trace)
    # claiming a small displacement without the table read is caught
    rows = np.nonzero(trace[cc.OP["shift"]])[0]
    trace[cc.MEM_CHANNELS[2].used, int(rows[0])] = 0
    with pytest.raises(AssertionError):
        check_constraints(stark, trace)


def test_memio():
    from zk_evm_tpu.witness import asm_parser as ap, assembler as asmblr
    from zk_evm_tpu.witness.interpreter import Interpreter
    consts, opcodes, _ = asmblr.load_tables()
    src = """
GLOBAL mem_test:
    PUSH 0x70000000005
    PUSH 42
    MSTORE_GENERAL
    PUSH 0x70000000005
    MLOAD_GENERAL
    POP
    PUSH 0xdeadbeef
    JUMP
"""
    k = asmblr.assemble([ap.parse(src)], consts, opcodes)
    interp = Interpreter(k, initial_offset=k.global_labels["mem_test"])
    interp.run()
    assert interp.stack() == []
    trace, stark = cpu.cpu_rows_from_run(interp)
    check_constraints(stark, trace)
    rows = np.nonzero(trace[cc.OP["m_op_general"]])[0]
    mload = [r for r in rows if trace[cc.OPCODE_BITS[0], r] == 1][0]
    mstore = [r for r in rows if trace[cc.OPCODE_BITS[0], r] == 0][0]
    # forged loaded value is caught
    t, s = cpu.cpu_rows_from_run(interp)
    t[cc.MEM_CHANNELS[1].value[0], int(mload)] ^= 1
    with pytest.raises(AssertionError):
        check_constraints(s, t)
    # a store that skips its partial-channel write is caught
    t, s = cpu.cpu_rows_from_run(interp)
    t[cc.PARTIAL_CHANNEL.used, int(mstore)] = 0
    with pytest.raises(AssertionError):
        check_constraints(s, t)
    # lying about the store address is caught
    t, s = cpu.cpu_rows_from_run(interp)
    t[cc.PARTIAL_CHANNEL.addr_virtual, int(mstore)] += 1
    with pytest.raises(AssertionError):
        check_constraints(s, t)


def test_contextops():
    """GET/SET_CONTEXT across a real context switch: the old top is
    written back on GET, the new context's top is read back on SET."""
    from zk_evm_tpu.witness import asm_parser as ap, assembler as asmblr
    from zk_evm_tpu.witness.interpreter import Interpreter
    consts, opcodes, _ = asmblr.load_tables()
    src = """
GLOBAL ctx_test:
    PUSH 42
    GET_CONTEXT
    POP
    PUSH 0x10000000000000000
    SET_CONTEXT
    PUSH 0
    SET_CONTEXT
    POP
    PUSH 0xdeadbeef
    JUMP
"""
    k = asmblr.assemble([ap.parse(src)], consts, opcodes)
    interp = Interpreter(k, initial_offset=k.global_labels["ctx_test"])
    interp.run()
    assert interp.stack() == []
    assert {t[3] for t in interp.trace} == {0, 1}
    trace, stark = cpu.cpu_rows_from_run(interp)
    check_constraints(stark, trace)
    rows = np.nonzero(trace[cc.OP["context_op"]])[0]
    set_rows = [r for r in rows if trace[cc.OPCODE_BITS[0], r] == 1]
    # lying about the restored context is caught
    t, s = cpu.cpu_rows_from_run(interp)
    t[cc.CONTEXT, int(set_rows[0]) + 1] += 1
    with pytest.raises(AssertionError):
        check_constraints(s, t)
    # skipping the cross-context new-top read is caught
    t, s = cpu.cpu_rows_from_run(interp)
    t[cc.MEM_CHANNELS[2].used, int(set_rows[1])] = 0
    with pytest.raises(AssertionError):
        check_constraints(s, t)
    # a non-context op may not change the context
    t, s = cpu.cpu_rows_from_run(interp)
    t[cc.CONTEXT, 1] += 1
    with pytest.raises(AssertionError):
        check_constraints(s, t)


def test_byte_unpacking_and_pc_push0():
    from zk_evm_tpu.witness import asm_parser as ap, assembler as asmblr
    from zk_evm_tpu.witness.interpreter import Interpreter
    consts, opcodes, _ = asmblr.load_tables()
    src = """
GLOBAL bp_test:
    PUSH 0x11223344
    PUSH 0x70000000010
    MSTORE_32BYTES_4
    POP
    PUSH 0xdeadbeef
    JUMP
"""
    k = asmblr.assemble([ap.parse(src)], consts, opcodes)
    interp = Interpreter(k, initial_offset=k.global_labels["bp_test"])
    interp.run()
    trace, stark = cpu.cpu_rows_from_run(interp)
    check_constraints(stark, trace)
    # the pushed address must advance by the store length
    r = int(np.nonzero(trace[cc.OP["m_op_32bytes"]])[0][0])
    trace[cc.MEM_CHANNELS[0].value[0], r + 1] += 1
    with pytest.raises(AssertionError):
        check_constraints(stark, trace)
    # PC/PUSH0 (synthetic: the kernel never uses them natively)
    ops = [
        (0x5b, True, None, 5, ()),
        (0x58, True, None, 6, ()),        # PC -> pushes 6
        (0x50, True, None, 7, (6,)),
        (0x5f, True, None, 8, ()),        # PUSH0 -> pushes 0
        (0x50, True, None, 9, (0,)),
    ]
    t = cpu.build_cpu_rows(ops, n_rows=8, halt_pc=10)
    s = cpu.CpuStark(start_pc=5, halt_pc=10)
    check_constraints(s, t)
    t[cc.MEM_CHANNELS[0].value[0], 2] = 7   # claim PC pushed 7
    with pytest.raises(AssertionError):
        check_constraints(s, t)


def test_cpu_proof_roundtrip():
    interp = _run_custom()
    trace, stark = cpu.cpu_rows_from_run(interp)
    cfg = _cfg()
    proof = prove_stark(stark, trace, cfg, Challenger())
    verify_stark(stark, proof, cfg, Challenger())
