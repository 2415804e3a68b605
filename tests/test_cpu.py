"""CPU table (decode/clock/halt/control-flow): host checks + roundtrip."""

import numpy as np
import pytest

from zk_evm_tpu.challenger import Challenger
from zk_evm_tpu.stark import prove_stark, verify_stark
from zk_evm_tpu.stark.debug import check_constraints
from zk_evm_tpu.tables import cpu
from zk_evm_tpu.tables import cpu_columns as cc
from tests.test_stark import _cfg

START_PC, HALT_PC = 7, 99

# a coherent little program: kernel prologue, EXIT_KERNEL to user code,
# a syscall back, then halt padding
OPS = [
    (0x01, True),            # ADD            (native)
    (0x0f, True),            # SUBMOD         (native, kernel-only)
    (0x21, True),            # KECCAK_GENERAL (native, kernel-only)
    (0xfb, True),            # MLOAD_GENERAL  (native, kernel-only)
    (0xc3, True),            # MSTORE_32BYTES_4
    (0xee, True),            # PROVER_INPUT   (pc+1, same mode)
    (0xf9, True),            # EXIT_KERNEL    -> user mode
    (0x01, False),           # ADD            (native)
    (0x16, False),           # AND            (native)
    (0x60, False),           # PUSH1
    (0x50, False),           # POP            (native)
    (0x58, False),           # PC             (native)
    (0x91, False),           # SWAP2          (native)
    (0x00, False, "syscall"),  # STOP via syscall -> kernel halt path
]


def _trace(n_rows=32):
    return cpu.build_cpu_rows(OPS, n_rows=n_rows, start_pc=START_PC,
                              halt_pc=HALT_PC)


def _stark():
    return cpu.CpuStark(start_pc=START_PC, halt_pc=HALT_PC)


def test_flag_for():
    assert cpu.flag_for(0x01, False) == "binary_op"
    assert cpu.flag_for(0x0f, True) == "ternary_op"
    assert cpu.flag_for(0x0f, False) is None      # SUBMOD kernel-only
    assert cpu.flag_for(0x21, False) is None      # KECCAK_GENERAL
    assert cpu.flag_for(0x5b, False) == "jumpdest_keccak_general"
    assert cpu.flag_for(0x9f, False) == "dup_swap"
    assert cpu.flag_for(0xa0, False) is None
    assert cpu.flag_for(0xdf, True) == "m_op_32bytes"


def test_host_constraints_hold():
    check_constraints(_stark(), _trace())


def test_host_constraints_catch_violations():
    # claim ADD row is a jump
    t = _trace()
    t[cc.OP["jumps"], 0] = 1
    t[cc.OP["binary_op"], 0] = 0
    with pytest.raises(AssertionError):
        check_constraints(_stark(), t)
    # kernel-only op flagged in user mode
    t = _trace()
    t[cc.IS_KERNEL_MODE, 1] = 0
    with pytest.raises(AssertionError):
        check_constraints(_stark(), t)
    # broken clock
    t = _trace()
    t[cc.CLOCK, 5] = 99
    with pytest.raises(AssertionError):
        check_constraints(_stark(), t)
    # halt rows must sit at the halt label
    t = _trace()
    t[cc.PROGRAM_COUNTER, 20] = HALT_PC + 1
    with pytest.raises(AssertionError):
        check_constraints(_stark(), t)
    # un-halting is forbidden
    t = _trace()
    t[cc.OP["binary_op"], 20] = 1
    with pytest.raises(AssertionError):
        check_constraints(_stark(), t)
    # native instructions must advance pc by one
    t = _trace()
    t[cc.PROGRAM_COUNTER, 1] = 55
    with pytest.raises(AssertionError):
        check_constraints(_stark(), t)
    # gas must be charged exactly (ADD costs 3)
    t = _trace()
    t[cc.GAS, 1] = t[cc.GAS, 0] + 5
    with pytest.raises(AssertionError):
        check_constraints(_stark(), t)


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


def test_cpu_proof_roundtrip():
    cfg = _cfg()
    proof = prove_stark(_stark(), _trace(), cfg, Challenger())
    verify_stark(_stark(), proof, cfg, Challenger())


def _kernel_run(label, stack):
    from zk_evm_tpu.witness import assembler as asmblr
    from zk_evm_tpu.witness.interpreter import Interpreter
    k = asmblr.combined_kernel()
    interp = Interpreter(k, initial_offset=k.global_labels[label],
                         initial_stack=stack)
    interp.run()
    return interp


def test_cpu_constraints_on_real_kernel_execution():
    """The recorded instruction stream of a real kernel routine (exp)
    satisfies the CPU decode/control-flow/gas constraints."""
    interp = _kernel_run("exp", [0xDEADBEEF, 3, 7])
    assert interp.stack() == [343]
    trace, stark = cpu.cpu_rows_from_run(interp)
    check_constraints(stark, trace)
    # tampering with the recorded pc of a native row is caught
    import numpy as np
    rows = np.nonzero(trace[cc.OP["dup_swap"]])[0]
    trace[cc.PROGRAM_COUNTER, rows[0]] += 1
    with pytest.raises(AssertionError):
        check_constraints(stark, trace)
