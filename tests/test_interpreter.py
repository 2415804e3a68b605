"""Kernel interpreter: real kernel routines vs python ground truth
(mirrors the reference's kernel unit-test pattern, SURVEY.md §4.1)."""

import os

import numpy as np
import pytest

from zk_evm_tpu.witness import asm_parser as ap
from zk_evm_tpu.witness import assembler as asmblr
from zk_evm_tpu.witness.interpreter import (Interpreter, run_kernel,
                                            DEFAULT_HALT_OFFSET)

U256_MASK = (1 << 256) - 1
rng = np.random.default_rng(71)
RET = DEFAULT_HALT_OFFSET

_HAS_REF = os.path.isdir(os.environ.get("ZK_EVM_REFERENCE",
                                        "/root/reference"))
needs_kernel = pytest.mark.skipif(not _HAS_REF,
                                  reason="reference .asm tree not mounted")


def _kernel():
    global _K
    try:
        return _K
    except NameError:
        _K = asmblr.combined_kernel()
        return _K


def rand_u256():
    return int.from_bytes(rng.bytes(32), "little")


def test_snippet_execution():
    consts, opcodes, _ = asmblr.load_tables()
    files = [ap.parse("""
        GLOBAL mul_add:
            // stack: a, b, c, retdest
            MUL ADD
            SWAP1 JUMP
    """)]
    k = asmblr.assemble(files, consts, opcodes)
    out = run_kernel(k, "mul_add", [RET, 10, 7, 3]).stack()
    assert out == [(3 * 7 + 10) & U256_MASK]


@needs_kernel
def test_kernel_exp():
    k = _kernel()
    for a, b in [(rand_u256(), rand_u256()), (0, rand_u256()),
                 (rand_u256(), 0), (2, 300), (3, 5)]:
        out = run_kernel(k, "exp", [RET, b, a]).stack()
        assert out == [pow(a, b, 1 << 256)], (a, b)


LIMB_BASE = 1 << 128


def _write_bignum(interp, loc, value, length):
    from zk_evm_tpu.tables.segments import Segment
    for i in range(length):
        interp.memory.set(0, Segment.KernelGeneral, loc + i,
                          (value >> (128 * i)) % LIMB_BASE)


def _read_bignum(interp, loc, length):
    from zk_evm_tpu.tables.segments import Segment
    return sum(interp.memory.get(0, Segment.KernelGeneral, loc + i)
               << (128 * i) for i in range(length))


@needs_kernel
def test_kernel_add_bignum():
    k = _kernel()
    length = 4
    a = int.from_bytes(rng.bytes(16 * length), "little") >> 1
    b = int.from_bytes(rng.bytes(16 * length), "little") >> 1
    interp = Interpreter(k, k.global_labels["add_bignum"],
                         [RET, 20, 0, length])
    _write_bignum(interp, 0, a, length)
    _write_bignum(interp, 20, b, length)
    interp.run()
    total = a + b
    assert _read_bignum(interp, 0, length) == total % (LIMB_BASE ** length)
    carry = interp.stack()
    assert carry == [total >> (128 * length)]


@needs_kernel
def test_kernel_cmp_and_iszero_bignum():
    k = _kernel()
    length = 3
    a = int.from_bytes(rng.bytes(16 * length), "little")
    b = a + 1
    interp = Interpreter(k, k.global_labels["cmp_bignum"],
                         [RET, 30, 0, length])
    _write_bignum(interp, 0, a, length)
    _write_bignum(interp, 30, b, length)
    out = interp.run().stack()
    assert out == [(1 << 256) - 1]      # a < b  =>  -1

    interp = Interpreter(k, k.global_labels["iszero_bignum"],
                         [RET, 0, length])
    _write_bignum(interp, 0, 0, length)
    assert interp.run().stack() == [1]


@needs_kernel
def test_kernel_keccak_general_via_snippet():
    """KECCAK_GENERAL against the host keccak256 twin, through assembled
    code (address packing semantics included)."""
    consts, opcodes, _ = asmblr.load_tables()
    files = [ap.parse("""
        GLOBAL hash_it:
            // stack: addr, len, retdest
            KECCAK_GENERAL
            SWAP1 JUMP
    """)]
    k = asmblr.assemble(files, consts, opcodes)
    from zk_evm_tpu.tables.segments import Segment
    from zk_evm_tpu.tables.keccak_sponge import keccak256
    data = bytes(range(40))
    interp = Interpreter(k, k.global_labels["hash_it"],
                         [RET, len(data), (Segment.MainMemory << 32) | 5])
    for i, b in enumerate(data):
        interp.memory.set(0, Segment.MainMemory, 5 + i, b)
    out = interp.run().stack()
    assert out == [int.from_bytes(keccak256(data), "big")]
