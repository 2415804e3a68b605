"""Arithmetic table: trace semantics, row-wise constraint check, and a
full-size STARK roundtrip (2^16 rows, the reference's minimum degree)."""

import numpy as np
import pytest

from zk_evm_tpu.challenger import Challenger
from zk_evm_tpu.field import host
from zk_evm_tpu.stark import StarkConfig, FriConfig, prove_stark, verify_stark
from zk_evm_tpu.stark.debug import check_constraints
from zk_evm_tpu.tables import arithmetic as ar

P = host.P
rng = np.random.default_rng(31)


def rand_u256():
    return int.from_bytes(rng.bytes(32), "little")


def all_ops():
    a, b = rand_u256(), rand_u256()
    small = int(rng.integers(1, 1 << 63))
    return [
        ar.Op("add", a, b), ar.Op("sub", a, b), ar.Op("mul", a, b),
        ar.Op("lt", a, b), ar.Op("gt", a, b), ar.Op("lt", a, a),
        ar.Op("div", a, small), ar.Op("div", a, 0),
        ar.Op("mod", a, small), ar.Op("mod", a, 0),
        ar.Op("byte", 3, b), ar.Op("byte", 31, b), ar.Op("byte", 77, b),
        ar.Op("shl", 5, b), ar.Op("shl", 300, b),
        ar.Op("shr", 13, b), ar.Op("shr", 256, b),
        ar.Op("addmod", a, b, small), ar.Op("mulmod", a, b, small),
        ar.Op("submod", 3, 5, small),
        ar.Op("addmod", a, b, 0), ar.Op("mulmod", a, b, 1),
        ar.Op("addfp254", a % ar.BN_BASE, b % ar.BN_BASE),
        ar.Op("mulfp254", a % ar.BN_BASE, b % ar.BN_BASE),
        ar.Op("subfp254", 3, 5),
        ar.Op("range_check", a & 0xFFFF, 0, 0, opcode=0x01, result=0),
    ]


def test_trace_results():
    ops = all_ops()
    trace = ar.generate_trace(ops, min_rows=ar.RANGE_MAX)
    assert trace.shape[0] == ar.NUM_COLUMNS
    # spot-check op results stored in OUTPUT_REGISTER
    r = 0
    for op in ops:
        rows = ar.op_to_rows(op)
        if op.kind != "range_check":
            want = (ar.binary_result(op.kind, op.in0, op.in1)
                    if op.kind in ar.BINARY_FLAG
                    else ar.ternary_result(op.kind, op.in0, op.in1, op.in2))
            got = sum(int(trace[c, r]) << (16 * i)
                      for i, c in enumerate(ar.OUTPUT_REGISTER))
            assert got == want, op.kind
        r += len(rows)


def test_row_constraints():
    ops = all_ops()
    trace = ar.generate_trace(ops, min_rows=ar.RANGE_MAX)
    n_op_rows = sum(len(ar.op_to_rows(op)) for op in ops)
    rows = list(range(n_op_rows + 2)) + [ar.RANGE_MAX - 1]
    check_constraints(ar.ArithmeticStark(), trace, rows=rows)


def test_row_constraints_catch_bad_trace():
    trace = ar.generate_trace([ar.Op("add", 5, 7)], min_rows=ar.RANGE_MAX)
    trace[ar.OUTPUT_REGISTER[0], 0] = 13  # 5+7 != 13
    with pytest.raises(AssertionError):
        check_constraints(ar.ArithmeticStark(), trace, rows=[0])


def test_arithmetic_stark_roundtrip_small_range():
    """Cheap proving smoke test: shrunken range-check table with matching
    small operands (full-size roundtrip is env-gated below; full op
    semantics are covered by the row-constraint tests)."""
    rmax = 1 << 10
    ops = [
        ar.Op("add", 5, 7), ar.Op("sub", 1000, 900),
        ar.Op("mul", 3, 4), ar.Op("gt", 2, 9), ar.Op("lt", 5, 3),
        ar.Op("shl", 2, 5),
        ar.Op("range_check", 123, 45, 6, opcode=0x01, result=0),
    ]
    trace = ar.generate_trace(ops, min_rows=rmax, range_max=rmax)
    cfg = StarkConfig(
        security_bits=1,
        fri_config=FriConfig(rate_bits=1, cap_height=2,
                             proof_of_work_bits=0, num_query_rounds=1,
                             arity_bits=4, final_poly_bits=4))
    stark = ar.ArithmeticStark(range_max=rmax)
    proof = prove_stark(stark, trace, cfg, Challenger())
    verify_stark(stark, proof, cfg, Challenger())


@pytest.mark.skipif("ZK_SLOW" not in __import__("os").environ,
                    reason="full-size (2^16-row) proof; set ZK_SLOW=1")
def test_arithmetic_stark_roundtrip_full():
    ops = all_ops()
    trace = ar.generate_trace(ops, min_rows=ar.RANGE_MAX)
    cfg = StarkConfig(
        security_bits=1,
        fri_config=FriConfig(rate_bits=1, cap_height=4,
                             proof_of_work_bits=0, num_query_rounds=1,
                             arity_bits=4, final_poly_bits=5))
    proof = prove_stark(ar.ArithmeticStark(), trace, cfg, Challenger())
    verify_stark(ar.ArithmeticStark(), proof, cfg, Challenger())
