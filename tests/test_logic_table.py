"""Logic table: trace generation, host constraint check, full STARK
roundtrip."""

import numpy as np
import pytest

from zk_evm_tpu.challenger import Challenger
from zk_evm_tpu.stark import StarkConfig, FriConfig, prove_stark, verify_stark
from zk_evm_tpu.tables import logic
from zk_evm_tpu.tables.logic import LogicStark

rng = np.random.default_rng(11)


def rand_u256():
    return int.from_bytes(rng.bytes(32), "little")


OPS = [(op, rand_u256(), rand_u256())
       for op in ("and", "or", "xor") for _ in range(2)]


def test_trace_semantics():
    trace = logic.generate_trace(OPS)
    assert trace.shape[0] == logic.NUM_COLUMNS
    logic.check_trace(trace)
    # result limbs really are the bitwise ops
    op, x, y = OPS[0]
    res = x & y
    got = sum(int(trace[logic.RESULT + j, 0]) << (32 * j) for j in range(8))
    assert got == res


def test_logic_stark_roundtrip():
    trace = logic.generate_trace(OPS)  # 8 rows
    cfg = StarkConfig(
        security_bits=1,
        fri_config=FriConfig(rate_bits=1, cap_height=2,
                             proof_of_work_bits=0, num_query_rounds=2,
                             arity_bits=1, final_poly_bits=2))
    proof = prove_stark(LogicStark(), trace, cfg, Challenger())
    verify_stark(LogicStark(), proof, cfg, Challenger())


def test_logic_stark_rejects_bad_result():
    trace = logic.generate_trace(OPS)
    trace[logic.RESULT, 0] = (int(trace[logic.RESULT, 0]) ^ 1)
    cfg = StarkConfig(
        security_bits=1,
        fri_config=FriConfig(rate_bits=1, cap_height=2,
                             proof_of_work_bits=0, num_query_rounds=2,
                             arity_bits=1, final_poly_bits=2))
    proof = prove_stark(LogicStark(), trace, cfg, Challenger())
    with pytest.raises(AssertionError):
        verify_stark(LogicStark(), proof, cfg, Challenger())
