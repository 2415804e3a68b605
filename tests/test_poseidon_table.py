"""Poseidon table: digest twins, row constraints, CTL views, roundtrip."""

import numpy as np
import pytest

from zk_evm_tpu.challenger import Challenger
from zk_evm_tpu.field import host
from zk_evm_tpu.hash import host_poseidon
from zk_evm_tpu.stark import StarkConfig, FriConfig, prove_stark, verify_stark
from zk_evm_tpu.stark.debug import check_constraints
from zk_evm_tpu.tables import poseidon as ps
from zk_evm_tpu.tables.segments import Segment

rng = np.random.default_rng(73)


def _ops():
    simple_inp = tuple(int(x) for x in
                       rng.integers(0, host.P, size=12, dtype=np.uint64))
    data = bytes(rng.integers(0, 256, size=2 * ps.BLOCK_BYTES,
                              dtype=np.uint8))
    return [
        ps.PoseidonSimpleOp(simple_inp),
        ps.PoseidonGeneralOp(context=1, segment=Segment.KernelGeneral,
                             virt=64, timestamp=11, input=data,
                             len=len(data)),
    ]


def test_trace_digest_matches_host():
    ops = _ops()
    trace = ps.generate_trace(ops)
    assert trace.shape[0] == ps.NUM_COLUMNS
    # row 0: simple op
    assert int(trace[ps.IS_SIMPLE_OP, 0]) == 1
    want = ps.digest_of_simple(list(ops[0].input))
    got = [int(trace[ps.DIGEST_COLS[2 * i], 0])
           + (int(trace[ps.DIGEST_COLS[2 * i + 1], 0]) << 32)
           for i in range(4)]
    assert got == want
    # rows 1-2: general op (2 blocks); final digest on row 2
    assert int(trace[ps.IS_FULL_INPUT_BLOCK, 1]) == 1
    assert int(trace[ps.IS_FIRST_ROW_GENERAL_OP, 1]) == 1
    assert int(trace[ps.IS_FINAL_INPUT_LEN[0], 2]) == 1
    want = ps.digest_of_general(ops[1].input)
    got = [int(trace[ps.DIGEST_COLS[2 * i], 2])
           + (int(trace[ps.DIGEST_COLS[2 * i + 1], 2]) << 32)
           for i in range(4)]
    assert got == want
    # capacity chaining: row 2's capacity is row 1's digest
    for i in range(4):
        cap = int(trace[ps.INPUT[ps.RATE + i], 2])
        dig = int(trace[ps.DIGEST_COLS[2 * i], 1]) \
            + (int(trace[ps.DIGEST_COLS[2 * i + 1], 1]) << 32)
        assert cap == dig


def test_row_constraints():
    trace = ps.generate_trace(_ops())
    check_constraints(ps.PoseidonStark(), trace, rows=[0, 1, 2, 3,
                                                       trace.shape[1] - 1])


def test_tampered_round_caught():
    trace = ps.generate_trace(_ops())
    trace[ps.state_col(17, 5), 1] ^= 1
    with pytest.raises(AssertionError):
        check_constraints(ps.PoseidonStark(), trace, rows=[1])


def test_noncanonical_digest_caught():
    trace = ps.generate_trace(_ops())
    # re-encode digest elem 0 of row 0 as value + P (hi=2^32-1 pattern)
    lo = int(trace[ps.DIGEST_COLS[0], 0])
    hi = int(trace[ps.DIGEST_COLS[1], 0])
    v = lo + (hi << 32)
    vp = v + host.P
    if vp < (1 << 64):
        trace[ps.DIGEST_COLS[0], 0] = vp & 0xFFFFFFFF
        trace[ps.DIGEST_COLS[1], 0] = vp >> 32
        with pytest.raises(AssertionError):
            check_constraints(ps.PoseidonStark(), trace, rows=[0])


def test_memory_ctl_views():
    ops = _ops()
    gen = ops[1]
    trace = ps.generate_trace(ops)
    filt = ps.ctl_looking_memory_filter().eval_np(trace)
    # simple row filtered out; both general rows in; padding out
    assert filt[0] == 0 and filt[1] == 1 and filt[2] == 1 and filt[3] == 0
    for i in [0, 1, 7, 8, 55]:
        view = ps.ctl_looking_memory(i)
        vals = [v.eval_np(trace) for v in view]
        for r, base in ((1, 0), (2, ps.BLOCK_BYTES)):
            assert int(vals[0][r]) == 1                       # is_read
            assert int(vals[1][r]) == gen.context
            assert int(vals[2][r]) == gen.segment
            assert int(vals[3][r]) == gen.virt + base + i     # address
            assert int(vals[4][r]) == gen.input[base + i]     # byte value
            assert int(vals[12][r]) == gen.timestamp


def test_looked_views():
    ops = _ops()
    trace = ps.generate_trace(ops)
    simple = ps.ctl_looked_simple_op()
    assert len(simple) == 20
    vals = [int(v.eval_np(trace)[0]) for v in simple]
    assert vals[:12] == [v % host.P for v in ops[0].input]
    out_filter = ps.ctl_looked_general_output_filter().eval_np(trace)
    assert list(out_filter[:4]) == [0, 0, 1, 0]
    in_filter = ps.ctl_looked_general_input_filter().eval_np(trace)
    assert list(in_filter[:4]) == [0, 1, 0, 0]


def test_poseidon_roundtrip():
    trace = ps.generate_trace(_ops())
    cfg = StarkConfig(
        security_bits=1,
        fri_config=FriConfig(rate_bits=1, cap_height=2,
                             proof_of_work_bits=0, num_query_rounds=1,
                             arity_bits=2, final_poly_bits=2))
    proof = prove_stark(ps.PoseidonStark(), trace, cfg, Challenger())
    verify_stark(ps.PoseidonStark(), proof, cfg, Challenger())


def test_vectorized_simple_trace_matches_reference():
    import random
    rng = random.Random(3)
    ops = [ps.PoseidonSimpleOp(tuple(rng.randrange(ps.P)
                                     for _ in range(12)))
           for _ in range(5)]
    assert np.array_equal(ps.generate_trace(ops, min_rows=16),
                          ps.generate_trace_py(ops, min_rows=16))
