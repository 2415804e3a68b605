"""Keccak table: permutation correctness, row constraints (scalar path),
and a full roundtrip whose prover runs the vectorized block path —
passing proves the two constraint paths emit identical sequences."""

import numpy as np
import pytest

from zk_evm_tpu.challenger import Challenger
from zk_evm_tpu.stark import StarkConfig, FriConfig, prove_stark, verify_stark
from zk_evm_tpu.stark.debug import check_constraints
from zk_evm_tpu.tables import keccak as kk

rng = np.random.default_rng(51)


def test_keccak_f_known_vector():
    # keccak-f[1600] of the zero state (FIPS-202 reference vector)
    out = kk.keccak_f([0] * 25)
    assert out[0] == 0xF1258F7940E1DDE7
    assert out[1] == 0x84D5CCF933C0478A
    assert out[24] == 0xEAF1FF7B5CECA249


def _inputs(k=2):
    return [([int(x) for x in
              rng.integers(0, 1 << 64, size=25, dtype=np.uint64)], 3 + i)
            for i in range(k)]


def test_trace_consistency():
    inputs = _inputs(1)
    trace = kk.generate_trace(inputs)
    assert trace.shape[0] == kk.NUM_COLUMNS
    # last round's output equals keccak_f of the input
    want = kk.keccak_f(inputs[0][0])
    got = []
    for y in range(5):
        for x in range(5):
            lo_c, hi_c = kk.reg_appp(x, y)
            got.append(int(trace[lo_c, 23]) | (int(trace[hi_c, 23]) << 32))
    assert got == want


def test_row_constraints_scalar():
    trace = kk.generate_trace(_inputs(1))
    rows = list(range(25)) + [126, 127]
    check_constraints(kk.KeccakStark(), trace, rows=rows)


def test_row_constraints_catch_corruption():
    trace = kk.generate_trace(_inputs(1))
    trace[kk.reg_c(2, 7), 5] ^= 1
    with pytest.raises(AssertionError):
        check_constraints(kk.KeccakStark(), trace, rows=[5])


def test_keccak_stark_roundtrip():
    trace = kk.generate_trace(_inputs(2))
    cfg = StarkConfig(
        security_bits=1,
        fri_config=FriConfig(rate_bits=1, cap_height=2,
                             proof_of_work_bits=0, num_query_rounds=1,
                             arity_bits=2, final_poly_bits=2))
    proof = prove_stark(kk.KeccakStark(), trace, cfg, Challenger())
    verify_stark(kk.KeccakStark(), proof, cfg, Challenger())


def test_vectorized_trace_matches_reference():
    import random
    rng = random.Random(5)
    inputs = [([rng.getrandbits(64) for _ in range(25)], 3 + 7 * i)
              for i in range(5)]
    t1 = kk.generate_trace(inputs)
    t2 = kk.generate_trace_py(inputs)
    assert np.array_equal(t1, t2)
