"""End-to-end single-table STARK: device prover vs independent host
verifier, on a toy Fibonacci-with-product AIR."""

import numpy as np
import pytest

from zk_evm_tpu.field import host
from zk_evm_tpu.challenger import Challenger
from zk_evm_tpu.stark import (
    Stark, StarkConfig, FriConfig, prove_stark, verify_stark,
)

P = host.P


class FibStark(Stark):
    """Columns: x0, x1, prod = x0*x1.
    transition: x0' = x1, x1' = x0 + x1;
    every row:  prod = x0 * x1;
    first row:  x0 = PI[0], x1 = PI[1];
    last row:   x1 = PI[2]."""
    name = "fib"
    num_columns = 3
    num_public_inputs = 3

    def eval(self, frame, cc):
        x0, x1, prod = frame.local
        n0, n1, _ = frame.next
        pi = frame.public_inputs
        cc.constraint(prod - x0 * x1)
        cc.constraint_transition(n0 - x1)
        cc.constraint_transition(n1 - (x0 + x1))
        cc.constraint_first_row(x0 - pi[0])
        cc.constraint_first_row(x1 - pi[1])
        cc.constraint_last_row(x1 - pi[2])


def fib_trace(n, a=1, b=2):
    rows = np.zeros((3, n), dtype=np.uint64)
    x0, x1 = a, b
    for i in range(n):
        rows[0, i] = x0
        rows[1, i] = x1
        rows[2, i] = host.fmul(x0, x1)
        x0, x1 = x1, host.fadd(x0, x1)
    return rows, [a, b, int(rows[1, n - 1])]


def _cfg(queries=2, pow_bits=0):
    return StarkConfig(
        security_bits=1,
        fri_config=FriConfig(rate_bits=1, cap_height=2,
                             proof_of_work_bits=pow_bits,
                             num_query_rounds=queries,
                             arity_bits=2, final_poly_bits=2))


def test_stark_roundtrip():
    trace, pis = fib_trace(64)
    cfg = _cfg()
    proof = prove_stark(FibStark(), trace, cfg, Challenger(), pis)
    verify_stark(FibStark(), proof, cfg, Challenger())


def test_stark_roundtrip_with_pow():
    trace, pis = fib_trace(32)
    cfg = _cfg(pow_bits=8)
    proof = prove_stark(FibStark(), trace, cfg, Challenger(), pis)
    verify_stark(FibStark(), proof, cfg, Challenger())


def test_stark_rejects_bad_trace():
    trace, pis = fib_trace(64)
    trace[2, 10] = (int(trace[2, 10]) + 1) % P  # break prod constraint
    cfg = _cfg()
    proof = prove_stark(FibStark(), trace, cfg, Challenger(), pis)
    with pytest.raises(AssertionError):
        verify_stark(FibStark(), proof, cfg, Challenger())


def test_stark_rejects_wrong_public_inputs():
    trace, pis = fib_trace(64)
    cfg = _cfg()
    proof = prove_stark(FibStark(), trace, cfg, Challenger(), pis)
    proof.public_inputs[2] = (proof.public_inputs[2] + 1) % P
    with pytest.raises(AssertionError):
        verify_stark(FibStark(), proof, cfg, Challenger())


def test_stark_rejects_tampered_opening():
    trace, pis = fib_trace(64)
    cfg = _cfg()
    proof = prove_stark(FibStark(), trace, cfg, Challenger(), pis)
    a, b = proof.openings.trace_local[0]
    proof.openings.trace_local[0] = ((a + 1) % P, b)
    with pytest.raises(AssertionError):
        verify_stark(FibStark(), proof, cfg, Challenger())
