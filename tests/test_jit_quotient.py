"""The jit (windowed) quotient path — the DEFAULT on real accelerators —
exercised in the default CPU suite (VERDICT r4 #2: round 4 shipped a
windowed path no test touched, and it was wrong on the chip).

Forces ZK_JIT_QUOTIENT=1 with a small ZK_QUOTIENT_WINDOW_LOG and asserts
the windowed proof is BYTE-IDENTICAL to the eager proof and verifies.
Tables chosen to cover the quotient-program surface cheaply:

  * Memory      — in-table logUp lookups + aux columns
  * MemBefore   — CTL-only aux (mem_before group views)
  * Poseidon    — constraint_block folding (the round-4/5 regression
                  class: the stacked fold replaced the serial chain the
                  axon XLA build miscompiled; scripts/bisect_poseidon*)

Keccak (the other block-fold table) is covered on-chip by
scripts/verify_r5_session.py — its 2.4k-column program is too slow to
jit-compile in the default CPU suite.
"""

import os

import numpy as np
import pytest

from zk_evm_tpu.challenger import Challenger
from zk_evm_tpu.stark import StarkConfig, FriConfig, prove_stark, verify_stark
from zk_evm_tpu.stark.serialization import proof_to_json


def _cfg():
    return StarkConfig(
        security_bits=1,
        fri_config=FriConfig(rate_bits=1, cap_height=2,
                             proof_of_work_bits=0, num_query_rounds=2,
                             arity_bits=2, final_poly_bits=2))


@pytest.fixture
def jit_windowed(monkeypatch):
    monkeypatch.setenv("ZK_JIT_QUOTIENT", "1")
    monkeypatch.setenv("ZK_QUOTIENT_WINDOW_LOG", "4")


def _roundtrip_both_ways(stark, trace, monkeypatch, **kw):
    cfg = _cfg()
    monkeypatch.setenv("ZK_JIT_QUOTIENT", "0")
    eager = prove_stark(stark, trace, cfg, Challenger(), **kw)
    monkeypatch.setenv("ZK_JIT_QUOTIENT", "1")
    monkeypatch.setenv("ZK_QUOTIENT_WINDOW_LOG", "4")
    windowed = prove_stark(stark, trace, cfg, Challenger(), **kw)
    assert proof_to_json(windowed) == proof_to_json(eager), \
        "windowed (jit) proof deviates from the eager proof"
    verify_stark(stark, windowed, cfg, Challenger())
    return windowed


def test_memory_windowed_equals_eager(monkeypatch):
    from test_memory_table import sample_ops
    from zk_evm_tpu.tables import memory as mem
    trace, _ = mem.generate_trace(sample_ops())
    _roundtrip_both_ways(mem.MemoryStark(), trace, monkeypatch)


def test_mem_continuation_windowed_equals_eager(monkeypatch):
    from zk_evm_tpu.tables import memory_continuation as mc
    from zk_evm_tpu.tables.segments import Segment
    values = [((0, int(Segment.MainMemory), i), 7 * i + 1)
              for i in range(5)]
    trace = mc.generate_trace(values)
    _roundtrip_both_ways(mc.MemoryContinuationStark(), trace, monkeypatch)


def test_poseidon_windowed_equals_eager(monkeypatch):
    """constraint_block coverage: the regression class that was red on
    the chip in round 4 (stacked fold keeps the jit graph correct)."""
    from zk_evm_tpu.tables import poseidon as po
    op = po.PoseidonSimpleOp(tuple(range(3, 15)))
    trace = po.generate_trace([op])
    _roundtrip_both_ways(po.PoseidonStark(), trace, monkeypatch)


def test_stacked_fold_matches_serial_fold(monkeypatch):
    """StackingConsumer.finalize == sequential ConstraintConsumer folds,
    per challenge, bit-exactly (python-int ground truth)."""
    from zk_evm_tpu.field import GF
    from zk_evm_tpu.stark.stark import (ConstraintConsumer,
                                        StackingConsumer)
    P = (1 << 64) - (1 << 32) + 1
    rng = np.random.default_rng(3)

    def randu(shape):
        lo = rng.integers(0, 2**32, shape, dtype=np.uint64)
        hi = rng.integers(0, 2**32, shape, dtype=np.uint64)
        return ((hi << np.uint64(32)) | lo) % np.uint64(P)

    m = 8
    alphas_np = randu(2)
    zl = GF.from_u64(randu(m))
    pieces = [randu((1, m)), randu((5, m)), randu((1, m)), randu((3, m))]

    def drive(cc):
        cs = [GF.from_u64(p) for p in pieces]
        cc.constraint(cs[0].reshape(-1))
        cc.constraint_block(cs[1])
        cc.constraint_transition(cs[2].reshape(-1))
        cc.constraint_block_transition(cs[3])
        return cc

    mk = lambda cls: cls(
        alphas=[GF.from_u64(a).reshape(()) for a in alphas_np],
        zero=GF.zeros((m,)), z_last=zl,
        lagrange_first=GF.zeros((m,)), lagrange_last=GF.zeros((m,)))
    serial = drive(mk(ConstraintConsumer))
    stacked = drive(mk(StackingConsumer))
    stacked.finalize()
    for a, b in zip(serial.accs, stacked.accs):
        assert np.array_equal(np.asarray(a.to_u64()),
                              np.asarray(b.to_u64()))
