"""NativeTape (C++ tape core) vs PyTape: bit-identical programs, traces,
RAM traces, liveness and chunk splits on a real verification tape."""

import numpy as np
import pytest

from tests.test_stark import FibStark, fib_trace
from zk_evm_tpu import native
from zk_evm_tpu.challenger import Challenger
from zk_evm_tpu.recursion import continuation as ct
from zk_evm_tpu.recursion import vm
from zk_evm_tpu.recursion.verify_tape import verify_stark_tape
from zk_evm_tpu.stark import StarkConfig, FriConfig, prove_stark

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def _child():
    trace, pis = fib_trace(64)
    cfg = StarkConfig(
        security_bits=1,
        fri_config=FriConfig(rate_bits=1, cap_height=1,
                             proof_of_work_bits=0, num_query_rounds=3,
                             arity_bits=2, final_poly_bits=2))
    return prove_stark(FibStark(), trace, cfg, Challenger(),
                       public_inputs=pis), pis, cfg


def _build(tape, proof, cfg, pis):
    res = verify_stark_tape(tape, FibStark(), proof, cfg)
    for k, c in enumerate(res.public_inputs):
        tape.bind_public(c, k)
    return tape


@pytest.fixture(scope="module")
def both_tapes():
    proof, pis, cfg = _child()
    tp = _build(vm.PyTape(npub=len(pis)), proof, cfg, pis)
    tn = _build(vm.NativeTape(npub=len(pis)), proof, cfg, pis)
    return tp, tn


def test_native_tape_matches_python(both_tapes):
    tp, tn = both_tapes
    assert len(tp.rows) == len(tn.rows)
    assert tp.public_inputs == tn.public_inputs

    sp, trp, rtp, pop, pubp = tp.finalize()
    sn, trn, rtn, pon, pubn = tn.finalize()
    assert pubp == pubn
    assert trp.shape == trn.shape
    assert np.array_equal(trp, trn)
    assert np.array_equal(sp.known, sn.known)
    assert rtp.shape == rtn.shape
    assert np.array_equal(rtp, rtn)
    assert [o.input for o in pop] == [o.input for o in pon]


def test_native_ram_ops_match(both_tapes):
    tp, tn = both_tapes
    ops_p = [(o.timestamp, o.addr, o.is_read, o.value)
             for o in tp.ram_ops]
    ops_n = [(o.timestamp, o.addr, o.is_read, o.value)
             for o in tn.ram_ops]
    assert sorted(ops_p) == sorted(ops_n)


def test_native_split_matches_python(both_tapes):
    tp, tn = both_tapes
    cp = ct.split_tape(tp, 10)
    cn = ct.split_tape(tn, 10)
    assert len(cp) == len(cn) >= 2
    for a, b in zip(cp, cn):
        assert a.clk_base == b.clk_base
        assert np.array_equal(a.rvm_trace, b.rvm_trace)
        assert np.array_equal(a.ram_trace, b.ram_trace)
        assert np.array_equal(a.stark.known, b.stark.known)
        assert a.before == b.before
        assert a.after == b.after
        assert [o.input for o in a.pose_ops] == \
            [o.input for o in b.pose_ops]


def test_native_assert_eq_raises():
    t = vm.NativeTape()
    a, b = t.load(3), t.load(4)
    with pytest.raises(AssertionError):
        t.assert_eq(a, b)


def test_native_rebind_public_raises():
    t = vm.NativeTape(npub=1)
    c = t.load(5)
    t.bind_public(c, 0)
    with pytest.raises(AssertionError):
        t.bind_public(c, 0)
