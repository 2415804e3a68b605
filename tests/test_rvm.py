"""Verifier-VM (recursion L2) building blocks: tape semantics, RAM
consistency, Poseidon CTL, known-column program binding, and the
3-table system roundtrip."""

import numpy as np
import pytest

from zk_evm_tpu.field import host
from zk_evm_tpu.hash import host_poseidon
from zk_evm_tpu.recursion import ram, vm, known
from zk_evm_tpu.recursion.system import (RVM, prove_system, verify_system,
                                         system_ctls)
from zk_evm_tpu.stark import StarkConfig, FriConfig
from zk_evm_tpu.stark.debug import check_constraints

P = host.P
rng = np.random.default_rng(11)


def _cfg():
    return StarkConfig(
        security_bits=1,
        fri_config=FriConfig(rate_bits=1, cap_height=2,
                             proof_of_work_bits=0, num_query_rounds=1,
                             arity_bits=2, final_poly_bits=2))


def sample_tape(npub=2):
    t = vm.Tape(npub=npub)
    a = t.load(123456789)
    b = t.load(987654321)
    c = t.mul(a, b)
    d = t.add(c, a)
    assert t.value(d) == (123456789 * 987654321 + 123456789) % P
    # select
    bit = t.load(1)
    t.assert_bool(bit)
    e = t.sel(bit, a, b)
    assert t.value(e) == 123456789
    # a hash
    inputs = [t.load(i + 1) for i in range(12)]
    out = t.pose(inputs)
    want = host_poseidon.permute([i + 1 for i in range(12)])
    assert [t.value(o) for o in out] == want
    t.assert_eq(e, a)
    t.bind_public(d, 0)
    t.bind_public(out[0], 1)
    return t


def test_tape_traces_satisfy_constraints():
    t = sample_tape()
    stark, rvm_trace, ram_trace, pose_ops, pub = t.finalize()
    check_constraints(stark, rvm_trace,
                      rows=list(range(min(40, rvm_trace.shape[1]))),
                      public_inputs=pub)
    check_constraints(ram.RvmMemStark(), ram_trace,
                      rows=list(range(min(80, ram_trace.shape[1]))))


def test_ram_read_write_consistency():
    ops = [ram.RamOp(1, 0, False, 7), ram.RamOp(5, 0, True, 7),
           ram.RamOp(2, 1, False, 9), ram.RamOp(9, 1, True, 9),
           ram.RamOp(12, 1, True, 9)]
    trace = ram.generate_trace(ops)
    check_constraints(ram.RvmMemStark(), trace,
                      rows=list(range(trace.shape[1])))
    # forged read value breaks
    trace2 = trace.copy()
    rows = np.nonzero((trace2[ram.ADDR] == 1)
                      & (trace2[ram.IS_READ] == 1))[0]
    trace2[ram.VALUE, int(rows[0])] = 8
    with pytest.raises(AssertionError):
        check_constraints(ram.RvmMemStark(), trace2,
                          rows=list(range(trace2.shape[1])))


def test_known_column_eval_matches_poly():
    """Barycentric known-column opening == Horner over IFFT coeffs."""
    from zk_evm_tpu.field import np_field
    n = 16
    vals = rng.integers(0, P, size=n, dtype=np.uint64)
    zeta = (int(vals[0]) * 7919 % P, int(vals[1]) * 104729 % P)
    got = known.eval_known_at(vals, zeta)
    # host interpolation via naive Lagrange at a base point sanity:
    # evaluate sum_i v_i * L_i(zeta) with L_i over the subgroup
    g = host.primitive_root_of_unity(4)
    want = (0, 0)
    zn = host.esub(host.eexp(zeta, n), (1, 0))
    for i in range(n):
        gi = host.fexp(g, i)
        denom = host.escalar(host.esub(zeta, (gi, 0)), n % P)
        li = host.emul(zn, host.emul((gi, 0), host.einv(denom)))
        want = host.eadd(want, host.escalar(li, int(vals[i])))
    assert got == want


@pytest.fixture(scope="module")
def system_proof():
    t = sample_tape()
    cfg = _cfg()
    starks, proof, pub = prove_system(t, cfg)
    return starks, proof, pub, cfg


def test_system_roundtrip(system_proof):
    starks, proof, pub, cfg = system_proof
    verify_system(starks, proof, cfg, expected_public_inputs=pub)


def test_system_rejects_wrong_public_inputs(system_proof):
    starks, proof, pub, cfg = system_proof
    bad = list(pub)
    bad[0] = (bad[0] + 1) % P
    with pytest.raises(AssertionError):
        verify_system(starks, proof, cfg, expected_public_inputs=bad)


def test_system_rejects_foreign_program(system_proof):
    """A proof of tape A must not verify against tape B's program."""
    starks1, proof1, pub1, cfg = system_proof
    t2 = vm.Tape(npub=2)
    a = t2.load(5)
    b = t2.mul(a, a)
    t2.bind_public(a, 0)
    t2.bind_public(b, 1)
    starks2, proof2, pub2 = prove_system(t2, cfg)
    # swap the Rvm stark (program) from tape 2 into tape 1's verification
    mixed = [starks2[0], starks1[1], starks1[2]]
    with pytest.raises(AssertionError):
        verify_system(mixed, proof1, cfg)


def test_program_is_shape_deterministic():
    """Rebuilding with different witness values yields the same program."""
    def build(x, y):
        t = vm.Tape(npub=1)
        a = t.load(x)
        b = t.load(y)
        c = t.mul_add(a, b, a)
        bit = t.load(x & 1)
        t.assert_bool(bit)
        d = t.sel(bit, c, a)
        t.bind_public(d, 0)
        return t.finalize()

    s1, tr1, _, _, _ = build(3, 4)
    s2, tr2, _, _, _ = build(1000, 2000)
    assert np.array_equal(s1.known, s2.known)
    assert not np.array_equal(tr1, tr2)
