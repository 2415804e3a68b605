"""Chunked (zk-continuation) wrap tapes: split semantics, boundary
liveness, CTL balance across chunk tables, boundary-cap chaining, and a
prove/verify roundtrip."""

import numpy as np
import pytest

from tests.test_rvm import sample_tape, _cfg
from zk_evm_tpu.field import host
from zk_evm_tpu.recursion import continuation as ct
from zk_evm_tpu.recursion import ram, vm
from zk_evm_tpu.stark.debug import check_constraints
from zk_evm_tpu.stark import lookup as lk


def _chunks(rows_log=4):
    t = sample_tape()
    return t, ct.split_tape(t, rows_log)


def test_split_shapes_and_liveness():
    t, chunks = _chunks()
    assert len(chunks) >= 2
    assert chunks[0].before == {}
    assert chunks[-1].after == {}
    total_ops = sum(min(1 << 4, len(t.rows) - c.clk_base)
                    for c in chunks)
    assert total_ops == len(t.rows)
    for a, b in zip(chunks, chunks[1:]):
        assert a.after == b.before          # boundary dictionaries chain
    # every exported cell is genuinely read later
    for k, c in enumerate(chunks[:-1]):
        hi_ts = (c.clk_base + (1 << 4)) * vm.N_SLOTS + vm.N_SLOTS
        later_reads = {o.addr for o in t.ram_ops
                       if o.is_read and o.timestamp > hi_ts}
        assert set(c.after) <= later_reads | set(chunks[k + 1].before)


def test_chunk_constraints_hold():
    _t, chunks = _chunks()
    for c in chunks:
        check_constraints(c.stark, c.rvm_trace,
                          rows=list(range(c.rvm_trace.shape[1])),
                          public_inputs=[v for v in _t.public_inputs])
        check_constraints(ram.RvmMemStark(), c.ram_trace,
                          rows=list(range(c.ram_trace.shape[1])))


def test_chunk_ctl_balance():
    """Without proving: every chunk's RAM CTL (VM channels + MemBefore
    rows vs RAM) and export CTL (RAM exports vs MemAfter) balance under
    random challenges."""
    t, chunks = _chunks()
    beta, gamma = 123456789123, 987654321987
    for c in chunks:
        traces = {
            ct.RVM_T: c.rvm_trace,
            ct.RAM_T: c.ram_trace,
            ct.BEFORE_T: ct.boundary_trace(c.before),
            ct.AFTER_T: ct.boundary_trace(c.after),
        }
        for ctl in ct.chunk_ctls(t.npub, c.clk_base):
            if ctl.name == "rvm_poseidon":
                continue        # covered by the system roundtrip
            looking = 0
            for v in ctl.looking:
                looking = host.fadd(looking, lk.ctl_view_sum_np(
                    traces[v.table], v, beta, gamma))
            looked = lk.ctl_view_sum_np(traces[ctl.looked.table],
                                        ctl.looked, beta, gamma)
            assert looking == looked, \
                f"chunk {c.index}: CTL {ctl.name} unbalanced"


def test_tampered_boundary_breaks_balance():
    t, chunks = _chunks()
    c = next(c for c in chunks if c.before)
    bad_before = dict(c.before)
    k = next(iter(bad_before))
    bad_before[k] = (bad_before[k] + 1) % host.P
    beta, gamma = 55555, 77777
    ctl = ct.chunk_ctls(t.npub, c.clk_base)[0]
    looking = 0
    traces = {ct.RVM_T: c.rvm_trace,
              ct.BEFORE_T: ct.boundary_trace(bad_before)}
    for v in ctl.looking:
        looking = host.fadd(looking, lk.ctl_view_sum_np(
            traces[v.table], v, beta, gamma))
    looked = lk.ctl_view_sum_np(c.ram_trace, ctl.looked, beta, gamma)
    assert looking != looked


@pytest.fixture(scope="module")
def chunked_proof():
    t = sample_tape()
    cfg = _cfg()
    chunks, proven, pub = ct.prove_chunked(t, cfg, rows_log=4)
    return t, cfg, chunks, proven, pub


def test_chunked_prove_verify_roundtrip(chunked_proof):
    t, cfg, chunks, proven, pub = chunked_proof
    assert len(chunks) >= 2
    ct.verify_chunked(chunks, proven, cfg, expected_public_inputs=pub)
    # whole-tape result agrees with the unchunked proof's statement
    assert pub == [v for v in t.public_inputs]


def test_wrap_chunked_chain_in_one_tape(chunked_proof):
    """The ladder's glue: all chunk proofs verify inside ONE tape with
    the boundary-cap chain asserted on proof-data cells (build +
    constraint check; the outer prove is the usual wrap prove)."""
    t, cfg, chunks, proven, pub = chunked_proof
    outer = vm.Tape(npub=len(pub))
    pubs = ct.wrap_chunked_tape(outer, chunks, proven, cfg)
    for k, c in enumerate(pubs):
        outer.bind_public(c, k)
    stark, rvm_trace, ram_trace, pose_ops, opub = outer.finalize()
    assert opub == pub
    step = max(1, rvm_trace.shape[1] // 64)
    check_constraints(stark, rvm_trace,
                      rows=list(range(0, rvm_trace.shape[1], step)),
                      public_inputs=opub)
    check_constraints(ram.RvmMemStark(), ram_trace,
                      rows=list(range(0, ram_trace.shape[1],
                                      max(1, ram_trace.shape[1] // 64))))


def test_chunked_rejects_broken_cap_chain(chunked_proof):
    """A boundary table that disagrees with the proven chunk's exports
    has a different trace cap — the chain check must catch it."""
    t, cfg, chunks, proven, pub = chunked_proof
    donor = next(c for c in chunks if c.before)
    bad = dict(donor.before)
    k = next(iter(bad))
    bad[k] = (bad[k] + 1) % host.P
    from zk_evm_tpu.stark.poly_batch import PolynomialBatch
    from zk_evm_tpu.field import GF
    with pytest.raises(AssertionError):
        b = PolynomialBatch.from_values(
            GF.from_u64(ct.boundary_trace(bad)),
            rate_bits=cfg.rate_bits, cap_height=cfg.cap_height)
        pa = proven[donor.index - 1][1].proofs[ct.AFTER_T]
        assert [list(map(int, d)) for d in pa.trace_cap] == \
            [list(map(int, d)) for d in b.cap_ints()], \
            "MemAfter -> MemBefore boundary cap chain broken"
