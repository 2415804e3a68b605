"""End-to-end L2 recursion: a child STARK proof verified INSIDE the
verifier-VM, whose own 3-table proof then verifies — with the child's
public inputs surfaced as the outer proof's public inputs."""

import numpy as np
import pytest

from tests.test_stark import FibStark, fib_trace
from zk_evm_tpu.challenger import Challenger
from zk_evm_tpu.recursion import vm
from zk_evm_tpu.recursion.system import prove_system, verify_system
from zk_evm_tpu.recursion.verify_tape import verify_stark_tape
from zk_evm_tpu.stark import StarkConfig, FriConfig, prove_stark

CHILD_N = 16


def _child_cfg():
    return StarkConfig(
        security_bits=1,
        fri_config=FriConfig(rate_bits=1, cap_height=1,
                             proof_of_work_bits=0, num_query_rounds=2,
                             arity_bits=2, final_poly_bits=2))


def _outer_cfg():
    return StarkConfig(
        security_bits=1,
        fri_config=FriConfig(rate_bits=1, cap_height=2,
                             proof_of_work_bits=0, num_query_rounds=1,
                             arity_bits=2, final_poly_bits=2))


def _child_proof():
    trace, pis = fib_trace(CHILD_N)
    cfg = _child_cfg()
    proof = prove_stark(FibStark(), trace, cfg, Challenger(),
                        public_inputs=pis)
    return proof, pis, cfg


def build_wrap_tape(proof, cfg, npub):
    t = vm.Tape(npub=npub)
    res = verify_stark_tape(t, FibStark(), proof, cfg)
    for k, c in enumerate(res.public_inputs):
        t.bind_public(c, k)
    return t


def test_tape_verifies_child_and_proves():
    proof, pis, cfg = _child_proof()
    t = build_wrap_tape(proof, cfg, npub=len(pis))
    assert t.public_inputs == pis
    # the tape's own 3-table proof roundtrips
    outer_cfg = _outer_cfg()
    starks, outer_proof, pub = prove_system(t, outer_cfg)
    assert pub == pis
    verify_system(starks, outer_proof, outer_cfg,
                  expected_public_inputs=pis)


def test_tape_rejects_corrupted_child_proof():
    proof, pis, cfg = _child_proof()
    # corrupt one opened trace value
    bad = proof
    tl = list(bad.openings.trace_local)
    a, b = tl[0]
    tl[0] = ((a + 1) % (2**64 - 2**32 + 1), b)
    bad.openings.trace_local = tl
    with pytest.raises(AssertionError):
        build_wrap_tape(bad, cfg, npub=len(pis))


def test_tape_rejects_corrupted_merkle_path():
    proof, pis, cfg = _child_proof()
    rnd = proof.fri_proof.query_rounds[0]
    rnd.initial.paths[0][0] = [v ^ 1 for v in rnd.initial.paths[0][0]]
    with pytest.raises(AssertionError):
        build_wrap_tape(proof, cfg, npub=len(pis))


class TinyLookupStark(__import__("zk_evm_tpu.stark",
                                 fromlist=["Stark"]).Stark):
    """3 columns: val, counter, freq — an in-table logUp range check,
    exercising the aux path of the verification tape."""
    name = "tiny_lookup"
    num_columns = 3

    def eval(self, frame, cc):
        lv, nv = frame.local, frame.next
        cc.constraint_first_row(lv[1])
        incr = nv[1] - lv[1]
        cc.constraint_transition(incr * incr - incr)

    def lookups(self):
        from zk_evm_tpu.stark import Lookup
        from zk_evm_tpu.stark.lookup import col
        return [Lookup(looking_columns=(col(0),), table_column=1,
                       frequencies_column=2)]


def _tiny_lookup_proof():
    n = 16
    vals = np.array([3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7, 9, 3],
                    dtype=np.uint64)
    trace = np.zeros((3, n), dtype=np.uint64)
    trace[0] = vals
    trace[1] = np.arange(n, dtype=np.uint64)
    trace[2] = np.bincount(vals.astype(np.int64), minlength=n)[:n]
    cfg = _child_cfg()
    proof = prove_stark(TinyLookupStark(), trace, cfg, Challenger())
    return proof, cfg


def test_tape_wraps_lookup_child():
    """Aux-columns path: a child with an in-table logUp verifies inside
    the VM and the outer proof roundtrips."""
    proof, cfg = _tiny_lookup_proof()
    t = vm.Tape()
    verify_stark_tape(t, TinyLookupStark(), proof, cfg)
    outer_cfg = _outer_cfg()
    starks, outer_proof, pub = prove_system(t, outer_cfg)
    verify_system(starks, outer_proof, outer_cfg)


def test_tape_rejects_corrupted_aux_opening():
    proof, cfg = _tiny_lookup_proof()
    al = list(proof.openings.aux_local)
    a, b = al[0]
    al[0] = ((a + 1) % (2**64 - 2**32 + 1), b)
    proof.openings.aux_local = al
    t = vm.Tape()
    with pytest.raises(AssertionError):
        verify_stark_tape(t, TinyLookupStark(), proof, cfg)


class ToyCtlStark(__import__("zk_evm_tpu.stark",
                             fromlist=["Stark"]).Stark):
    """Columns: val, filter. Used in looking/looked pairs."""
    num_columns = 2

    def __init__(self, name):
        self.name = name

    def eval(self, frame, cc):
        f = frame.local[1]
        cc.constraint(f * (f - 1))

    def requires_ctls(self):
        return True


def _toy_ctl_setup(vals_a=(5, 7, 9), vals_b=(9, 7, 5)):
    from zk_evm_tpu.stark.lookup import CrossTableLookup, CtlView, col
    from zk_evm_tpu.stark import Filter
    import numpy as np

    def trace(vals):
        tr = np.zeros((2, 4), dtype=np.uint64)
        tr[0, :len(vals)] = vals
        tr[1, :len(vals)] = 1
        return tr

    starks = [ToyCtlStark("toy_a"), ToyCtlStark("toy_b")]
    traces = [trace(vals_a), trace(vals_b)]
    ctls = [CrossTableLookup(
        name="toy",
        looking=(CtlView(table=0, columns=(col(0),),
                         filter=Filter(column=1)),),
        looked=CtlView(table=1, columns=(col(0),),
                       filter=Filter(column=1)))]
    return starks, traces, ctls


def test_tape_wraps_all_proof():
    """Multi-table wrap: a 2-table AllProof with a CTL verifies in-tape
    (global transcript, shared challenges, cross-table sum check) and
    the outer proof roundtrips."""
    from zk_evm_tpu.recursion.verify_tape import verify_all_tape
    from zk_evm_tpu.stark import prove_all
    starks, traces, ctls = _toy_ctl_setup()
    cfg = _child_cfg()
    all_proof = prove_all(starks, traces, ctls, cfg,
                          public_inputs=[5, 7, 9])
    t = vm.Tape(npub=3)
    pub_cells, _results = verify_all_tape(t, starks, all_proof, ctls, cfg)
    for k, c in enumerate(pub_cells):
        t.bind_public(c, k)
    outer_cfg = _outer_cfg()
    osk, oproof, opub = prove_system(t, outer_cfg)
    assert opub == [5, 7, 9]
    verify_system(osk, oproof, outer_cfg, expected_public_inputs=opub)


def test_tape_rejects_unbalanced_ctl():
    from zk_evm_tpu.recursion.verify_tape import verify_all_tape
    from zk_evm_tpu.stark import prove_all
    starks, traces, ctls = _toy_ctl_setup(vals_a=(5, 7, 9),
                                          vals_b=(5, 7, 8))
    cfg = _child_cfg()
    all_proof = prove_all(starks, traces, ctls, cfg)
    t = vm.Tape()
    with pytest.raises(AssertionError):
        verify_all_tape(t, starks, all_proof, ctls, cfg)


@pytest.mark.skipif("ZK_SLOW" not in __import__("os").environ,
                    reason="depth-2 recursion; set ZK_SLOW=1")
def test_self_recursion_depth2():
    """Wrap the wrapper: a Fib proof wraps into 3-table proof P1 (whose
    Rvm carries a preprocessed program oracle); a second tape verifies
    P1 entirely — program binding via the constant program cap — and its
    own proof verifies. This is the reference's recursive shrink chain
    shape (fixed_recursive_verifier.rs shrink/aggregate)."""
    from zk_evm_tpu.recursion.verify_tape import verify_all_tape
    from zk_evm_tpu.recursion.system import system_ctls, RVM
    proof, pis, cfg = _child_proof()
    t1 = build_wrap_tape(proof, cfg, npub=len(pis))
    outer_cfg = _outer_cfg()
    starks1, p1, pub1 = prove_system(t1, outer_cfg)

    t2 = vm.Tape(npub=len(pis))
    ctls = system_ctls(starks1[RVM].npub)
    pub_cells, results = verify_all_tape(t2, starks1, p1, ctls, outer_cfg)
    # link the globally-observed publics to the inner Rvm's PUB-bound
    # publics (verify_system's host assert, in-tape)
    for g, r in zip(pub_cells, results[RVM].public_inputs):
        t2.assert_eq(g, r)
    for k, c in enumerate(pub_cells):
        t2.bind_public(c, k)
    starks2, p2, pub2 = prove_system(t2, outer_cfg)
    assert pub2 == pis
    verify_system(starks2, p2, outer_cfg, expected_public_inputs=pis)


@pytest.mark.skipif("ZK_SLOW" not in __import__("os").environ,
                    reason="extra outer prove; set ZK_SLOW=1 "
                           "(the aggregation TAPE itself is covered by "
                           "the broken-chain test below)")
def test_two_child_aggregation():
    """Two child proofs verified in ONE tape — the two-to-one
    aggregation primitive (stark/DESIGN.md L2 step 3; reference
    fixed_recursive_verifier.rs two-to-one block aggregation). The tape
    also asserts a cross-proof statement (chaining: child2 starts where
    child1 ends), the analog of the reference's in-circuit public-value
    chaining checks (:2298-2408)."""
    cfg = _child_cfg()
    trace1, pis1 = fib_trace(CHILD_N, a=1, b=2)
    p1 = prove_stark(FibStark(), trace1, cfg, Challenger(),
                     public_inputs=pis1)
    # child 2 continues the sequence: starts at (x1_end_prev, sum)
    a2, b2 = pis1[2], (pis1[1] + pis1[2]) % (2**64 - 2**32 + 1)
    trace2, pis2 = fib_trace(CHILD_N, a=a2, b=b2)
    p2 = prove_stark(FibStark(), trace2, cfg, Challenger(),
                     public_inputs=pis2)

    t = vm.Tape(npub=4)
    r1 = verify_stark_tape(t, FibStark(), p1, cfg)
    r2 = verify_stark_tape(t, FibStark(), p2, cfg)
    # chaining: child2's first element == child1's last element
    t.assert_eq(r2.public_inputs[0], r1.public_inputs[2])
    t.bind_public(r1.public_inputs[0], 0)
    t.bind_public(r1.public_inputs[1], 1)
    t.bind_public(r2.public_inputs[1], 2)
    t.bind_public(r2.public_inputs[2], 3)

    outer_cfg = _outer_cfg()
    starks, outer_proof, pub = prove_system(t, outer_cfg)
    assert pub == [pis1[0], pis1[1], pis2[1], pis2[2]]
    verify_system(starks, outer_proof, outer_cfg,
                  expected_public_inputs=pub)


def test_two_child_aggregation_rejects_broken_chain():
    cfg = _child_cfg()
    trace1, pis1 = fib_trace(CHILD_N, a=1, b=2)
    p1 = prove_stark(FibStark(), trace1, cfg, Challenger(),
                     public_inputs=pis1)
    trace2, pis2 = fib_trace(CHILD_N, a=123, b=456)   # does NOT chain
    p2 = prove_stark(FibStark(), trace2, cfg, Challenger(),
                     public_inputs=pis2)
    t = vm.Tape()
    r1 = verify_stark_tape(t, FibStark(), p1, cfg)
    r2 = verify_stark_tape(t, FibStark(), p2, cfg)
    with pytest.raises(AssertionError):
        t.assert_eq(r2.public_inputs[0], r1.public_inputs[2])


@pytest.mark.skipif("ZK_SLOW" not in __import__("os").environ,
                    reason="production-table wrap; set ZK_SLOW=1")
def test_tape_wraps_production_table():
    """A real zk_evm table (BytePacking, 103 cols, byte range-check
    logUp) wraps end-to-end: child prove -> tape -> outer 3-table proof
    -> verify."""
    import numpy as np
    from zk_evm_tpu.tables import byte_packing as bp
    from zk_evm_tpu.tables.segments import Segment
    rng = np.random.default_rng(41)
    ops = [bp.BytePackingOp(True, 0, Segment.MainMemory, 100, 7,
                            rng.bytes(32)),
           bp.BytePackingOp(False, 1, Segment.Calldata, 5, 13,
                            rng.bytes(11))]
    trace = bp.generate_trace(ops)
    cfg = _child_cfg()
    proof = prove_stark(bp.BytePackingStark(), trace, cfg, Challenger())
    t = vm.Tape()
    verify_stark_tape(t, bp.BytePackingStark(), proof, cfg)
    outer_cfg = _outer_cfg()
    starks, outer_proof, _pub = prove_system(t, outer_cfg)
    verify_system(starks, outer_proof, outer_cfg)


@pytest.mark.skipif("ZK_SLOW" not in __import__("os").environ,
                    reason="three outer proves; set ZK_SLOW=1")
def test_two_to_one_of_wrap_proofs():
    """The full recursion ladder rung: wrap two Fib proofs separately,
    aggregate the two WRAP proofs two-to-one in a third tape, prove and
    verify it with the combined statement digest as public inputs."""
    from zk_evm_tpu.hash import host_poseidon
    from zk_evm_tpu.recursion.aggregate import two_to_one_tape
    cfg = _child_cfg()
    outer_cfg = _outer_cfg()
    wraps = []
    for a, b in ((1, 2), (5, 11)):
        trace, pis = fib_trace(CHILD_N, a=a, b=b)
        p = prove_stark(FibStark(), trace, cfg, Challenger(),
                        public_inputs=pis)
        tw = vm.Tape(npub=len(pis))
        res = verify_stark_tape(tw, FibStark(), p, cfg)
        for k, c in enumerate(res.public_inputs):
            tw.bind_public(c, k)
        starks, proof, pub = prove_system(tw, outer_cfg)
        wraps.append((starks, proof, pub))

    t = vm.Tape(npub=4)
    digest = two_to_one_tape(t, wraps[0][:2], wraps[1][:2], outer_cfg)
    for k, c in enumerate(digest):
        t.bind_public(c, k)
    starks3, p3, pub3 = prove_system(t, outer_cfg)
    want = host_poseidon.hash_no_pad(
        [int(v) for v in wraps[0][2] + wraps[1][2]])
    assert pub3 == want
    verify_system(starks3, p3, outer_cfg, expected_public_inputs=want)


def test_tape_size_is_shape_deterministic():
    """Two different child proofs of the same shape produce the same
    program (the precondition for a fixed wrap circuit)."""
    p1, pis1, cfg = _child_proof()
    trace2, pis2 = fib_trace(CHILD_N, a=5, b=11)
    p2 = prove_stark(FibStark(), trace2, cfg, Challenger(),
                     public_inputs=pis2)
    t1 = build_wrap_tape(p1, cfg, npub=3)
    t2 = build_wrap_tape(p2, cfg, npub=3)
    s1 = t1.finalize()[0]
    s2 = t2.finalize()[0]
    assert np.array_equal(s1.known, s2.known)
    assert pis1 != pis2
