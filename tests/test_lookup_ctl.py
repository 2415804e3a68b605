"""logUp in-table lookups and cross-table lookups, end to end."""

import numpy as np
import pytest

from zk_evm_tpu.field import host
from zk_evm_tpu.challenger import Challenger
from zk_evm_tpu.stark import (
    Stark, StarkConfig, FriConfig, Lookup, Filter, CtlView,
    CrossTableLookup, prove_stark, verify_stark, prove_all, verify_all,
)

P = host.P
rng = np.random.default_rng(21)


def _cfg():
    return StarkConfig(
        security_bits=1,
        fri_config=FriConfig(rate_bits=1, cap_height=2,
                             proof_of_work_bits=0, num_query_rounds=2,
                             arity_bits=2, final_poly_bits=2))


# ---------------------------------------------------------------------------
# In-table range check via logUp
# ---------------------------------------------------------------------------

class RangeStark(Stark):
    """Columns: V0, V1 (looked-up values), T (counter 0..n-1), F (freqs).
    V0/V1 must be in [0, n)."""
    name = "range"
    num_columns = 4

    def eval(self, frame, cc):
        t = frame.local[2]
        t_next = frame.next[2]
        cc.constraint_first_row(t)
        cc.constraint_transition(t_next - t - 1)

    def lookups(self):
        return [Lookup(looking_columns=(0, 1), table_column=2,
                       frequencies_column=3)]


def range_trace(n, bad_value=None):
    tr = np.zeros((4, n), dtype=np.uint64)
    vals = rng.integers(0, n, size=(2, n), dtype=np.uint64)
    if bad_value is not None:
        vals[0, 3] = bad_value
    tr[0] = vals[0]
    tr[1] = vals[1]
    tr[2] = np.arange(n, dtype=np.uint64)
    freqs = np.zeros(n, dtype=np.uint64)
    for v in vals.ravel():
        if v < n:
            freqs[v] += 1
    tr[3] = freqs
    return tr


def test_range_check_roundtrip():
    cfg = _cfg()
    trace = range_trace(32)
    proof = prove_stark(RangeStark(), trace, cfg, Challenger())
    verify_stark(RangeStark(), proof, cfg, Challenger())


def test_range_check_rejects_out_of_range():
    cfg = _cfg()
    trace = range_trace(32, bad_value=77)  # 77 >= 32: not in table
    proof = prove_stark(RangeStark(), trace, cfg, Challenger())
    with pytest.raises(AssertionError):
        verify_stark(RangeStark(), proof, cfg, Challenger())


# ---------------------------------------------------------------------------
# Cross-table lookup between two toy tables
# ---------------------------------------------------------------------------

class SenderStark(Stark):
    """Columns: x, y, flag. Rows with flag=1 dispatch (x, y)."""
    name = "sender"
    num_columns = 3

    def eval(self, frame, cc):
        f = frame.local[2]
        cc.constraint(f * f - f)


class WorkerStark(Stark):
    """Columns: x, y, filt, prod. Receives (x, y); checks prod = x*y."""
    name = "worker"
    num_columns = 4

    def eval(self, frame, cc):
        f = frame.local[2]
        cc.constraint(f * f - f)
        cc.constraint(f * (frame.local[3] - frame.local[0] * frame.local[1]))


CTLS = [CrossTableLookup(
    name="sender->worker",
    looking=(CtlView(table=0, columns=(0, 1), filter=Filter(column=2)),),
    looked=CtlView(table=1, columns=(0, 1), filter=Filter(column=2)))]


def make_traces(n=16, tamper=False):
    pairs = [(int(rng.integers(1, 1000)), int(rng.integers(1, 1000)))
             for _ in range(5)]
    s = np.zeros((3, n), dtype=np.uint64)
    for i, (x, y) in enumerate(pairs):
        s[0, 2 * i] = x
        s[1, 2 * i] = y
        s[2, 2 * i] = 1
    w = np.zeros((4, n), dtype=np.uint64)
    order = rng.permutation(len(pairs))
    for r, i in enumerate(order):
        x, y = pairs[i]
        w[0, r] = x
        w[1, r] = y
        w[2, r] = 1
        w[3, r] = (x * y) % P
    if tamper:
        w[0, 0] = (int(w[0, 0]) + 1) % P
        w[3, 0] = (int(w[1, 0]) * int(w[0, 0])) % P
    return [s, w]


def test_ctl_roundtrip():
    cfg = _cfg()
    starks = [SenderStark(), WorkerStark()]
    proof = prove_all(starks, make_traces(), CTLS, cfg,
                      public_inputs=[7, 8, 9])
    verify_all(starks, proof, CTLS, cfg)


def test_ctl_rejects_mismatched_multiset():
    cfg = _cfg()
    starks = [SenderStark(), WorkerStark()]
    proof = prove_all(starks, make_traces(tamper=True), CTLS, cfg)
    with pytest.raises(AssertionError):
        verify_all(starks, proof, CTLS, cfg)


def test_ctl_extra_looking_sum():
    """Inject an extra looking contribution (the memory-table mechanism:
    verifier-computed public-value rows, verifier.rs:319)."""
    cfg = _cfg()
    starks = [SenderStark(), WorkerStark()]
    traces = make_traces()
    # worker gets one extra row not sent by sender
    w = traces[1]
    x, y = 123, 456
    w[0, 7], w[1, 7], w[2, 7], w[3, 7] = x, y, 1, (x * y) % P
    proof = prove_all(starks, traces, CTLS, cfg)
    # without the extra sum the CTL is unbalanced
    with pytest.raises(AssertionError):
        verify_all(starks, proof, CTLS, cfg)
    # the verifier recomputes the extra row's contribution per challenge
    challenger = Challenger()
    from zk_evm_tpu.stark.multi import observe_global, _zero_cap
    caps = [p.trace_cap for p in proof.proofs]
    observe_global(challenger, caps, proof.public_inputs)
    from zk_evm_tpu.stark import lookup as lk
    chs = lk.get_challenge_set(challenger, cfg.num_challenges)
    extra = []
    for beta, gamma in chs.pairs:
        combined = host.fadd(x, host.fmul(gamma, y))
        extra.append(host.finv(host.fadd(beta, combined)))
    verify_all(starks, proof, CTLS, cfg,
               extra_looking_sums={0: extra})
