"""Multi-chip sharding: a FULL single-table proof (trace + aux commit,
constraint eval, quotient, FRI) computed over an 8-device mesh must be
bit-identical to the single-device proof — the transcript-determinism
requirement of SURVEY §2.9 P1 / Appendix A."""

import numpy as np
import jax
import pytest
from jax.sharding import Mesh

from zk_evm_tpu.field import host
from zk_evm_tpu.challenger import Challenger
from zk_evm_tpu.stark import (Stark, StarkConfig, FriConfig, Lookup,
                              prove_stark, verify_stark, col)
from zk_evm_tpu.stark.serialization import proof_to_json


class WideStark(Stark):
    """16 columns: c0 counts rows, c1..c14 are c0*k products, c15 is a
    range-check frequency column over c1 — wide enough to exercise
    batched constraint families plus an in-table logUp lookup."""
    name = "wide"
    num_columns = 16
    num_public_inputs = 0

    def eval(self, frame, cc):
        lv = frame.local
        nv = frame.next
        cc.constraint_first_row(lv[0])
        cc.constraint_transition(nv[0] - lv[0] - 1)
        # col 2 is the lookup's looking column (a permutation of col 1),
        # constrained by the logUp argument rather than algebraically
        for k in range(3, 15):
            cc.constraint(lv[k] - lv[0] * (k + 1))

    def lookups(self):
        return [Lookup(looking_columns=(col(2),), table_column=1,
                       frequencies_column=15)]


def wide_trace(n):
    t = np.zeros((16, n), dtype=np.uint64)
    t[0] = np.arange(n, dtype=np.uint64)
    for k in range(1, 15):
        t[k] = (t[0] * (k + 1)) % np.uint64(host.P)
    # lookup: col 2 is a permutation of col 1's values
    t[2] = t[1][::-1].copy()
    freq = np.zeros(n, dtype=np.uint64)
    vals = {int(v): i for i, v in enumerate(t[1])}
    for v in t[2]:
        freq[vals[int(v)]] += 1
    t[15] = freq
    return t


def _cfg():
    return StarkConfig(
        security_bits=1,
        fri_config=FriConfig(rate_bits=1, cap_height=2,
                             proof_of_work_bits=0, num_query_rounds=2,
                             arity_bits=2, final_poly_bits=2))


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    return Mesh(np.array(devs[:8]), ("rows",))


def test_sharded_proof_bit_identical(mesh):
    trace = wide_trace(1 << 12)
    cfg = _cfg()
    single = prove_stark(WideStark(), trace, cfg, Challenger())
    sharded = prove_stark(WideStark(), trace, cfg, Challenger(),
                          mesh=mesh)
    assert proof_to_json(single) == proof_to_json(sharded)
    verify_stark(WideStark(), sharded, cfg, Challenger())


def test_sharded_commit_cap_identical(mesh):
    from zk_evm_tpu.field import GF
    from zk_evm_tpu.stark.poly_batch import PolynomialBatch
    from zk_evm_tpu.stark.prover import shard_rows
    rng = np.random.default_rng(7)
    trace = rng.integers(0, host.P, (16, 1 << 12), dtype=np.uint64)
    g = GF.from_u64(trace)
    b1 = PolynomialBatch.from_values(g, rate_bits=1, cap_height=2)
    b2 = PolynomialBatch.from_values(shard_rows(g, mesh), rate_bits=1,
                                     cap_height=2)
    assert b1.cap_ints() == b2.cap_ints()
