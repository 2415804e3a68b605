"""Multi-table integration: a keccak-sponge hashing scenario wired through
the full AllStark CTL graph (KeccakSponge <-> Keccak, -> Logic, -> Memory,
MemBefore/MemAfter chaining), with the CPU-side dispatch covered by the
verifier's extra-looking-sums mechanism."""

import numpy as np
import pytest

from zk_evm_tpu.field import host
from zk_evm_tpu.stark import StarkConfig, FriConfig, prove_all, verify_all
from zk_evm_tpu.stark import lookup as lk
from zk_evm_tpu.stark.multi import observe_global, _zero_cap
from zk_evm_tpu.challenger import Challenger
from zk_evm_tpu.tables import all_stark as ast
from zk_evm_tpu.tables import (keccak, keccak_sponge as ks, logic,
                               memory as mem, memory_continuation as mc)
from zk_evm_tpu.tables.segments import Segment

from zk_evm_tpu.tables.scenarios import (build_sponge_scenario,
                                          cpu_side_extra_sums)

INPUT = b"hello"
TS = 2
CTX, SEG, VIRT = 0, Segment.MainMemory, 64


def _cfg():
    return StarkConfig(
        security_bits=1,
        fri_config=FriConfig(rate_bits=1, cap_height=2,
                             proof_of_work_bits=0, num_query_rounds=1,
                             arity_bits=2, final_poly_bits=2))


def _extra_sums(proof, ctls, cfg, sponge_trace):
    """CPU-side contribution to ctl_keccak_sponge, recomputed by the
    verifier from the claimed digest (stand-in for the CPU table)."""
    challenger = Challenger()
    caps = [p.trace_cap if p is not None else _zero_cap(cfg)
            for p in proof.proofs]
    observe_global(challenger, caps, proof.public_inputs)
    chs = lk.get_challenge_set(challenger, cfg.num_challenges)
    sponge_idx = [i for i, c in enumerate(ctls)
                  if c.name == "keccak_sponge"][0]
    extra = []
    for beta, gamma in chs.pairs:
        extra.append(lk.ctl_view_sum_np(sponge_trace,
                                        ctls[sponge_idx].looked,
                                        beta, gamma))
    return {sponge_idx: extra}


def test_all_stark_sponge_scenario():
    traces, sponge_trace = build_sponge_scenario()
    starks = ast.all_starks()
    ctls = ast.all_cross_table_lookups()
    cfg = _cfg()
    proof = prove_all(starks, traces, ctls, cfg)
    extra = _extra_sums(proof, ctls, cfg, sponge_trace)
    optional = tuple(i for i, t in enumerate(traces) if t is None)
    verify_all(starks, proof, ctls, cfg, extra_looking_sums=extra,
               optional_tables=optional)


def test_all_stark_rejects_vacuous_proof():
    """An all-None AllProof must NOT verify (ADVICE r1 high)."""
    from zk_evm_tpu.stark.multi import AllProof
    starks = ast.all_starks()
    ctls = ast.all_cross_table_lookups()
    cfg = _cfg()
    vacuous = AllProof(proofs=[None] * ast.NUM_TABLES,
                       table_in_use=[False] * ast.NUM_TABLES)
    with pytest.raises(AssertionError):
        verify_all(starks, vacuous, ctls, cfg,
                   optional_tables=ast.OPTIONAL_TABLES)


@pytest.mark.skipif("ZK_SLOW" not in __import__("os").environ,
                    reason="second full multi-table prove; set ZK_SLOW=1")
def test_all_stark_rejects_wrong_memory_value():
    traces, sponge_trace = build_sponge_scenario()
    # corrupt one memory value: the sponge's byte reads no longer match
    mtrace = traces[ast.Table.Memory]
    rows = np.nonzero(mtrace[mem.TIMESTAMP] == TS)[0]
    r = int(rows[0])
    mtrace[mem.VALUE_COLS[0], r] ^= 1
    starks = ast.all_starks()
    ctls = ast.all_cross_table_lookups()
    cfg = _cfg()
    proof = prove_all(starks, traces, ctls, cfg)
    extra = _extra_sums(proof, ctls, cfg, sponge_trace)
    optional = tuple(i for i, t in enumerate(traces) if t is None)
    with pytest.raises(AssertionError):
        verify_all(starks, proof, ctls, cfg, extra_looking_sums=extra,
                   optional_tables=optional)
