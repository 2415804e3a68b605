"""cdk_erigon flavor: the Poseidon coprocessor wired through the AllStark
CTL graph — 56 byte-reads per block balancing against the Memory table,
MemBefore seeding, and the three Poseidon dispatch CTLs carried by the
extra-looking-sums stand-in for the (not yet built) cdk CPU layout."""

import numpy as np
import pytest

from zk_evm_tpu.challenger import Challenger
from zk_evm_tpu.stark import StarkConfig, FriConfig, prove_all, verify_all
from zk_evm_tpu.stark import lookup as lk
from zk_evm_tpu.stark.multi import observe_global, _zero_cap
from zk_evm_tpu.tables import all_stark as ast
from zk_evm_tpu.tables import memory as mem
from zk_evm_tpu.tables import memory_continuation as mc
from zk_evm_tpu.tables import poseidon as ps
from zk_evm_tpu.tables.segments import Segment

rng = np.random.default_rng(97)
TS = 5
CTX, SEG, VIRT = 0, Segment.KernelGeneral, 128


def build_scenario():
    data = bytes(rng.integers(0, 256, size=ps.BLOCK_BYTES, dtype=np.uint8))
    op = ps.PoseidonGeneralOp(context=CTX, segment=SEG, virt=VIRT,
                              timestamp=TS, input=data, len=len(data))
    pos_trace = ps.generate_trace([op])

    mem_before_values = [((CTX, SEG, VIRT + i), data[i])
                         for i in range(len(data))]
    mem_ops = [mem.MemoryOp(True, TS, CTX, SEG, VIRT + i, True, data[i])
               for i in range(len(data))]
    mem_trace, mem_after_values = mem.generate_trace(
        mem_ops, mem_before_values=mem_before_values)

    traces = [None] * ast.CDK_NUM_TABLES
    traces[ast.Table.Poseidon] = pos_trace
    traces[ast.Table.Memory] = mem_trace
    traces[ast.Table.MemBefore] = mc.generate_trace(mem_before_values)
    traces[ast.Table.MemAfter] = mc.generate_trace(mem_after_values)
    return traces, pos_trace


def _cfg():
    return StarkConfig(
        security_bits=1,
        fri_config=FriConfig(rate_bits=1, cap_height=2,
                             proof_of_work_bits=0, num_query_rounds=1,
                             arity_bits=2, final_poly_bits=2))


def _extra_sums(proof, ctls, cfg, pos_trace):
    """cdk-CPU-side contributions to the three Poseidon CTLs, recomputed
    from the claimed op data (the looked views themselves)."""
    challenger = Challenger()
    caps = [p.trace_cap if p is not None else _zero_cap(cfg)
            for p in proof.proofs]
    observe_global(challenger, caps, proof.public_inputs)
    chs = lk.get_challenge_set(challenger, cfg.num_challenges)
    extra = {}
    for name in ("poseidon_simple", "poseidon_general_input",
                 "poseidon_general_output"):
        idx = [i for i, c in enumerate(ctls) if c.name == name][0]
        extra[idx] = [lk.ctl_view_sum_np(pos_trace, ctls[idx].looked,
                                         beta, gamma)
                      for beta, gamma in chs.pairs]
    return extra


def test_cdk_registry():
    starks = ast.all_starks("cdk_erigon")
    assert len(starks) == ast.CDK_NUM_TABLES
    assert starks[ast.Table.Poseidon].name == "poseidon"
    ctls = ast.all_cross_table_lookups("cdk_erigon")
    names = [c.name for c in ctls]
    assert names[-3:] == ["poseidon_simple", "poseidon_general_input",
                          "poseidon_general_output"]
    mem_ctl = ctls[ast.MEMORY_CTL_IDX]
    pos_views = [v for v in mem_ctl.looking
                 if v.table == ast.Table.Poseidon]
    assert len(pos_views) == ps.BLOCK_BYTES


def test_cdk_poseidon_memory_scenario():
    traces, pos_trace = build_scenario()
    starks = ast.all_starks("cdk_erigon")
    ctls = ast.all_cross_table_lookups("cdk_erigon")
    cfg = _cfg()
    proof = prove_all(starks, traces, ctls, cfg)
    extra = _extra_sums(proof, ctls, cfg, pos_trace)
    optional = tuple(i for i, t in enumerate(traces) if t is None)
    verify_all(starks, proof, ctls, cfg, extra_looking_sums=extra,
               optional_tables=optional)


@pytest.mark.skipif("ZK_SLOW" not in __import__("os").environ,
                    reason="second full multi-table prove; set ZK_SLOW=1")
def test_cdk_rejects_wrong_memory_byte():
    traces, pos_trace = build_scenario()
    mtrace = traces[ast.Table.Memory]
    rows = np.nonzero(mtrace[mem.TIMESTAMP] == TS)[0]
    mtrace[mem.VALUE_COLS[0], int(rows[0])] ^= 1
    starks = ast.all_starks("cdk_erigon")
    ctls = ast.all_cross_table_lookups("cdk_erigon")
    cfg = _cfg()
    proof = prove_all(starks, traces, ctls, cfg)
    extra = _extra_sums(proof, ctls, cfg, pos_trace)
    optional = tuple(i for i, t in enumerate(traces) if t is None)
    with pytest.raises(AssertionError):
        verify_all(starks, proof, ctls, cfg, extra_looking_sums=extra,
                   optional_tables=optional)
