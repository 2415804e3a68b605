"""cdk_erigon flavor: the Poseidon coprocessor wired through the AllStark
CTL graph with a real cdk CPU table — POSEIDON/POSEIDON_GENERAL dispatch
rides the cdk CpuStark's extra `poseidon` op flag (ops.rs cfg(cdk_erigon),
cpu_stark.rs:467-544), the coprocessor's 56 byte-reads balance against
Memory, and no extra-looking stand-ins are needed."""

import numpy as np
import pytest

from zk_evm_tpu.stark import StarkConfig, FriConfig, prove_all, verify_all
from zk_evm_tpu.tables import all_stark as ast
from zk_evm_tpu.tables import memory as mem
from zk_evm_tpu.tables import poseidon as ps
from zk_evm_tpu.tables.scenarios import build_cdk_poseidon_scenario


def _cfg():
    return StarkConfig(
        security_bits=1,
        fri_config=FriConfig(rate_bits=1, cap_height=2,
                             proof_of_work_bits=0, num_query_rounds=1,
                             arity_bits=2, final_poly_bits=2))


def _prove_and_verify(traces, cpu_stark, expect_fail=False):
    starks = ast.all_starks("cdk_erigon")
    starks[ast.Table.Cpu] = cpu_stark
    ctls = ast.all_cross_table_lookups("cdk_erigon")
    cfg = _cfg()
    proof = prove_all(starks, traces, ctls, cfg)
    optional = tuple(i for i, t in enumerate(traces) if t is None)
    if expect_fail:
        with pytest.raises(AssertionError):
            verify_all(starks, proof, ctls, cfg, optional_tables=optional)
    else:
        verify_all(starks, proof, ctls, cfg, optional_tables=optional)


def test_cdk_registry():
    starks = ast.all_starks("cdk_erigon")
    assert len(starks) == ast.CDK_NUM_TABLES
    assert starks[ast.Table.Poseidon].name == "poseidon"
    from zk_evm_tpu.tables import cpu_columns as cc
    assert starks[ast.Table.Cpu].num_columns == cc.NUM_CPU_COLUMNS_CDK
    ctls = ast.all_cross_table_lookups("cdk_erigon")
    names = [c.name for c in ctls]
    assert names[-3:] == ["poseidon_simple", "poseidon_general_input",
                          "poseidon_general_output"]
    # every Poseidon CTL has a real cdk-CPU looking view (no hatch)
    for c in ctls[-3:]:
        assert len(c.looking) == 1
        assert c.looking[0].table == ast.Table.Cpu
    mem_ctl = ctls[ast.MEMORY_CTL_IDX]
    pos_views = [v for v in mem_ctl.looking
                 if v.table == ast.Table.Poseidon]
    assert len(pos_views) == ps.BLOCK_BYTES


def test_cdk_scenario_balances_and_constrains():
    from zk_evm_tpu.stark.debug import check_constraints_np, \
        check_ctl_balance
    traces, cpu_stark = build_cdk_poseidon_scenario()
    check_constraints_np(cpu_stark, traces[ast.Table.Cpu])
    check_ctl_balance(ast.all_cross_table_lookups("cdk_erigon"), traces)


def test_cdk_poseidon_cpu_scenario():
    traces, cpu_stark = build_cdk_poseidon_scenario()
    _prove_and_verify(traces, cpu_stark)


@pytest.mark.skipif("ZK_SLOW" not in __import__("os").environ,
                    reason="second full multi-table prove; set ZK_SLOW=1")
def test_cdk_rejects_wrong_memory_byte():
    traces, cpu_stark = build_cdk_poseidon_scenario()
    mtrace = traces[ast.Table.Memory]
    # flip a coprocessor-read byte: the memory CTL must unbalance
    from zk_evm_tpu.tables.segments import Segment
    rows = np.nonzero(mtrace[mem.ADDR_SEGMENT]
                      == int(Segment.KernelGeneral))[0]
    target = int(rows[0]) if len(rows) else 0
    mtrace[mem.VALUE_COLS[0], target] ^= 1
    _prove_and_verify(traces, cpu_stark, expect_fail=True)


@pytest.mark.skipif("ZK_SLOW" not in __import__("os").environ,
                    reason="second full multi-table prove; set ZK_SLOW=1")
def test_cdk_rejects_wrong_digest():
    traces, cpu_stark = build_cdk_poseidon_scenario()
    # corrupt the CPU-claimed simple digest (next-row top of stack):
    # the poseidon_simple CTL must unbalance
    from zk_evm_tpu.tables import cpu_columns as cc
    ctrace = traces[ast.Table.Cpu]
    ch0 = cc.MEM_CHANNELS[0]
    ctrace[ch0.value[0], 1] ^= 1
    _prove_and_verify(traces, cpu_stark, expect_fail=True)
