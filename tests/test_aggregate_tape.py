"""Segment-chain aggregation tape: PV element offsets, extra-row cell
twin vs the host encoder, and (ZK_SLOW) a real simple-transfer chain."""

import os

import numpy as np
import pytest

from zk_evm_tpu.field import host
from zk_evm_tpu.recursion import aggregate as agg
from zk_evm_tpu.recursion import vm
from zk_evm_tpu.recursion.tape_lib import sponge_hash
from zk_evm_tpu.hash import host_poseidon
from zk_evm_tpu.stark import public_values as pvmod

rng = np.random.default_rng(5)


def _rand_h256():
    return bytes(rng.integers(0, 256, size=32, dtype=np.uint8))


def _rand_u(bits):
    return int.from_bytes(
        bytes(rng.integers(0, 256, size=bits // 8, dtype=np.uint8)), "big")


def random_pv():
    md = pvmod.BlockMetadata(
        block_beneficiary=_rand_u(160), block_timestamp=_rand_u(32),
        block_number=_rand_u(32), block_difficulty=_rand_u(32),
        block_random=_rand_h256(), block_gaslimit=_rand_u(32),
        block_chain_id=_rand_u(32), block_base_fee=_rand_u(64),
        block_gas_used=_rand_u(32), block_blob_gas_used=_rand_u(64),
        block_excess_blob_gas=_rand_u(64),
        parent_beacon_block_root=_rand_h256(),
        block_bloom=tuple(_rand_u(256) for _ in range(8)))
    bh = pvmod.BlockHashes(
        prev_hashes=tuple(_rand_h256() for _ in range(256)),
        cur_hash=_rand_h256())
    ebd = pvmod.ExtraBlockData(
        checkpoint_state_trie_root=_rand_h256(),
        checkpoint_consolidated_hash=tuple(
            _rand_u(62) for _ in range(4)),
        txn_number_before=_rand_u(32), txn_number_after=_rand_u(32),
        gas_used_before=_rand_u(32), gas_used_after=_rand_u(32))
    regs_b = pvmod.RegistersData(
        program_counter=_rand_u(24), is_kernel=1,
        stack_len=_rand_u(10), stack_top=_rand_u(256),
        context=_rand_u(16), gas_used=_rand_u(32))
    regs_a = pvmod.RegistersData(
        program_counter=_rand_u(24), is_kernel=1,
        stack_len=_rand_u(10), stack_top=_rand_u(256),
        context=_rand_u(16), gas_used=_rand_u(32))
    return pvmod.PublicValues(
        trie_roots_before=pvmod.TrieRoots(_rand_h256(), _rand_h256(),
                                          _rand_h256()),
        trie_roots_after=pvmod.TrieRoots(_rand_h256(), _rand_h256(),
                                         _rand_h256()),
        block_metadata=md, block_hashes=bh, extra_block_data=ebd,
        registers_before=regs_b, registers_after=regs_a)


def test_pv_element_offsets():
    pv = random_pv()
    els = pv.to_elements()
    assert len(els) == agg.NUM_PV_ELEMENTS
    assert els[agg.MD_TIMESTAMP] == pv.block_metadata.block_timestamp
    assert els[agg.MD_CHAIN_ID] == pv.block_metadata.block_chain_id
    assert els[agg.EBD_GAS_AFTER] == pv.extra_block_data.gas_used_after
    assert els[agg.TRB:agg.TRB + 8] == \
        pvmod.h256_limbs(pv.trie_roots_before.state_root)
    assert els[agg.BH_CUR:agg.BH_CUR + 8] == \
        pvmod.h256_limbs(pv.block_hashes.cur_hash)
    assert els[agg.MD_BLOOM:agg.MD_BLOOM + 8] == \
        pvmod.u256_limbs(pv.block_metadata.block_bloom[0])


def test_extra_rows_cells_match_host():
    """The cell-built memory extra rows equal the host encoder's rows
    value-for-value — the binding the chain wrap relies on."""
    pv = random_pv()
    kernel_hash = _rand_u(256)
    kernel_len = 77001
    want = pvmod.memory_extra_looking_values(pv, kernel_hash, kernel_len)

    t = vm.Tape()
    pub = [t.load(int(v)) for v in pv.to_elements()]
    rb = agg.load_registers_cells(t, pv.registers_before)
    ra = agg.load_registers_cells(t, pv.registers_after)
    rows = agg.memory_extra_rows_cells(t, pub, rb, ra,
                                       kernel_hash, kernel_len)
    assert len(rows) == len(want)
    for got_cells, want_row in zip(rows, want):
        got = [t.value(c) for c in got_cells]
        assert got == [v % host.P for v in want_row]


def test_sponge_hash_matches_host():
    t = vm.Tape()
    vals = [int(v) for v in rng.integers(0, host.P, size=21,
                                         dtype=np.uint64)]
    cells = [t.load(v) for v in vals]
    digest = sponge_hash(t, cells)
    assert [t.value(c) for c in digest] == host_poseidon.hash_no_pad(vals)


@pytest.mark.skipif("ZK_SLOW" not in os.environ,
                    reason="real 2-segment chain wrap; set ZK_SLOW=1")
def test_wrap_real_segment_chain():
    """Prove a 2-segment simple-transfer chain, wrap the WHOLE chain in
    one tape, spot-check the tape's constraints (the outer prove is a
    TPU-scale job)."""
    from zk_evm_tpu.witness.assembler import combined_kernel
    from zk_evm_tpu.witness.testing_fixtures import FIXTURES
    from zk_evm_tpu.witness.segments import generate_segment_tables
    from zk_evm_tpu.orchestration.block import prove_block, \
        verify_segments
    from zk_evm_tpu.stark import StarkConfig, FriConfig
    from zk_evm_tpu.stark.debug import check_constraints
    from zk_evm_tpu.recursion import ram

    kernel = combined_kernel()
    inputs = FIXTURES["simple-transfer"]()
    cfg = StarkConfig.test_config()
    proofs = []
    for seg, gt in generate_segment_tables(kernel, inputs,
                                           max_cpu_len_log=14):
        proofs.append(prove_block(gt, cfg))
    assert len(proofs) >= 2
    verify_segments(proofs, kernel, cfg)

    t = vm.Tape(npub=4)
    pub_cells, first_b, last_a = agg.wrap_segment_chain(
        t, proofs, kernel, cfg)
    digest = sponge_hash(t, pub_cells)
    for k, c in enumerate(digest):
        t.bind_public(c, k)
    stark, rvm_trace, ram_trace, pose_ops, pub = t.finalize()
    # the wrap's statement digest matches the host recomputation
    want = host_poseidon.hash_no_pad(
        [int(v) for v in proofs[0].public_inputs])
    assert pub == want
    step = max(1, rvm_trace.shape[1] // 64)
    check_constraints(stark, rvm_trace,
                      rows=list(range(0, rvm_trace.shape[1], step)),
                      public_inputs=pub)
    check_constraints(ram.RvmMemStark(), ram_trace,
                      rows=list(range(0, ram_trace.shape[1],
                                      max(1, ram_trace.shape[1] // 64))))
