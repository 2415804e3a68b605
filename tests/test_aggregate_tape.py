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


def test_block_wrap_public_layout_matches_final_public_values():
    """BP_* offsets 0..24 must be FinalPublicValues.to_elements() order
    (the chain verifier returns pub[:25] as the block's finals)."""
    from zk_evm_tpu.orchestration.aggregation import FinalPublicValues
    pv = random_pv()
    fin = FinalPublicValues.from_public_values(pv)
    els = fin.to_elements()
    assert len(els) == 25
    assert agg.BP_CHAIN_ID == 0
    assert agg.BP_CHECKPOINT_ROOT == 1
    assert agg.BP_NEW_STATE_ROOT == 9
    assert agg.BP_CHECKPOINT_CONSOLIDATED == 17
    assert agg.BP_NEW_CONSOLIDATED == 21
    assert agg.NPUB_BLOCK == 39


def _fake_wrap_pub(number=7, ts=1000, chain_id=1, checkpoint=11,
                   pre=11, post=22, prev_cons=(1, 2, 3, 4),
                   new_cons=(5, 6, 7, 8), chk_cons=(1, 2, 3, 4)):
    from zk_evm_tpu.stark import public_values as pvm
    pub = [0] * agg.NPUB_BLOCK
    pub[agg.BP_CHAIN_ID] = chain_id
    pub[agg.BP_CHECKPOINT_ROOT:agg.BP_CHECKPOINT_ROOT + 8] = \
        pvm.h256_limbs(checkpoint.to_bytes(32, "big"))
    pub[agg.BP_PRE_STATE_ROOT:agg.BP_PRE_STATE_ROOT + 8] = \
        pvm.h256_limbs(pre.to_bytes(32, "big"))
    pub[agg.BP_NEW_STATE_ROOT:agg.BP_NEW_STATE_ROOT + 8] = \
        pvm.h256_limbs(post.to_bytes(32, "big"))
    pub[agg.BP_CHECKPOINT_CONSOLIDATED:
        agg.BP_CHECKPOINT_CONSOLIDATED + 4] = list(chk_cons)
    pub[agg.BP_NEW_CONSOLIDATED:agg.BP_NEW_CONSOLIDATED + 4] = \
        list(new_cons)
    pub[agg.BP_PREV_CONSOLIDATED:agg.BP_PREV_CONSOLIDATED + 4] = \
        list(prev_cons)
    pub[agg.BP_BLOCK_NUMBER] = number
    pub[agg.BP_TIMESTAMP] = ts
    return pub


def test_wrap_parent_link_checks():
    parent = _fake_wrap_pub(number=7, post=22, new_cons=(9, 9, 9, 9))
    child = _fake_wrap_pub(number=8, ts=1012, pre=22,
                           prev_cons=(9, 9, 9, 9))
    agg.check_wrap_parent_link(parent, child)
    # state root break
    bad = _fake_wrap_pub(number=8, ts=1012, pre=23,
                         prev_cons=(9, 9, 9, 9))
    with pytest.raises(AssertionError):
        agg.check_wrap_parent_link(parent, bad)
    # window does not slide
    bad = _fake_wrap_pub(number=8, ts=1012, pre=22,
                         prev_cons=(1, 1, 1, 1))
    with pytest.raises(AssertionError):
        agg.check_wrap_parent_link(parent, bad)
    # number skip
    bad = _fake_wrap_pub(number=9, ts=1012, pre=22,
                         prev_cons=(9, 9, 9, 9))
    with pytest.raises(AssertionError):
        agg.check_wrap_parent_link(parent, bad)
    # timestamp regression
    bad = _fake_wrap_pub(number=8, ts=999, pre=22,
                         prev_cons=(9, 9, 9, 9))
    with pytest.raises(AssertionError):
        agg.check_wrap_parent_link(parent, bad)


def test_wrap_checkpoint_anchor_checks():
    ok = _fake_wrap_pub(pre=11, checkpoint=11, prev_cons=(1, 2, 3, 4),
                        chk_cons=(1, 2, 3, 4))
    agg.check_wrap_checkpoint_anchor(ok)
    with pytest.raises(AssertionError):
        agg.check_wrap_checkpoint_anchor(
            _fake_wrap_pub(pre=12, checkpoint=11))
    with pytest.raises(AssertionError):
        agg.check_wrap_checkpoint_anchor(
            _fake_wrap_pub(pre=11, checkpoint=11, prev_cons=(0, 0, 0, 1),
                           chk_cons=(1, 2, 3, 4)))


@pytest.mark.skipif("ZK_SLOW" not in os.environ,
                    reason="proves a real block + its full wrap; ZK_SLOW=1")
def test_block3_succinct_wrap_end_to_end():
    """SUCCINCT block proof of real block 3 (witness_b3_b6): both dummy
    batches' segment chains prove at test config, the WHOLE block
    (segment verification, batch chaining, block-initial invariants,
    checkpoint anchor, consolidated hashes) wraps into ONE verifier-AIR
    tape, the wrap PROVES, and verify_block_wrap_chain accepts the
    single wrap proof — constant-size block verification
    (fixed_recursive_verifier.rs:2298-2824 twin)."""
    import json
    from zk_evm_tpu.decoder import parse_block_prover_input, entrypoint
    from zk_evm_tpu.witness.assembler import combined_kernel
    from zk_evm_tpu.witness.segments import generate_segment_tables
    from zk_evm_tpu.orchestration.block import prove_block
    from zk_evm_tpu.orchestration.aggregation import (
        rewrite_checkpoint_consolidation, FinalPublicValues)
    from zk_evm_tpu.stark.config import StarkConfig
    from zk_evm_tpu.recursion.system import prove_system
    from zk_evm_tpu.stark import public_values as pvm

    path = "/root/reference/artifacts/witness_b3_b6.json"
    if not os.path.exists(path):
        pytest.skip("witness_b3_b6.json not mounted")
    blocks = json.load(open(path))
    bpi = parse_block_prover_input(blocks[0])
    gis = entrypoint(bpi)
    gis_per_block = [gis]
    rewrite_checkpoint_consolidation(gis_per_block)
    kernel = combined_kernel()
    cfg = StarkConfig.test_config()

    chains = []
    for gi in gis_per_block[0]:
        chains.append([prove_block(gt, cfg) for _seg, gt in
                       generate_segment_tables(kernel, gi,
                                               max_cpu_len_log=16)])

    t = vm.Tape(npub=agg.NPUB_BLOCK)
    pub_cells = agg.wrap_block(t, chains, kernel, cfg)
    agg.bind_block_publics(t, pub_cells)
    starks, wrap_proof, pub = prove_system(t, cfg)
    finals = agg.verify_block_wrap_chain([(starks, wrap_proof)], cfg)
    want = FinalPublicValues.from_public_values(
        chains[0][0].public_values)
    # batch agg changed trie_roots_after; recompute from the last batch
    assert finals[0][agg.BP_NEW_STATE_ROOT:agg.BP_NEW_STATE_ROOT + 8] \
        == pvm.h256_limbs(
            chains[-1][-1].public_values.trie_roots_after.state_root)
    assert finals[0][agg.BP_CHAIN_ID] == want.chain_id


def test_block_statement_cell_algebra_matches_host():
    """block_statement_from_batch_pubs over two loaded batch PV vectors
    == the host twins (check_batch_pair + combine_batch_pvs +
    check_block_initial + check_checkpoint_block + consolidate_hashes),
    cell for cell."""
    from dataclasses import replace
    from zk_evm_tpu.mpt.trie import EMPTY_TRIE_HASH
    from zk_evm_tpu.orchestration.aggregation import (
        check_batch_pair, combine_batch_pvs, check_block_initial,
        check_checkpoint_block, consolidate_hashes, FinalPublicValues)
    from zk_evm_tpu.stark import public_values as pvm

    a = random_pv()
    # make `a` a valid chain-initial batch anchored at its checkpoint
    prev = a.block_hashes.prev_hashes
    a = replace(
        a,
        trie_roots_before=pvm.TrieRoots(
            state_root=a.extra_block_data.checkpoint_state_trie_root,
            transactions_root=EMPTY_TRIE_HASH,
            receipts_root=EMPTY_TRIE_HASH),
        extra_block_data=replace(
            a.extra_block_data, txn_number_before=0, gas_used_before=0,
            checkpoint_consolidated_hash=consolidate_hashes(list(prev))))
    b = replace(
        a,
        trie_roots_before=a.trie_roots_after,
        trie_roots_after=pvm.TrieRoots(
            state_root=bytes(range(32)),
            transactions_root=bytes(range(1, 33)),
            receipts_root=bytes(range(2, 34))),
        extra_block_data=replace(
            a.extra_block_data,
            txn_number_before=a.extra_block_data.txn_number_after,
            txn_number_after=a.extra_block_data.txn_number_after + 5,
            gas_used_before=a.extra_block_data.gas_used_after,
            gas_used_after=a.extra_block_data.gas_used_after + 999))
    # header gas must equal the final counter (block-initial invariant)
    a = replace(a, block_metadata=replace(
        a.block_metadata,
        block_gas_used=b.extra_block_data.gas_used_after))
    b = replace(b, block_metadata=a.block_metadata)

    # host twin
    check_batch_pair(a, b)
    combined = combine_batch_pvs(a, b)
    check_block_initial(combined)
    check_checkpoint_block(combined)
    fin = FinalPublicValues.from_public_values(combined)

    # cell twin
    t = vm.Tape()
    pubs_a = [t.load(int(v)) for v in a.to_elements()]
    pubs_b = [t.load(int(v)) for v in b.to_elements()]
    pub = agg.block_statement_from_batch_pubs(t, [pubs_a, pubs_b])
    got = [t.value(c) for c in pub]
    assert got[:25] == fin.to_elements()
    assert got[agg.BP_BLOCK_NUMBER] == \
        combined.block_metadata.block_number
    assert got[agg.BP_PRE_STATE_ROOT:agg.BP_PRE_STATE_ROOT + 8] == \
        pvm.h256_limbs(combined.trie_roots_before.state_root)
    assert got[agg.BP_PREV_CONSOLIDATED:agg.BP_PREV_CONSOLIDATED + 4] \
        == list(combined.extra_block_data.checkpoint_consolidated_hash)

    # a broken gas chain must be rejected by the tape
    bad_b = replace(b, extra_block_data=replace(
        b.extra_block_data,
        gas_used_before=b.extra_block_data.gas_used_before + 1))
    t2 = vm.Tape()
    pubs_a2 = [t2.load(int(v)) for v in a.to_elements()]
    pubs_b2 = [t2.load(int(v)) for v in bad_b.to_elements()]
    with pytest.raises(AssertionError):
        agg.block_statement_from_batch_pubs(t2, [pubs_a2, pubs_b2])
