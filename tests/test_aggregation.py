"""Batch- and block-level aggregation PV algebra (orchestration/
aggregation.py) — the host twin of the reference's recursive circuits
(fixed_recursive_verifier.rs:1336-2027) — plus (ZK_SLOW) a real
2-batch block proven end to end from the blocks 3-6 witness file."""

import os
import json

import pytest

from zk_evm_tpu.mpt.trie import EMPTY_TRIE_HASH
from zk_evm_tpu.stark.public_values import (PublicValues, TrieRoots,
                                            BlockMetadata, BlockHashes,
                                            ExtraBlockData, RegistersData)
from zk_evm_tpu.orchestration.aggregation import (
    check_batch_pair, combine_batch_pvs, check_block_initial,
    check_checkpoint_block, check_block_parent, consolidate_hashes,
    empty_consolidated_blockhash, FinalPublicValues, two_to_one_mix)

ZK_SLOW = os.environ.get("ZK_SLOW") == "1"
B3B6 = "/root/reference/artifacts/witness_b3_b6.json"


def _load_b3b6():
    if not os.path.exists(B3B6):
        pytest.skip("witness_b3_b6.json not mounted")
    return json.load(open(B3B6))


def _h(i: int) -> bytes:
    return i.to_bytes(32, "big")


def _pv(state_before=1, state_after=2, txn=(0, 3), gas=(0, 500),
        number=7, timestamp=1000, prev_base=0x100, gas_used=500):
    prev = tuple(_h(prev_base + i) for i in range(256))
    return PublicValues(
        trie_roots_before=TrieRoots(state_root=_h(state_before),
                                    transactions_root=EMPTY_TRIE_HASH,
                                    receipts_root=EMPTY_TRIE_HASH),
        trie_roots_after=TrieRoots(state_root=_h(state_after),
                                   transactions_root=_h(0xAA),
                                   receipts_root=_h(0xBB)),
        block_metadata=BlockMetadata(block_number=number,
                                     block_timestamp=timestamp,
                                     block_gas_used=gas_used),
        block_hashes=BlockHashes(prev_hashes=prev,
                                 cur_hash=_h(prev_base + 256)),
        extra_block_data=ExtraBlockData(
            checkpoint_state_trie_root=_h(state_before),
            checkpoint_consolidated_hash=consolidate_hashes(list(prev)),
            txn_number_before=txn[0], txn_number_after=txn[1],
            gas_used_before=gas[0], gas_used_after=gas[1]),
        registers_before=RegistersData(program_counter=10),
        registers_after=RegistersData(program_counter=20))


def test_batch_pair_chains():
    a = _pv(state_before=1, state_after=2, txn=(0, 3), gas=(0, 200),
            gas_used=500)
    from dataclasses import replace
    b = replace(a,
                trie_roots_before=a.trie_roots_after,
                trie_roots_after=TrieRoots(state_root=_h(9)),
                extra_block_data=replace(a.extra_block_data,
                                         txn_number_before=3,
                                         txn_number_after=5,
                                         gas_used_before=200,
                                         gas_used_after=500))
    check_batch_pair(a, b)
    combined = combine_batch_pvs(a, b)
    assert combined.trie_roots_before == a.trie_roots_before
    assert combined.trie_roots_after == b.trie_roots_after
    assert combined.extra_block_data.txn_number_before == 0
    assert combined.extra_block_data.txn_number_after == 5
    assert combined.extra_block_data.gas_used_after == 500
    assert combined.registers_before == a.registers_before
    assert combined.registers_after == b.registers_after
    check_block_initial(combined)

    # broken trie chain rejected
    broken = replace(b, trie_roots_before=TrieRoots(state_root=_h(42)))
    with pytest.raises(AssertionError):
        check_batch_pair(a, broken)
    # broken gas chain rejected
    broken = replace(b, extra_block_data=replace(
        b.extra_block_data, gas_used_before=150))
    with pytest.raises(AssertionError):
        check_batch_pair(a, broken)


def test_block_initial_rejects():
    from dataclasses import replace
    pv = _pv()
    check_block_initial(pv)
    with pytest.raises(AssertionError):
        check_block_initial(replace(pv, extra_block_data=replace(
            pv.extra_block_data, txn_number_before=1)))
    with pytest.raises(AssertionError):
        check_block_initial(replace(pv, trie_roots_before=TrieRoots(
            state_root=_h(1), transactions_root=_h(5),
            receipts_root=EMPTY_TRIE_HASH)))
    # header gas != final counter
    with pytest.raises(AssertionError):
        check_block_initial(replace(pv, block_metadata=replace(
            pv.block_metadata, block_gas_used=1)))


def test_checkpoint_block():
    pv = _pv()
    check_checkpoint_block(pv)
    from dataclasses import replace
    bad = replace(pv, extra_block_data=replace(
        pv.extra_block_data, checkpoint_consolidated_hash=(1, 2, 3, 4)))
    with pytest.raises(AssertionError):
        check_checkpoint_block(bad)
    bad = replace(pv, trie_roots_before=TrieRoots(
        state_root=_h(99), transactions_root=EMPTY_TRIE_HASH,
        receipts_root=EMPTY_TRIE_HASH))
    with pytest.raises(AssertionError):
        check_checkpoint_block(bad)


def test_block_parent_link():
    from dataclasses import replace
    parent = _pv(state_before=1, state_after=2, number=7,
                 timestamp=1000, prev_base=0x100)
    # child's hash window slides by one
    child_prev = tuple(list(parent.block_hashes.prev_hashes[1:])
                       + [parent.block_hashes.cur_hash])
    child = replace(
        _pv(state_before=2, state_after=5, number=8, timestamp=1012),
        block_hashes=BlockHashes(prev_hashes=child_prev,
                                 cur_hash=_h(0x999)),
        extra_block_data=replace(
            _pv().extra_block_data,
            checkpoint_state_trie_root=parent.extra_block_data
            .checkpoint_state_trie_root,
            checkpoint_consolidated_hash=parent.extra_block_data
            .checkpoint_consolidated_hash))
    check_block_parent(parent, child)

    # state root mismatch
    bad = replace(child, trie_roots_before=TrieRoots(state_root=_h(3)))
    with pytest.raises(AssertionError):
        check_block_parent(parent, bad)
    # wrong block number
    bad = replace(child, block_metadata=replace(
        child.block_metadata, block_number=9))
    with pytest.raises(AssertionError):
        check_block_parent(parent, bad)
    # hash window does not slide
    bad = replace(child, block_hashes=parent.block_hashes)
    with pytest.raises(AssertionError):
        check_block_parent(parent, bad)
    # timestamp regression
    bad = replace(child, block_metadata=replace(
        child.block_metadata, block_timestamp=999))
    with pytest.raises(AssertionError):
        check_block_parent(parent, bad)


def test_final_public_values():
    pv = _pv()
    fin = FinalPublicValues.from_public_values(pv)
    assert fin.checkpoint_state_trie_root == \
        pv.trie_roots_before.state_root
    assert fin.new_state_trie_root == pv.trie_roots_after.state_root
    payload = list(pv.block_hashes.prev_hashes[1:]) \
        + [pv.block_hashes.cur_hash]
    assert fin.new_consolidated_hash == consolidate_hashes(payload)
    # 1 + 8 + 8 + 4 + 4 elements, all field-sized
    assert len(fin.to_elements()) == 25
    mix = two_to_one_mix(fin, fin)
    assert len(mix) == 4
    assert mix == two_to_one_mix(fin, fin)
    other = FinalPublicValues.from_public_values(_pv(state_after=3))
    assert mix != two_to_one_mix(fin, other)


def test_empty_consolidated_blockhash_is_stable():
    a = empty_consolidated_blockhash()
    assert a == consolidate_hashes([b"\x00" * 32] * 256)
    assert all(isinstance(x, int) for x in a)


@pytest.mark.skipif(not ZK_SLOW, reason="ZK_SLOW=1 proves a real block")
def test_prove_block_3_end_to_end():
    """Block 3 of the blocks 3-6 witness: 0 txns -> 2 dummy batches
    (decoder padding), each a real kernel run, proven at test config
    through batch aggregation to one block statement and checkpoint-
    anchored (.github/workflows/ci.yml:166-195 twin)."""
    from zk_evm_tpu.decoder import parse_block_prover_input, entrypoint
    from zk_evm_tpu.witness.assembler import combined_kernel
    from zk_evm_tpu.orchestration.aggregation import (
        prove_block_batches, verify_block_chain,
        rewrite_checkpoint_consolidation)
    from zk_evm_tpu.stark.config import StarkConfig
    from zk_evm_tpu.stark.serialization import (block_proof_to_json,
                                                block_proof_from_json)

    blocks = _load_b3b6()
    bpi = parse_block_prover_input(blocks[0])
    gis = entrypoint(bpi)
    assert len(gis) == 2, "0-txn block must pad to 2 dummy batches"
    gis_per_block = [gis]
    rewrite_checkpoint_consolidation(gis_per_block)

    kernel = combined_kernel()
    bp = prove_block_batches(kernel, gis_per_block[0],
                             config=StarkConfig.test_config(),
                             max_cpu_len_log=16)
    finals = verify_block_chain([bp], kernel,
                                config=StarkConfig.test_config())
    assert finals[0].new_state_trie_root == \
        bp.public_values.trie_roots_after.state_root

    # serialization round-trip preserves the statement
    rt = block_proof_from_json(block_proof_to_json(bp))
    assert rt.public_values == bp.public_values
    assert len(rt.batches) == 2


@pytest.mark.skipif(not ZK_SLOW, reason="ZK_SLOW=1 proves two real blocks")
def test_two_blocks_chain_end_to_end():
    """Blocks 3 AND 4 of witness_b3_b6: each proven through batch
    aggregation to a block statement, then chained — block 3 anchors at
    the checkpoint, block 4 links to block 3's post-state (the
    reference's cyclic block circuit + --previous-proof resume,
    fixed_recursive_verifier.rs:2513-2703, zero/src/fs.rs:14-30)."""
    from zk_evm_tpu.decoder import parse_block_prover_input, entrypoint
    from zk_evm_tpu.witness.assembler import combined_kernel
    from zk_evm_tpu.orchestration.aggregation import (
        prove_block_batches, verify_block_chain,
        rewrite_checkpoint_consolidation)
    from zk_evm_tpu.stark.config import StarkConfig

    blocks = _load_b3b6()
    gis_per_block = [entrypoint(parse_block_prover_input(blocks[i]))
                     for i in range(2)]
    rewrite_checkpoint_consolidation(gis_per_block)

    kernel = combined_kernel()
    bps = [prove_block_batches(kernel, gis,
                               config=StarkConfig.test_config(),
                               max_cpu_len_log=16)
           for gis in gis_per_block]
    finals = verify_block_chain(bps, kernel,
                                config=StarkConfig.test_config())
    assert len(finals) == 2
    assert finals[0].new_state_trie_root == \
        bps[0].public_values.trie_roots_after.state_root
    assert finals[1].checkpoint_state_trie_root == \
        finals[0].checkpoint_state_trie_root
    # resume path: verify block 4 alone against block 3's publics
    verify_block_chain([bps[1]], kernel,
                       config=StarkConfig.test_config(),
                       parent=bps[0].public_values)
