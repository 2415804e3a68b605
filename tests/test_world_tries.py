"""State/transaction/receipt trie wrappers."""

from zk_evm_tpu.mpt.world import (Account, StateMpt, TransactionTrie,
                                  ReceiptTrie, EMPTY_CODE_HASH)
from zk_evm_tpu.mpt import EMPTY_TRIE_HASH
from zk_evm_tpu.native import keccak256


def test_empty_code_hash_is_keccak_empty():
    assert EMPTY_CODE_HASH == keccak256(b"")


def test_state_trie_roots():
    s = StateMpt()
    assert s.root() == EMPTY_TRIE_HASH
    addr = bytes.fromhex("000f3df6d732807ef1319fb7b8bb8522d0beac02")
    s.set_account(addr, Account(nonce=1, balance=10 ** 18))
    r1 = s.root()
    assert r1 != EMPTY_TRIE_HASH
    # storage update changes the account's storage root, then the state
    s.set_storage(addr, 0, 42)
    assert s.storage_root(addr) != EMPTY_TRIE_HASH
    s.set_account(addr, Account(nonce=1, balance=10 ** 18,
                                storage_root=s.storage_root(addr)))
    r2 = s.root()
    assert r2 != r1
    # zeroing the slot deletes it
    s.set_storage(addr, 0, 0)
    assert s.storage_root(addr) == EMPTY_TRIE_HASH


def test_txn_receipt_tries():
    t = TransactionTrie()
    r = ReceiptTrie()
    assert t.root() == EMPTY_TRIE_HASH
    for i in range(3):
        t.insert(i, b"\xf8\x6b" + bytes([i]) * 8)
        r.insert(i, b"\xf9\x01" + bytes([i]) * 4)
    assert t.root() != r.root() != EMPTY_TRIE_HASH
    # insertion order independence across indices 0..2
    t2 = TransactionTrie()
    for i in (2, 0, 1):
        t2.insert(i, b"\xf8\x6b" + bytes([i]) * 8)
    assert t2.root() == t.root()
