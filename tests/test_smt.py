"""SMT (Poseidon sparse Merkle tree) semantics."""

import numpy as np

from zk_evm_tpu.smt import (Smt, Key, key_balance, key_storage,
                            key_nonce, hash0, hash1)
from zk_evm_tpu.field import host

rng = np.random.default_rng(111)


def rand_key():
    return Key(tuple(int(x) for x in
                     rng.integers(0, host.P, size=4, dtype=np.uint64)))


def test_empty_root_is_zero():
    assert Smt().root() == (0, 0, 0, 0)


def test_single_leaf_identity():
    """Root of one entry = hash1(key || hash0(value limbs))."""
    s = Smt()
    k = rand_key()
    v = 123456789
    s.set(k, v)
    vhash = hash0([(v >> (32 * i)) & 0xFFFFFFFF for i in range(8)])
    assert s.root() == hash1(list(k.limbs) + list(vhash))


def test_set_get_delete_and_canonicality():
    s = Smt()
    entries = {rand_key(): int(rng.integers(1, 1 << 62))
               for _ in range(50)}
    for k, v in entries.items():
        s.set(k, v)
    for k, v in entries.items():
        assert s.get(k) == v
    r1 = s.root()
    # rebuilding in a different order yields the same root (canonical)
    s2 = Smt()
    for k, v in reversed(list(entries.items())):
        s2.set(k, v)
    assert s2.root() == r1
    # deleting one entry changes the root; re-adding restores it
    k0 = next(iter(entries))
    s.set(k0, 0)
    assert s.root() != r1
    s.set(k0, entries[k0])
    assert s.root() == r1


def test_hash_capped_subtree_preserves_root():
    s = Smt()
    for _ in range(32):
        s.set(rand_key(), int(rng.integers(1, 1 << 62)))
    r = s.root()
    # cap the left subtree at depth 1 with its own digest
    left_items = [(k, v) for k, v in s.kv.items() if k.bit(0) == 0]
    lh = s._root_rec(left_items, (0,))
    s2 = Smt()
    for k, v in s.kv.items():
        if k.bit(0) == 1:
            s2.set(k, v)
    s2.set_hash((0,), lh)
    assert s2.root() == r


def test_account_keys_distinct():
    addr = bytes.fromhex("000f3df6d732807ef1319fb7b8bb8522d0beac02")
    keys = {key_balance(addr).limbs, key_nonce(addr).limbs,
            key_storage(addr, 0).limbs, key_storage(addr, 1).limbs}
    assert len(keys) == 4


def test_serialize_and_prune_roundtrip():
    """Kernel TrieData format (smt.rs:404-506): full and pruned
    serializations both commit to the same root via hash_serialize."""
    from zk_evm_tpu.smt.smt import (hash_serialize, HASH_TYPE, LEAF_TYPE)
    addr1 = bytes.fromhex("00" * 19 + "01")
    addr2 = bytes.fromhex("aa" * 20)
    addr3 = bytes.fromhex("3d" * 20)
    s = Smt()
    s.set(key_balance(addr1), 10**18)
    s.set(key_nonce(addr1), 5)
    s.set(key_balance(addr2), 42)
    s.set(key_storage(addr3, 7), 0xDEAD)
    root = s.root()
    v = s.serialize()
    assert hash_serialize(v) == root
    vp = s.serialize_and_prune([key_balance(addr1)])
    assert hash_serialize(vp) == root
    assert len(vp) < len(v), "pruning did not shrink the serialization"
    assert HASH_TYPE in vp[2:] and LEAF_TYPE in vp[2:]
    # ptr=0 is the canonical empty node; root at ptr=2
    assert v[:2] == [0, 0]


def test_serialize_empty_and_caps():
    from zk_evm_tpu.smt.smt import hash_serialize
    assert Smt().serialize() == [0, 0, 0, 0]
    addr1 = bytes.fromhex("00" * 19 + "01")
    addr2 = bytes.fromhex("aa" * 20)
    s = Smt()
    s.set(key_balance(addr1), 1)
    cap_path = tuple(key_balance(addr2).bit(t) for t in range(3))
    s.set_hash(cap_path, (1, 2, 3, 4))
    assert hash_serialize(s.serialize()) == s.root()
