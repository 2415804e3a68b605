"""MPT trie: RLP vectors, yellow-paper anchors, op invariants, and the
hashed-subtree (witness subset) property."""

import numpy as np
import pytest

from zk_evm_tpu.mpt import (Trie, Nibbles, rlp_encode, rlp_decode,
                            EMPTY_TRIE_HASH, hex_prefix_encode)

rng = np.random.default_rng(101)


def test_rlp_vectors():
    # canonical vectors from the spec
    assert rlp_encode(b"dog") == b"\x83dog"
    assert rlp_encode([b"cat", b"dog"]) == b"\xc8\x83cat\x83dog"
    assert rlp_encode(b"") == b"\x80"
    assert rlp_encode([]) == b"\xc0"
    assert rlp_encode(0) == b"\x80"
    assert rlp_encode(15) == b"\x0f"
    assert rlp_encode(1024) == b"\x82\x04\x00"
    long = bytes(range(60))
    assert rlp_encode(long) == b"\xb8\x3c" + long
    # roundtrips
    for item in (b"", b"a", b"hello world", [b"a", [b"b", b"c"]], long):
        assert rlp_decode(rlp_encode(item)) == (
            item if not isinstance(item, list) else item)


def test_hex_prefix_vectors():
    # yellow paper appendix C examples
    assert hex_prefix_encode(Nibbles([1, 2, 3, 4, 5]), False) == \
        bytes.fromhex("112345")
    assert hex_prefix_encode(Nibbles([0, 1, 2, 3, 4, 5]), False) == \
        bytes.fromhex("00012345")
    assert hex_prefix_encode(Nibbles([0, 0xF, 1, 0xC, 0xB, 8]), True) == \
        bytes.fromhex("200f1cb8")
    assert hex_prefix_encode(Nibbles([0xF, 1, 0xC, 0xB, 8]), True) == \
        bytes.fromhex("3f1cb8")


def test_empty_root():
    assert Trie().root_hash() == EMPTY_TRIE_HASH


def test_known_eth_roots():
    """Cross-implementation anchors: the canonical ethereum trie test
    vectors (trietest.json 'insert-middle-leaf' style pairs)."""
    t = Trie()
    pairs = [(b"do", b"verb"), (b"dog", b"puppy"),
             (b"doge", b"coin"), (b"horse", b"stallion")]
    for k, v in pairs:
        t.insert(Nibbles.from_bytes(k), v)
    assert t.root_hash().hex() == \
        "5991bb8c6514148a29db676a14ac506cd2cd5775ace63c30a4fe457715e9ac84"


def test_insert_get_delete_roundtrip():
    t = Trie()
    keys = {}
    for _ in range(200):
        k = bytes(rng.integers(0, 256, size=int(rng.integers(1, 8)),
                               dtype=np.uint8))
        v = bytes(rng.integers(1, 256, size=int(rng.integers(1, 40)),
                               dtype=np.uint8))
        t.insert(Nibbles.from_bytes(k), v)
        keys[k] = v
    for k, v in keys.items():
        assert t.get(Nibbles.from_bytes(k)) == v
    # order independence
    t2 = Trie()
    for k, v in sorted(keys.items(), reverse=True):
        t2.insert(Nibbles.from_bytes(k), v)
    assert t.root_hash() == t2.root_hash()
    # delete half, re-check
    removed = list(keys)[::2]
    for k in removed:
        t.delete(Nibbles.from_bytes(k))
        del keys[k]
    for k, v in keys.items():
        assert t.get(Nibbles.from_bytes(k)) == v
    # root equals a freshly built trie of the remainder
    t3 = Trie()
    for k, v in keys.items():
        t3.insert(Nibbles.from_bytes(k), v)
    assert t.root_hash() == t3.root_hash()
    # delete everything -> empty root
    for k in list(keys):
        t.delete(Nibbles.from_bytes(k))
    assert t.root_hash() == EMPTY_TRIE_HASH


def test_subset_masking_preserves_root():
    t = Trie()
    for i in range(64):
        t.insert(Nibbles.from_bytes(bytes([i, i ^ 0x5A])),
                 bytes([i + 1]) * 5)
    full_root = t.root_hash()
    # mask an off-path subtree: pick some existing branch path
    from zk_evm_tpu.mpt.trie import Branch, Extension
    node = t.root
    path = []
    while not isinstance(node, Branch):
        assert isinstance(node, Extension)
        path += list(node.key.nibs)
        node = node.child
    for i, ch in enumerate(node.children):
        if not isinstance(ch, type(None)) and ch.__class__.__name__ \
                not in ("Empty",):
            path.append(i)
            break
    t.mask_subtree(Nibbles(path))
    assert t.root_hash() == full_root
    # reads through the masked subtree now fail loudly
    with pytest.raises(KeyError):
        for i in range(64):
            t.get(Nibbles.from_bytes(bytes([i, i ^ 0x5A])))
