"""Sparse Merkle tree over Poseidon (the Hermez/cdk-erigon type-2 state).

Functional twin of the reference's smt_trie crate (/root/reference/
smt_trie/src/{smt,keys,utils,bits}.rs, SURVEY.md §2.6): 4-field-element
keys whose bits interleave into the tree path, leaves hashed as
Poseidon(rem_key || value_hash; capacity [1,0,0,0]), internal nodes as
Poseidon(left || right; capacity 0), zero root for the empty tree, and
account keys derived by Poseidon over (address, key-type, slot-capacity).

Representation: a canonical kv-map; the root is computed recursively
(leaves sit at the minimal distinguishing depth — the same canonical
shape the reference maintains incrementally). Hash-capped subtrees
(witness minimization) are stored by bit-path.

Note on constants: the permutation is this repo's Poseidon instance
(hash/poseidon_params.py); the reference's HASH_ZEROS etc. are the same
formulas evaluated under plonky2's round constants.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

from ..hash import host_poseidon as hp

U256_MASK = (1 << 256) - 1


def _poseidon_first4(inputs12):
    return tuple(hp.permute(list(inputs12))[:4])


def hash0(x8):
    """Poseidon(x, capacity [0,0,0,0]) -> first 4 elements."""
    return _poseidon_first4(list(x8) + [0, 0, 0, 0])


def hash1(x8):
    """Poseidon(x, capacity [1,0,0,0]) -> first 4 elements."""
    return _poseidon_first4(list(x8) + [1, 0, 0, 0])


@lru_cache(maxsize=1)
def hash_zeros():
    return hash0([0] * 8)


@dataclass(frozen=True)
class Key:
    limbs: tuple      # 4 u64 field elements

    def bit(self, t: int) -> int:
        """Path bit t: bits of the four limbs interleaved."""
        return (self.limbs[t % 4] >> (t // 4)) & 1

    def remove_bits(self, nbits: int) -> "Key":
        full = nbits // 4
        rem = []
        for i in range(4):
            n = full + (1 if full * 4 + i < nbits else 0)
            rem.append(self.limbs[i] >> n)
        return Key(tuple(rem))


def _value_limbs(value: int):
    return [(value >> (32 * i)) & 0xFFFFFFFF for i in range(8)]


def _addr_words(address: bytes):
    assert len(address) == 20
    return [int.from_bytes(address[16 - 4 * i:20 - 4 * i], "big")
            for i in range(5)]


def _key_of_type(address: bytes, key_type: int, capacity=None) -> Key:
    arr = [0] * 12
    arr[0:5] = _addr_words(address)
    arr[6] = key_type
    arr[8:12] = list(capacity if capacity is not None else hash_zeros())
    return Key(_poseidon_first4(arr))


def key_balance(address: bytes) -> Key:
    return _key_of_type(address, 0)


def key_nonce(address: bytes) -> Key:
    return _key_of_type(address, 1)


def key_code(address: bytes) -> Key:
    return _key_of_type(address, 2)


def key_storage(address: bytes, slot: int) -> Key:
    cap = _poseidon_first4(_value_limbs(slot) + [0, 0, 0, 0])
    return _key_of_type(address, 3, cap)


def key_code_length(address: bytes) -> Key:
    return _key_of_type(address, 4)


class Smt:
    def __init__(self):
        self.kv: dict[Key, int] = {}
        self.hash_nodes: dict[tuple, tuple] = {}   # bit-path -> digest4

    def set(self, key: Key, value: int):
        value &= U256_MASK
        if value == 0:
            self.kv.pop(key, None)
        else:
            self.kv[key] = value

    def get(self, key: Key) -> int:
        return self.kv.get(key, 0)

    def set_hash(self, path_bits: tuple, digest: tuple):
        """Cap the subtree at `path_bits` with a known digest (witness
        subtrees; no kv key may descend into it)."""
        self.hash_nodes[tuple(path_bits)] = tuple(digest)

    def root(self) -> tuple:
        keys = list(self.kv.items())
        return self._root_rec(keys, ())

    def root_u256(self) -> int:
        r = self.root()
        return sum(x << (64 * i) for i, x in enumerate(r))

    def _root_rec(self, items, path):
        if path in self.hash_nodes:
            assert not items, "kv key descends into a hashed-out subtree"
            return self.hash_nodes[path]
        has_caps = any(p[:len(path)] == path for p in self.hash_nodes)
        if not items and not has_caps:
            return (0, 0, 0, 0)
        d = len(path)
        if len(items) == 1 and not has_caps:
            key, value = items[0]
            rem = key.remove_bits(d)
            vhash = hash0(_value_limbs(value))
            return hash1(list(rem.limbs) + list(vhash))
        left = [(k, v) for k, v in items if k.bit(d) == 0]
        right = [(k, v) for k, v in items if k.bit(d) == 1]
        lh = self._root_rec(left, path + (0,))
        rh = self._root_rec(right, path + (1,))
        return hash0(list(lh) + list(rh))
