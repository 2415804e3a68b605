"""Merkle tree with caps, built level-by-level on device.

Counterpart of the reference's commitment trees (Merkle caps of height 4 over
Poseidon digests; cap law at /root/reference/evm_arithmetization/src/
proof.rs:22-24 and prover.rs:46). The whole tree is batched hashing: one
`hash_rows` over all leaves, then log2(n) - cap_height `compress` calls,
each a single fused device program over a full level — no per-node work.

Leaf index convention: callers pass leaves in the order they will be opened
(for LDE oracles that is bit-reversed evaluation order, matching the FRI
folding layout; see ntt.lde_bitrev).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax

from ..field import GF
from ..hash import poseidon


@dataclass
class MerkleTree:
    """leaves: (n, leaf_len); levels[0] = leaf digests (n, 4), each next
    level halves, levels[-1] = cap (2^cap_height, 4)."""
    leaves: GF
    levels: list[GF]
    cap_height: int

    @property
    def cap(self) -> GF:
        return self.levels[-1]

    def cap_u64(self):
        return self.cap.to_u64()

    def prove(self, index: int) -> list[list[int]]:
        """Merkle path for a leaf: sibling digests bottom-up (host ints),
        stopping at the cap."""
        return self.prove_many([index])[0]

    def prove_many(self, indices) -> list[list[list[int]]]:
        """Merkle paths for many leaves with one batched device gather per
        level (the per-query path extraction the FRI prover does for all
        84 query rounds at once)."""
        import jax.numpy as jnp
        idx = np.asarray(indices, dtype=np.int64)
        paths: list[list[list[int]]] = [[] for _ in indices]
        for level in self.levels[:-1]:
            sibs = level.take(jnp.asarray(idx ^ 1), axis=0).to_u64()
            for q in range(len(paths)):
                paths[q].append([int(x) for x in sibs[q]])
            idx = idx >> 1
        return paths

    def leaves_at(self, indices) -> np.ndarray:
        """Leaf rows at `indices` as a (Q, leaf_len) uint64 array, one
        batched gather."""
        import jax.numpy as jnp
        idx = np.asarray(indices, dtype=np.int64)
        return self.leaves.take(jnp.asarray(idx), axis=0).to_u64()


# Levels with <= _SMALL_PAIRS pairs are padded to exactly _SMALL_PAIRS so
# every small level in every tree reuses ONE compiled compress executable
# (XLA compile time, not hashing, dominates small levels; the padding work
# is bounded by _SMALL_PAIRS * log n hashes).
_SMALL_PAIRS = 1024


def _compress_level(cur: GF) -> GF:
    m = cur.shape[0]
    if m // 2 >= _SMALL_PAIRS:
        return poseidon.compress(cur[0::2], cur[1::2])
    pad = GF.zeros((2 * _SMALL_PAIRS - m, 4))
    full = GF.concatenate([cur, pad], axis=0)
    out = poseidon.compress(full[0::2], full[1::2])   # fixed shape
    return out[:m // 2]


def _build_levels(leaves: GF, cap_height: int) -> list[GF]:
    levels = [poseidon.hash_rows(leaves)]
    while levels[-1].shape[0] > (1 << cap_height):
        levels.append(_compress_level(levels[-1]))
    return levels


def build_tree(leaves: GF, cap_height: int = 4) -> MerkleTree:
    n = leaves.shape[0]
    assert n & (n - 1) == 0 and n >= (1 << cap_height), (n, cap_height)
    return MerkleTree(leaves, _build_levels(leaves, cap_height), cap_height)


def build_tree_keccak_device(leaves: GF, cap_height: int = 4) -> MerkleTree:
    """Keccak commitment tree ON DEVICE (hash/keccak_device.py): same
    digest law as the host-numpy twin (merkle/keccak_tree.py), same
    MerkleTree interface as the Poseidon tree — the device engine for
    StarkConfig.hasher="keccak" (the reference's KeccakGoldilocksConfig,
    tests/simple_transfer.rs:24,30)."""
    from ..hash import keccak_device
    n = leaves.shape[0]
    assert n & (n - 1) == 0 and n >= (1 << cap_height), (n, cap_height)
    levels = [keccak_device.hash_rows(leaves)]
    while levels[-1].shape[0] > (1 << cap_height):
        levels.append(keccak_device.compress(levels[-1]))
    return MerkleTree(leaves, levels, cap_height)
