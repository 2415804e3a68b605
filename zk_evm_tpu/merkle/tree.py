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
        out = []
        idx = index
        for level in self.levels[:-1]:
            sib = level[idx ^ 1].to_u64()
            out.append([int(x) for x in sib])
            idx >>= 1
        return out


def _build_levels(leaves: GF, cap_height: int) -> list[GF]:
    n = leaves.shape[0]
    levels = [poseidon.hash_rows(leaves)]
    while levels[-1].shape[0] > (1 << cap_height):
        cur = levels[-1]
        levels.append(poseidon.compress(cur[0::2], cur[1::2]))
    return levels


_build_levels_jit = jax.jit(_build_levels, static_argnames=("cap_height",))


def build_tree(leaves: GF, cap_height: int = 4) -> MerkleTree:
    n = leaves.shape[0]
    assert n & (n - 1) == 0 and n >= (1 << cap_height), (n, cap_height)
    return MerkleTree(leaves, _build_levels_jit(leaves, cap_height),
                      cap_height)
