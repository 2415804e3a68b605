"""Host-side Merkle verification (exact ints) — used by the proof verifier
and as the test oracle for the device tree builder."""

from __future__ import annotations

from ..hash import host_poseidon as hp


def verify_path(leaf_values: list[int], index: int,
                path: list[list[int]], cap: list[list[int]]) -> bool:
    """Check a Merkle path against a cap. `cap` is a list of 4-element
    digests; the path stops at cap level."""
    digest = hp.hash_or_noop(leaf_values)
    idx = index
    for sib in path:
        if idx & 1:
            digest = hp.two_to_one(sib, digest)
        else:
            digest = hp.two_to_one(digest, sib)
        idx >>= 1
    return digest == list(cap[idx])


def build_tree(leaves: list[list[int]], cap_height: int):
    """Reference (slow) host tree: returns (levels, cap)."""
    level = [hp.hash_or_noop(row) for row in leaves]
    levels = [level]
    while len(levels[-1]) > (1 << cap_height):
        cur = levels[-1]
        levels.append([hp.two_to_one(cur[i], cur[i + 1])
                       for i in range(0, len(cur), 2)])
    return levels, levels[-1]
