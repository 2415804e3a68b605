from .tree import MerkleTree, build_tree, build_tree_keccak_device
from . import host as host_merkle
from . import keccak_host as keccak_merkle


def build_commitment_tree(leaves, cap_height: int = 4,
                          hasher: str = "poseidon"):
    """Commitment-tree dispatch on StarkConfig.hasher: the Poseidon
    device tree (the performance path — digests ride the chip), the
    Keccak DEVICE tree (r5: batched keccak-f[1600] as 2x-u32-lane XLA,
    the reference's KeccakGoldilocksConfig twin,
    tests/simple_transfer.rs:24,30), or the host-numpy Keccak tree
    ("keccak_host", retained as the bit-exactness ground truth)."""
    if hasher == "keccak":
        return build_tree_keccak_device(leaves, cap_height)
    if hasher == "keccak_host":
        import numpy as np
        from .keccak_tree import build_tree_keccak
        return build_tree_keccak(np.asarray(leaves.to_u64()), cap_height)
    assert hasher == "poseidon", hasher
    return build_tree(leaves, cap_height=cap_height)


def path_verifier(hasher: str = "poseidon"):
    """The host verify_path for a hasher config."""
    if hasher in ("keccak", "keccak_host"):
        return keccak_merkle.verify_path
    assert hasher == "poseidon", hasher
    return host_merkle.verify_path


__all__ = ["MerkleTree", "build_tree", "build_commitment_tree",
           "path_verifier", "host_merkle", "keccak_merkle"]
