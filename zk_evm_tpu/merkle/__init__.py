from .tree import MerkleTree, build_tree
from . import host as host_merkle
from . import keccak_host as keccak_merkle

__all__ = ["MerkleTree", "build_tree", "host_merkle", "keccak_merkle"]
