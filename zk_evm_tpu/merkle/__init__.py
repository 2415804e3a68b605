from .tree import MerkleTree, build_tree
from . import host as host_merkle

__all__ = ["MerkleTree", "build_tree", "host_merkle"]
