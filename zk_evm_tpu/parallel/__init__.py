from .sharded import commit_cap, sharded_commit_cap, make_mesh

__all__ = ["commit_cap", "sharded_commit_cap", "make_mesh"]
