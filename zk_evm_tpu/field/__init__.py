from .gf import GF
from .extension import GFE
from . import goldilocks, host

__all__ = ["GF", "GFE", "goldilocks", "host"]
