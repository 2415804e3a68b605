from .gf import GF
from .extension import GFE
from . import goldilocks, host, np_field

__all__ = ["GF", "GFE", "goldilocks", "host", "np_field"]
