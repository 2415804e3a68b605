from .ntt import (
    fft, ifft, coset_fft, lde_bitrev, bit_reverse, powers,
    bit_reverse_indices,
)
from . import host as host_ntt

__all__ = [
    "fft", "ifft", "coset_fft", "lde_bitrev", "bit_reverse", "powers",
    "bit_reverse_indices", "host_ntt",
]
