"""Radix-2 NTT / coset LDE over Goldilocks on device.

This is the TPU-native counterpart of the reference's `PolynomialBatch::
from_values` pipeline (IFFT -> 2x coset LDE -> Merkle leaves; zk_evm calls it
for every table commitment at /root/reference/evm_arithmetization/src/
prover.rs:100-111 — the reference's own cost model names Merkle+LDE the
prover bottleneck, book/src/framework/cost_model.md:2).

Design notes (TPU-first):
- Polynomials live as GF arrays of shape (..., n), n = 2^k static. A whole
  table (num_polys, n) transforms in one fused program; the stage loop is a
  static python loop, so XLA sees one flat graph of vectorized butterflies.
- Forward transform is decimation-in-frequency (natural input -> bit-reversed
  output); inverse is decimation-in-time (bit-reversed input -> natural
  output). The FRI layout wants LDE leaves in bit-reversed order anyway
  (fold pairs are then adjacent), so the full LDE pipeline costs exactly one
  explicit gather (the input bit-reversal of the IFFT).
- Twiddles are device-resident constants built once per (size, direction) by
  log-doubling (`powers`), cached.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from ..field import GF, host, np_field

COSET_SHIFT = host.MULT_GENERATOR  # 7, the reference's coset shift g


@lru_cache(maxsize=64)
def bit_reverse_indices(logn: int) -> np.ndarray:
    n = 1 << logn
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros(n, dtype=np.uint32)
    for b in range(logn):
        rev |= ((idx >> b) & 1) << (logn - 1 - b)
    return rev


def bit_reverse(x: GF) -> GF:
    """Permute the last axis into bit-reversed order (an involution)."""
    n = x.shape[-1]
    return x.take(jnp.asarray(bit_reverse_indices(n.bit_length() - 1)),
                  axis=-1)


def powers(base: int, n: int) -> GF:
    """[1, base, base^2, ..., base^(n-1)] as a GF array (numpy-precomputed,
    so safe to build and cache from inside a jit trace)."""
    return GF.from_u64(np_field.powers(base, n))


@lru_cache(maxsize=128)
def _stage_twiddles_np(logn: int, inverse: bool) -> tuple[np.ndarray, ...]:
    """Per-stage twiddle vectors for block sizes n, n/2, ..., 2, as numpy
    uint64 (cached trace-free; converted to device constants at use sites).

    Stage for block size b uses w_b^j, j < b/2, where w_b is the primitive
    b-th root of unity (or its inverse)."""
    out = []
    for s in range(logn):
        b_log = logn - s
        w = host.primitive_root_of_unity(b_log)
        if inverse:
            w = host.finv(w)
        out.append(np_field.powers(w, 1 << (b_log - 1)))
    return tuple(out)


def _stage_twiddles(logn: int, inverse: bool) -> tuple[GF, ...]:
    return tuple(GF.from_u64(t) for t in _stage_twiddles_np(logn, inverse))


def _dif(x: GF, logn: int, inverse: bool) -> GF:
    """Gentleman-Sande butterflies: natural order in, bit-reversed out."""
    n = 1 << logn
    tws = _stage_twiddles(logn, inverse)
    shape = x.shape
    for s in range(logn):
        b = n >> s
        half = b >> 1
        y = x.reshape(shape[:-1] + (n // b, b))
        u = y[..., :half]
        v = y[..., half:]
        x = GF.concatenate([u + v, (u - v) * tws[s]], axis=-1)
        x = x.reshape(shape)
    return x


def _dit(x: GF, logn: int, inverse: bool) -> GF:
    """Cooley-Tukey butterflies: bit-reversed order in, natural out."""
    n = 1 << logn
    tws = _stage_twiddles(logn, inverse)
    shape = x.shape
    for s in range(logn - 1, -1, -1):
        b = n >> s
        half = b >> 1
        y = x.reshape(shape[:-1] + (n // b, b))
        u = y[..., :half]
        t = y[..., half:] * tws[s]
        x = GF.concatenate([u + t, u - t], axis=-1)
        x = x.reshape(shape)
    return x


def fft(coeffs: GF) -> GF:
    """coeffs (natural) -> values (natural) on the 2-adic subgroup."""
    logn = coeffs.shape[-1].bit_length() - 1
    return bit_reverse(_dif(coeffs, logn, inverse=False))


def ifft(values: GF) -> GF:
    """values (natural) -> coeffs (natural)."""
    n = values.shape[-1]
    logn = n.bit_length() - 1
    coeffs = _dit(bit_reverse(values), logn, inverse=True)
    return coeffs * GF.const(host.finv(n))


def coset_fft(coeffs: GF, shift: int = COSET_SHIFT) -> GF:
    """coeffs (natural) -> values on shift*<g_n> (natural)."""
    n = coeffs.shape[-1]
    logn = n.bit_length() - 1
    scaled = coeffs * powers(shift, n)
    return bit_reverse(_dif(scaled, logn, inverse=False))


def lde_bitrev(values: GF, rate_bits: int = 1,
               shift: int = COSET_SHIFT) -> GF:
    """Full LDE pipeline: values on H (natural) -> values on shift*K in
    BIT-REVERSED order, |K| = |H| << rate_bits. This is the Merkle-leaf /
    FRI-oracle layout."""
    n = values.shape[-1]
    logn = n.bit_length() - 1
    coeffs = _dit(bit_reverse(values), logn, inverse=True)
    coeffs = coeffs * GF.const(host.finv(n))
    coeffs = coeffs * powers(shift, n)
    pad = GF.zeros(values.shape[:-1] + (n * ((1 << rate_bits) - 1),))
    coeffs = GF.concatenate([coeffs, pad], axis=-1)
    return _dif(coeffs, logn + rate_bits, inverse=False)


fft = jax.jit(fft)
ifft = jax.jit(ifft)
coset_fft = jax.jit(coset_fft, static_argnames=("shift",))
lde_bitrev = jax.jit(lde_bitrev, static_argnames=("rate_bits", "shift"))
