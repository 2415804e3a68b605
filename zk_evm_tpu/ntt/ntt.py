"""Radix-2 NTT / coset LDE over Goldilocks on device.

This is the TPU-native counterpart of the reference's `PolynomialBatch::
from_values` pipeline (IFFT -> 2x coset LDE -> Merkle leaves; zk_evm calls it
for every table commitment at /root/reference/evm_arithmetization/src/
prover.rs:100-111 — the reference's own cost model names Merkle+LDE the
prover bottleneck, book/src/framework/cost_model.md:2).

Design notes (TPU-first):
- Polynomials live as GF arrays of shape (..., n), n = 2^k static. A whole
  table (num_polys, n) transforms in one fused program.
- The butterfly network is the CONSTANT-GEOMETRY (Pease) form: every stage
  pairs (i, i + n/2) and interleaves results, so all log2(n) stages have
  identical shape and run under one lax.scan whose xs are the per-stage
  twiddle rows. The compiled graph is one stage body — compile time is
  independent of n (XLA compile throughput, not FLOPs, is the scarce
  resource for deep elementwise graphs).
- Pease output order is bit-reversed, which is exactly the Merkle-leaf /
  FRI-fold layout, so the LDE pipeline needs a single explicit gather (the
  input reordering of the IFFT).
- Twiddles: stage s multiplies lane q (q < n/2) by w^(q with low s bits
  cleared); the (logn, n/2) table is numpy-precomputed and cached.
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


@lru_cache(maxsize=64)
def _pease_twiddles_np(logn: int, inverse: bool) -> np.ndarray:
    """(logn, n/2) twiddle table: row s, lane q = w^(q & ~(2^s - 1))."""
    n = 1 << logn
    w = host.primitive_root_of_unity(logn)
    if inverse:
        w = host.finv(w)
    pw = np_field.powers(w, max(n, 2))
    q = np.arange(n // 2, dtype=np.int64)
    out = np.empty((logn, n // 2), dtype=np.uint64)
    for s in range(logn):
        out[s] = pw[(q >> s) << s]
    return out


@lru_cache(maxsize=64)
def _pease4_twiddles_np(logn: int, inverse: bool) -> np.ndarray:
    """(n_r4_stages, 3, n/4) twiddles for the radix-4 stages: stage s
    (covering radix-2 stages 2s, 2s+1) lane q uses base exponent
    e = (q >> 2s) << 2s and rows (w^e, w^2e, w^3e)."""
    n = 1 << logn
    w = host.primitive_root_of_unity(logn)
    if inverse:
        w = host.finv(w)
    pw = np_field.powers(w, max(n, 4))
    q = np.arange(n // 4, dtype=np.int64)
    n4 = logn // 2
    out = np.empty((n4, 3, n // 4), dtype=np.uint64)
    for i in range(n4):
        e = (q >> (2 * i)) << (2 * i)
        out[i, 0] = pw[e % n]
        out[i, 1] = pw[(2 * e) % n]
        out[i, 2] = pw[(3 * e) % n]
    return out


def _pease(x: GF, inverse: bool) -> GF:
    """Constant-geometry butterfly network: natural in, bit-reversed out.

    Radix-4 stages (each fusing two radix-2 stages into ONE memory
    pass — the NTT is HBM-bound at 16 B/elem r+w per stage, ROOFLINE),
    with one trailing radix-2 stage when log2(n) is odd. Outputs are
    stacked [B0, B2, B1, B3] (the j index bit-reversed inside each
    radix-4 butterfly) so the overall output order stays exactly
    bit-reversed, identical to the radix-2 network."""
    n = x.shape[-1]
    logn = n.bit_length() - 1
    if logn == 0:
        return x
    shape = x.shape
    half = n // 2
    quarter = n // 4

    if logn >= 2:
        w4 = host.primitive_root_of_unity(logn)
        if inverse:
            w4 = host.finv(w4)
        i4 = GF.const(host.fexp(w4, n // 4))
        tw4 = GF.from_u64(_pease4_twiddles_np(logn, inverse))

        def stage4(xc: GF, tws: GF):
            a = xc[..., :quarter]
            b = xc[..., quarter:2 * quarter]
            c = xc[..., 2 * quarter:3 * quarter]
            d = xc[..., 3 * quarter:]
            ac0 = a + c
            ac1 = a - c
            bd0 = b + d
            bd1 = (b - d) * i4
            y0 = ac0 + bd0
            y1 = (ac0 - bd0) * tws[1]
            y2 = (ac1 + bd1) * tws[0]
            y3 = (ac1 - bd1) * tws[2]
            y = GF.stack([y0, y1, y2, y3], axis=-1).reshape(shape)
            return y, None

        x, _ = jax.lax.scan(stage4, x, tw4)

    if logn % 2:
        s = logn - 1
        tw = GF.from_u64(_pease_twiddles_np(logn, inverse)[s])

        def stage2(xc: GF, tws: GF):
            u = xc[..., :half]
            v = xc[..., half:]
            t0 = u + v
            t1 = (u - v) * tws
            return GF.stack([t0, t1], axis=-1).reshape(shape), None

        x, _ = jax.lax.scan(stage2, x, tw.reshape((1,) + tw.shape))
    return x


def fft(coeffs: GF) -> GF:
    """coeffs (natural) -> values (natural) on the 2-adic subgroup."""
    return bit_reverse(_pease(coeffs, inverse=False))


def fft_bitrev(coeffs: GF) -> GF:
    """coeffs (natural) -> values in bit-reversed order."""
    return _pease(coeffs, inverse=False)


def ifft(values: GF) -> GF:
    """values (natural) -> coeffs (natural).

    coeffs = (1/n) * NTT_{w^-1}(values)."""
    n = values.shape[-1]
    coeffs = bit_reverse(_pease(values, inverse=True))
    return coeffs * GF.const(host.finv(n))


def coset_fft(coeffs: GF, shift: int = COSET_SHIFT) -> GF:
    """coeffs (natural) -> values on shift*<g_n> (natural)."""
    n = coeffs.shape[-1]
    return bit_reverse(_pease(coeffs * powers(shift, n), inverse=False))


def lde_bitrev(values: GF, rate_bits: int = 1,
               shift: int = COSET_SHIFT) -> GF:
    """Full LDE pipeline: values on H (natural) -> values on shift*K in
    BIT-REVERSED order, |K| = |H| << rate_bits. This is the Merkle-leaf /
    FRI-oracle layout."""
    n = values.shape[-1]
    coeffs = ifft(values) * powers(shift, n)
    pad = GF.zeros(values.shape[:-1] + (n * ((1 << rate_bits) - 1),))
    return _pease(GF.concatenate([coeffs, pad], axis=-1), inverse=False)


def lde_from_coeffs_bitrev(coeffs: GF, rate_bits: int = 1,
                           shift: int = COSET_SHIFT) -> GF:
    """coeffs (natural) -> LDE values on shift*K in BIT-REVERSED order."""
    n = coeffs.shape[-1]
    coeffs = coeffs * powers(shift, n)
    pad = GF.zeros(coeffs.shape[:-1] + (n * ((1 << rate_bits) - 1),))
    return _pease(GF.concatenate([coeffs, pad], axis=-1), inverse=False)


def coset_ifft_from_bitrev(values_br: GF, shift: int = COSET_SHIFT) -> GF:
    """values on shift*<g> in bit-reversed order -> coeffs (natural)."""
    n = values_br.shape[-1]
    coeffs = ifft(bit_reverse(values_br))
    return coeffs * powers(host.finv(shift), n)


fft = jax.jit(fft)
fft_bitrev = jax.jit(fft_bitrev)
ifft = jax.jit(ifft)
coset_fft = jax.jit(coset_fft, static_argnames=("shift",))
lde_bitrev = jax.jit(lde_bitrev, static_argnames=("rate_bits", "shift"))
lde_from_coeffs_bitrev = jax.jit(lde_from_coeffs_bitrev,
                                 static_argnames=("rate_bits", "shift"))
coset_ifft_from_bitrev = jax.jit(coset_ifft_from_bitrev,
                                 static_argnames=("shift",))
