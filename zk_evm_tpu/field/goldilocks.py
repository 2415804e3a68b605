"""Goldilocks field F_p, p = 2^64 - 2^32 + 1, as 2x-uint32-limb JAX arithmetic.

TPUs have no native 64-bit integer multiply, so every field element is a pair
of uint32 arrays ``(lo, hi)``; 32x32->64 products are built from 16-bit limb
partial products (all exact in uint32), and the 128->64 reduction uses the
Goldilocks identities 2^64 = 2^32 - 1 (mod p) and 2^96 = -1 (mod p).

This is the TPU-native re-design of plonky2's GoldilocksField (the reference
relies on it for every trace polynomial; see zk_evm SURVEY §2.1 and the spec
in /root/reference/book/src/framework/field.md). Everything here is
elementwise and shape-polymorphic: ops map over arbitrary leading dims and
fuse under jit/pallas.

All inputs and outputs are canonical (< p) unless a function's docstring says
otherwise.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Constants
# ---------------------------------------------------------------------------

P = (1 << 64) - (1 << 32) + 1          # 0xFFFFFFFF00000001
P_LO = np.uint32(1)
P_HI = np.uint32(0xFFFFFFFF)
EPSILON = np.uint32(0xFFFFFFFF)        # 2^64 mod p = 2^32 - 1

MULT_GENERATOR = 7                      # generator of F_p^* (plonky2 choice)
TWO_ADICITY = 32
# MULT_GENERATOR ^ ((p-1) >> 32) mod p — primitive 2^32-th root of unity,
# identical to plonky2's POWER_OF_TWO_GENERATOR.
POWER_OF_TWO_GENERATOR = 1753635133440165772

U32 = jnp.uint32
MASK16 = np.uint32(0xFFFF)


def _u32(x):
    return jnp.asarray(x, dtype=U32)


# ---------------------------------------------------------------------------
# 32-bit building blocks
# ---------------------------------------------------------------------------

def _addc(x, y):
    """uint32 add with carry-out. Returns (sum, carry in {0,1})."""
    s = x + y
    return s, (s < x).astype(U32)


def mul32(a, b):
    """Exact 32x32 -> 64 multiply via 16-bit limbs. Returns (lo32, hi32)."""
    al = a & MASK16
    ah = a >> 16
    bl = b & MASK16
    bh = b >> 16
    ll = al * bl                       # < 2^32, exact
    lh = al * bh
    hl = ah * bl
    hh = ah * bh
    mid, c_mid = _addc(lh, hl)         # true mid = mid + 2^32*c_mid
    lo, c_lo = _addc(ll, mid << 16)
    hi = hh + (mid >> 16) + (c_mid << 16) + c_lo
    return lo, hi


def _add64(alo, ahi, blo, bhi):
    """64-bit add (as 32-bit limb pairs) with carry-out."""
    lo, c0 = _addc(alo, blo)
    hi1, c1 = _addc(ahi, bhi)
    hi, c2 = _addc(hi1, c0)
    return lo, hi, c1 + c2             # carry-out in {0,1}


def _sub64(alo, ahi, blo, bhi):
    """64-bit subtract with borrow-out in {0,1}."""
    lo = alo - blo
    b0 = (alo < blo).astype(U32)
    hi1 = ahi - bhi
    b1 = (ahi < bhi).astype(U32)
    hi = hi1 - b0
    b2 = (hi1 < b0).astype(U32)
    return lo, hi, b1 + b2


def _reduce_lt_2p(lo, hi):
    """Canonicalize a value known to be < 2^64: subtract p if >= p.

    v >= p iff hi == 0xFFFFFFFF and lo >= 1 (p = 0xFFFFFFFF_00000001).
    """
    ge = ((hi == P_HI) & (lo != 0)).astype(U32)
    return lo - ge, hi - ge * P_HI


# ---------------------------------------------------------------------------
# Field ops (elementwise over (lo, hi) uint32 arrays)
# ---------------------------------------------------------------------------

def add(alo, ahi, blo, bhi):
    lo, hi, c = _add64(alo, ahi, blo, bhi)
    # carry-out means the true sum exceeded 2^64: add 2^64 mod p = EPSILON.
    # (sum < 2p so the wrapped value is < 2^64 - 2^33 + 2; no re-carry.)
    lo, c2 = _addc(lo, c * EPSILON)
    hi = hi + c2
    return _reduce_lt_2p(lo, hi)


def sub(alo, ahi, blo, bhi):
    lo, hi, borrow = _sub64(alo, ahi, blo, bhi)
    # borrow: true value is negative; add p <=> subtract EPSILON in 2^64 ring.
    lo2 = lo - borrow * EPSILON
    b2 = (lo < borrow * EPSILON).astype(U32)
    hi = hi - b2
    return lo2, hi


def neg(alo, ahi):
    zero = jnp.zeros_like(alo)
    return sub(zero, zero, alo, ahi)


def _mul_wide(alo, ahi, blo, bhi):
    """Full 64x64 -> 128 product. Returns 4 uint32 limbs (r0..r3, LSB first)."""
    ll_lo, ll_hi = mul32(alo, blo)
    lh_lo, lh_hi = mul32(alo, bhi)
    hl_lo, hl_hi = mul32(ahi, blo)
    hh_lo, hh_hi = mul32(ahi, bhi)

    r0 = ll_lo
    r1, c1a = _addc(ll_hi, lh_lo)
    r1, c1b = _addc(r1, hl_lo)
    r2, c2a = _addc(lh_hi, hl_hi)
    r2, c2b = _addc(r2, hh_lo)
    r2, c2c = _addc(r2, c1a + c1b)
    r3 = hh_hi + c2a + c2b + c2c
    return r0, r1, r2, r3


def reduce128(r0, r1, r2, r3):
    """Reduce a 128-bit value (4 uint32 limbs) mod p.

    n = n0 + n1*2^64 + n2*2^96 with n0 = (r0,r1), n1 = r2, n2 = r3:
      n = n0 - n2 + n1*(2^32 - 1)  (mod p).
    """
    # t = n0 - n2 (mod p), kept as < 2^64 possibly >= p.
    t_lo, t_hi, borrow = _sub64(r0, r1, r3, jnp.zeros_like(r3))
    t_lo2 = t_lo - borrow * EPSILON
    b2 = (t_lo < borrow * EPSILON).astype(U32)
    t_hi = t_hi - b2
    t_lo = t_lo2
    # u = n1 * (2^32 - 1) = (n1 << 32) - n1  (< 2^64)
    u_lo = jnp.zeros_like(r2) - r2
    u_hi = r2 - (r2 != 0).astype(U32)
    # t + u mod p. Sum < 2^65 - 2^33, so one EPSILON adjustment never re-carries.
    lo, hi, c = _add64(t_lo, t_hi, u_lo, u_hi)
    lo, c2 = _addc(lo, c * EPSILON)
    hi = hi + c2
    return _reduce_lt_2p(lo, hi)


def reduce128_nc(r0, r1, r2, r3):
    """reduce128 without the final canonicalization: result is < 2^64 and
    congruent mod p, but may be in [p, 2^64). Safe to feed back into
    mul/square (they accept any < 2^64 operands) — hot inner loops chain
    these and canonicalize once at the end."""
    t_lo, t_hi, borrow = _sub64(r0, r1, r3, jnp.zeros_like(r3))
    t_lo2 = t_lo - borrow * EPSILON
    b2 = (t_lo < borrow * EPSILON).astype(U32)
    t_hi = t_hi - b2
    t_lo = t_lo2
    u_lo = jnp.zeros_like(r2) - r2
    u_hi = r2 - (r2 != 0).astype(U32)
    lo, hi, c = _add64(t_lo, t_hi, u_lo, u_hi)
    lo, c2 = _addc(lo, c * EPSILON)
    hi = hi + c2
    return lo, hi


def mul(alo, ahi, blo, bhi):
    return reduce128(*_mul_wide(alo, ahi, blo, bhi))


def mul_nc(alo, ahi, blo, bhi):
    """Multiply accepting/producing non-canonical (< 2^64) values."""
    return reduce128_nc(*_mul_wide(alo, ahi, blo, bhi))


def _square_wide(alo, ahi):
    """64 -> 128 bit squaring: 3 mul32s instead of mul_wide's 4 (the cross
    product appears twice, so it is computed once and doubled)."""
    ll_lo, ll_hi = mul32(alo, alo)
    lh_lo, lh_hi = mul32(alo, ahi)
    hh_lo, hh_hi = mul32(ahi, ahi)
    # 2*lh occupies bits 33..97: limbs (lh_lo<<1, lh_hi<<1 | lh_lo>>31,
    # lh_hi>>31) at positions 2^32, 2^64, 2^96.
    d0 = lh_lo << 1
    d1 = (lh_hi << 1) | (lh_lo >> 31)
    d2 = lh_hi >> 31
    r0 = ll_lo
    r1, c1 = _addc(ll_hi, d0)
    r2, c2a = _addc(hh_lo, d1)
    r2, c2b = _addc(r2, c1)
    r3 = hh_hi + d2 + c2a + c2b
    return r0, r1, r2, r3


def square(alo, ahi):
    # NOTE: deliberately mul-based, NOT _square_wide: square() appears in
    # every quotient/constraint program, and keeping its HLO identical to
    # round-3 builds preserves the warm XLA persistent-cache entries for
    # all compiled prover programs (the 3-mul32 squaring pays off only
    # inside the hand-written Pallas kernels, which call square_nc).
    return mul(alo, ahi, alo, ahi)


def square_nc(alo, ahi):
    """Square accepting/producing non-canonical (< 2^64) values."""
    return reduce128_nc(*_square_wide(alo, ahi))


def mul_small(alo, ahi, k: int):
    """Multiply by a compile-time constant 0 <= k < 2^16 (cheap path: 4 muls)."""
    assert 0 <= k < (1 << 16)
    kk = np.uint32(k)
    l0 = (alo & MASK16) * kk           # <= 2^32 - ... exact
    l1 = (alo >> 16) * kk
    l2 = (ahi & MASK16) * kk
    l3 = (ahi >> 16) * kk
    # recombine: value = l0 + l1<<16 + l2<<32 + l3<<48  (< 2^80)
    r0, c0 = _addc(l0, l1 << 16)
    r1, c1 = _addc(l2, (l1 >> 16) + c0)
    r1, c1b = _addc(r1, l3 << 16)
    r2 = (l3 >> 16) + c1 + c1b
    return reduce128(r0, r1, r2, jnp.zeros_like(r2))


def mul_pow2(alo, ahi, k: int):
    """Multiply by 2^k for 0 <= k < 32 (shift + reduce)."""
    assert 0 <= k < 32
    if k == 0:
        return alo, ahi
    r0 = alo << k
    r1 = (ahi << k) | (alo >> (32 - k))
    r2 = ahi >> (32 - k)
    return reduce128(r0, r1, r2, jnp.zeros_like(r2))


def exp_u64(alo, ahi, e: int):
    """Raise to a compile-time integer power by square-and-multiply."""
    rlo = jnp.full_like(alo, 1)
    rhi = jnp.zeros_like(ahi)
    blo, bhi = alo, ahi
    while e > 0:
        if e & 1:
            rlo, rhi = mul(rlo, rhi, blo, bhi)
        e >>= 1
        if e:
            blo, bhi = square(blo, bhi)
    return rlo, rhi


def inv(alo, ahi):
    """Field inverse via Fermat: a^(p-2), as a lax.fori_loop over the 64
    exponent bits (MSB-first square-and-multiply with a select).

    The loop form keeps the traced graph ~100 ops regardless of how often
    inv is inlined — XLA compile time is the scarce resource, and the
    unrolled addition-chain variant costs ~150 inlined multiplies."""
    import jax
    import jax.numpy as jnp

    e = P - 2
    bits = jnp.asarray(
        np.array([(e >> (63 - i)) & 1 for i in range(64)], dtype=np.uint32))

    def body(i, st):
        rlo, rhi = square(st[0], st[1])
        mlo, mhi = mul(rlo, rhi, alo, ahi)
        take = bits[i] == 1
        return (jnp.where(take, mlo, rlo), jnp.where(take, mhi, rhi))

    one = (jnp.ones_like(alo), jnp.zeros_like(ahi))
    rlo, rhi = jax.lax.fori_loop(0, 64, body, one)
    return rlo, rhi


# ---------------------------------------------------------------------------
# Host <-> device conversion helpers
# ---------------------------------------------------------------------------

def from_u64(x) -> tuple[jnp.ndarray, jnp.ndarray]:
    """numpy uint64 (or python-int array-like) -> (lo, hi) uint32 device pair."""
    arr = np.asarray(x, dtype=np.uint64)
    lo = (arr & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (arr >> np.uint64(32)).astype(np.uint32)
    return jnp.asarray(lo), jnp.asarray(hi)


def to_u64(lo, hi) -> np.ndarray:
    """(lo, hi) uint32 pair -> numpy uint64 array (host)."""
    lo = np.asarray(lo, dtype=np.uint64)
    hi = np.asarray(hi, dtype=np.uint64)
    return lo | (hi << np.uint64(32))
