"""Keccak-f[1600] and keccak256 Merkle hashing ON DEVICE (pure XLA).

TPUs have no native u64, so every lane is a (lo, hi) uint32 pair; the
permutation is XOR/AND/rotate only, all exact in uint32, and the 24
rounds unroll into one fused jit program — the device twin of the host
batch hasher (hash/keccak_np.py) and of the reference's
KeccakGoldilocksConfig commitment hasher (plonky2 config; used as the
outer config of every evm_arithmetization integration test, e.g.
/root/reference/evm_arithmetization/tests/simple_transfer.rs:24,30).
Digest law matches merkle/keccak_host.py bit-for-bit: leaf = keccak256
of le64-packed values, digest limbs reduced into GF; hash_or_noop
identity for <=4-value leaves; inner = keccak256(left || right).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..field import GF
from ..field.goldilocks import P_HI
from .keccak_np import _R, _RC

_RATE_LANES = 17


def _rotl_pair(lo, hi, n: int):
    """64-bit rotate-left of (lo, hi) uint32 pairs by a static n."""
    n %= 64
    if n == 0:
        return lo, hi
    if n >= 32:
        lo, hi = hi, lo
        n -= 32
    if n == 0:
        return lo, hi
    return ((lo << n) | (hi >> (32 - n)),
            (hi << n) | (lo >> (32 - n)))


def keccak_f1600_pair(lo, hi):
    """Permute (k, 5, 5) lane pairs, lane (x, y) at [:, y, x] (y-major,
    hash/keccak_np.py convention)."""
    for rc in _RC:
        rc_lo = np.uint32(int(rc) & 0xFFFFFFFF)
        rc_hi = np.uint32(int(rc) >> 32)
        # theta
        clo = lo[:, 0] ^ lo[:, 1] ^ lo[:, 2] ^ lo[:, 3] ^ lo[:, 4]
        chi = hi[:, 0] ^ hi[:, 1] ^ hi[:, 2] ^ hi[:, 3] ^ hi[:, 4]
        dlo_cols, dhi_cols = [], []
        for x in range(5):
            rl, rh = _rotl_pair(clo[:, (x + 1) % 5], chi[:, (x + 1) % 5], 1)
            dlo_cols.append(clo[:, (x + 4) % 5] ^ rl)
            dhi_cols.append(chi[:, (x + 4) % 5] ^ rh)
        dlo = jnp.stack(dlo_cols, axis=1)
        dhi = jnp.stack(dhi_cols, axis=1)
        lo = lo ^ dlo[:, None, :]
        hi = hi ^ dhi[:, None, :]
        # rho + pi: b[(2x+3y)%5, y] = rotl(s[y, x], R[x][y])
        blo = [[None] * 5 for _ in range(5)]
        bhi = [[None] * 5 for _ in range(5)]
        for x in range(5):
            for y in range(5):
                rl, rh = _rotl_pair(lo[:, y, x], hi[:, y, x], _R[x][y])
                blo[(2 * x + 3 * y) % 5][y] = rl
                bhi[(2 * x + 3 * y) % 5][y] = rh
        blo = jnp.stack([jnp.stack(r, axis=1) for r in blo], axis=1)
        bhi = jnp.stack([jnp.stack(r, axis=1) for r in bhi], axis=1)
        # chi
        lo = blo ^ (~jnp.roll(blo, -1, axis=2) & jnp.roll(blo, -2, axis=2))
        hi = bhi ^ (~jnp.roll(bhi, -1, axis=2) & jnp.roll(bhi, -2, axis=2))
        # iota
        lo = lo.at[:, 0, 0].set(lo[:, 0, 0] ^ rc_lo)
        hi = hi.at[:, 0, 0].set(hi[:, 0, 0] ^ rc_hi)
    return lo, hi


def _digest_reduce_pair(lo, hi):
    """u64 digest limbs -> canonical GF (subtract p where >= p)."""
    ge = ((hi == P_HI) & (lo != 0)).astype(jnp.uint32)
    return GF(lo - ge, hi - ge * P_HI)


@partial(jax.jit, static_argnums=(1,))
def _keccak_rows(x: GF, width: int) -> GF:
    """keccak256 of n equal-width u64-lane messages: GF (n, width) ->
    GF (n, 4) canonical digest limbs. Lanes ARE the le64-packed bytes."""
    n = x.shape[0]
    n_blocks = (width * 8) // 136 + 1
    total = n_blocks * _RATE_LANES
    pad_lo = np.zeros(total, dtype=np.uint32)
    pad_hi = np.zeros(total, dtype=np.uint32)
    pad_lo[width] ^= np.uint32(0x01)            # pad10*1 first byte
    pad_hi[total - 1] ^= np.uint32(0x80 << 24)  # final byte 0x80
    lanes_lo = jnp.zeros((n, total), dtype=jnp.uint32) \
        .at[:, :width].set(x.lo) ^ jnp.asarray(pad_lo)
    lanes_hi = jnp.zeros((n, total), dtype=jnp.uint32) \
        .at[:, :width].set(x.hi) ^ jnp.asarray(pad_hi)
    slo = jnp.zeros((n, 25), dtype=jnp.uint32)
    shi = jnp.zeros((n, 25), dtype=jnp.uint32)
    for b in range(n_blocks):
        blk_lo = lanes_lo[:, b * _RATE_LANES:(b + 1) * _RATE_LANES]
        blk_hi = lanes_hi[:, b * _RATE_LANES:(b + 1) * _RATE_LANES]
        slo = slo.at[:, :_RATE_LANES].set(slo[:, :_RATE_LANES] ^ blk_lo)
        shi = shi.at[:, :_RATE_LANES].set(shi[:, :_RATE_LANES] ^ blk_hi)
        slo, shi = keccak_f1600_pair(slo.reshape(n, 5, 5),
                                     shi.reshape(n, 5, 5))
        slo = slo.reshape(n, 25)
        shi = shi.reshape(n, 25)
    return _digest_reduce_pair(slo[:, :4], shi[:, :4])


def hash_rows(leaves: GF) -> GF:
    """Leaf digests: hash_or_noop (<=4 values pass through zero-padded,
    merkle/keccak_host.py law), else keccak256 of the le64 packing."""
    n, width = leaves.shape
    if width <= 4:
        z = GF.zeros((n, 4 - width))
        return GF.concatenate([leaves, z], axis=1) if width < 4 else leaves
    return _keccak_rows(leaves, width)


def compress(level: GF) -> GF:
    """One tree level: keccak256(left_digest || right_digest)."""
    return _keccak_rows(level.reshape(-1, 8), 8)
