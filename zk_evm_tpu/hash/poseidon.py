"""Batched Poseidon permutation on device (JAX, uint32 limbs).

The state is a ``GF`` array of shape ``(..., 12)``; all leading dimensions are
batch dimensions, so one call hashes an entire Merkle level / leaf matrix.
Everything is elementwise VPU work that fuses under jit.

The MDS multiply exploits the small circulant structure (entries <= 41): each
input element is split into 4x16-bit limbs and the matrix-vector product is an
exact uint32 integer accumulation (max ~2^24 per limb lane), followed by one
carry propagation and a single 128->64 Goldilocks reduction per element —
no general field multiplies. This is the TPU-native counterpart of the
reference's scalar `mds_row_shf` loops (plonky2 Poseidon; used for every
commitment at /root/reference/evm_arithmetization/src/prover.rs:100-111).
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp

from ..field import GF
from ..field import goldilocks as gl
from . import poseidon_params as pp

MASK16 = np.uint32(0xFFFF)


def _rc_gf() -> GF:
    """(n_rounds, 12) round-constant table as a GF array. Built from the
    cached numpy table at every call site — never cache GF/jnp values, they
    may be tracers if constructed under an ambient jit trace."""
    return GF.from_u64(pp.round_constants_np())


@lru_cache(maxsize=1)
def _mds_matrix_np() -> np.ndarray:
    """(12, 12) float32 coefficient matrix C with out = in @ C:
    C[j][r] = circ[(j - r) mod 12] + diag[r]*(j == r)."""
    params = pp.default_params()
    w = params.width
    c = np.zeros((w, w), dtype=np.float32)
    for r in range(w):
        for j in range(w):
            c[j, r] = params.mds_circ[(j - r) % w]
        c[r, r] += params.mds_diag[r]
    return c


def _mds(state: GF) -> GF:
    """Circulant-MDS multiply along the last axis (size 12).

    TPU path: each element splits into 8 bytes; each byte-plane multiplies
    the small coefficient matrix as an exact float32 matmul (products <=
    255*41, sums <= 2^17 — well inside f32's 24-bit exactness window), so
    the whole MDS rides the MXU. CPU path (tests): 16-bit-limb
    roll-accumulate — XLA-CPU compiles tiny-K dots inside scan bodies
    pathologically slowly. Both paths produce identical field elements
    (the TPU path is checked against the exact host twin in /verify)."""
    params = pp.default_params()
    lo, hi = state.lo, state.hi
    if jax.default_backend() == "cpu":
        limbs = (lo & MASK16, lo >> 16, hi & MASK16, hi >> 16)
        acc4 = [None] * 4
        for i, c in enumerate(params.mds_circ):
            cc = np.uint32(c)
            for k in range(4):
                term = jnp.roll(limbs[k], -i, axis=-1) * cc
                acc4[k] = term if acc4[k] is None else acc4[k] + term
        diag = np.array(params.mds_diag, dtype=np.uint32)
        acc = [acc4[k] + limbs[k] * diag for k in range(4)]
    else:
        mask8 = np.uint32(0xFF)
        planes = jnp.stack([
            (lo & mask8), (lo >> 8) & mask8, (lo >> 16) & mask8, lo >> 24,
            (hi & mask8), (hi >> 8) & mask8, (hi >> 16) & mask8, hi >> 24,
        ], axis=0).astype(jnp.float32)                  # (8, ..., 12)
        mat = jnp.asarray(_mds_matrix_np())
        flat = planes.reshape(-1, planes.shape[-1])     # 2D GEMM shape
        s = jnp.dot(flat, mat, preferred_element_type=jnp.float32) \
            .reshape(planes.shape).astype(jnp.uint32)
        # w_k = s_{2k} + s_{2k+1} * 256  (< 2^26), k = 0..3
        acc = [s[2 * k] + (s[2 * k + 1] << 8) for k in range(4)]
    # carry-propagate 4x~26-bit limb sums into a 96-bit value, then reduce.
    t0 = acc[0] & MASK16
    c0 = acc[0] >> 16
    s1 = acc[1] + c0
    t1 = s1 & MASK16
    c1 = s1 >> 16
    s2 = acc[2] + c1
    t2 = s2 & MASK16
    c2 = s2 >> 16
    s3 = acc[3] + c2
    t3 = s3 & MASK16
    c3 = s3 >> 16
    r0 = t0 | (t1 << 16)
    r1 = t2 | (t3 << 16)
    return GF(*gl.reduce128(r0, r1, c3, jnp.zeros_like(c3)))


def _sbox7(x: GF) -> GF:
    x2 = x.square()
    x3 = x2 * x
    return x3.square() * x


@jax.jit
def permute(state: GF) -> GF:
    """Poseidon permutation over a (..., 12) GF state.

    Large 2D batches on TPU route to the fused Pallas kernel (state
    resident in VMEM for all 30 rounds); other shapes/backends use the
    scanned jnp path below (one full-round body + one partial-round body,
    so compile time stays flat no matter how often permute is inlined)."""
    if (state.ndim == 2 and jax.default_backend() not in ("cpu",)):
        from . import poseidon_dense as pdense
        if state.shape[0] % pdense.TILE == 0:
            return pdense.permute_dense(state)
    params = pp.default_params()
    rcs = _rc_gf()
    h = params.half_full_rounds
    np_ = params.n_partial_rounds

    def full_round(s: GF, rc: GF):
        return _mds(_sbox7(s + rc)), None

    def partial_round(s: GF, rc: GF):
        s = s + rc
        x0 = _sbox7(s[..., :1])
        s = GF.concatenate([x0, s[..., 1:]], axis=-1)
        return _mds(s), None

    state, _ = jax.lax.scan(full_round, state, rcs[:h])
    state, _ = jax.lax.scan(partial_round, state, rcs[h:h + np_])
    state, _ = jax.lax.scan(full_round, state, rcs[h + np_:])
    return state


@jax.jit
def hash_rows(matrix: GF) -> GF:
    """Hash each row of a (n_rows, n_cols) GF matrix to a 4-element digest.

    Overwrite-mode sponge, rate 8; rows with <= 4 columns are zero-padded
    passthrough digests (leaf `hash_or_noop` semantics). Full rate-8 chunks
    absorb under one lax.scan (compile time flat in column count — the
    Keccak table has 2,431 columns); a trailing partial chunk gets one more
    permutation outside the scan.
    """
    n_rows, n_cols = matrix.shape
    if n_cols <= 4:
        pad = GF.zeros((n_rows, 4 - n_cols))
        return GF.concatenate([matrix, pad], axis=1)
    if jax.default_backend() not in ("cpu",):
        from . import poseidon_dense as pdense
        if n_rows % pdense.TILE == 0:
            # fused-sponge kernel: state registerized across all absorb
            # chunks; the .T here cancels with callers that pass lde.T
            return pdense.sponge_dense(matrix.T)
    state = GF.zeros((n_rows, pp.WIDTH))
    n_full = n_cols // pp.RATE
    rem = n_cols % pp.RATE
    if n_full:
        chunks = matrix[:, :n_full * pp.RATE] \
            .reshape(n_rows, n_full, pp.RATE) \
            .transpose(1, 0, 2)                   # (n_full, n_rows, 8)

        def absorb(s: GF, chunk: GF):
            s = GF.concatenate([chunk, s[:, pp.RATE:]], axis=1)
            return permute(s), None

        state, _ = jax.lax.scan(absorb, state, chunks)
    if rem:
        tail = matrix[:, n_full * pp.RATE:]
        state = GF.concatenate([tail, state[:, rem:]], axis=1)
        state = permute(state)
    return state[:, :4]


@jax.jit
def compress(left: GF, right: GF) -> GF:
    """Batched two-to-one compression: (..., 4) x (..., 4) -> (..., 4)."""
    batch = left.shape[:-1]
    zeros = GF.zeros(batch + (pp.WIDTH - 8,))
    state = GF.concatenate([left, right, zeros], axis=-1)
    return permute(state)[..., :4]
