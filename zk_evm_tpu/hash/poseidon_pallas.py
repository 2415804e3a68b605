"""Fused Pallas TPU kernel for the Poseidon permutation.

The jnp composition materializes every round's intermediates in HBM
(~30 rounds x a handful of (B, 12) uint32 arrays — tens of GB of traffic
for a full Merkle leaf hash), which makes commitment hashing bandwidth-
bound an order of magnitude off roofline. This kernel keeps a tile of
states resident in VMEM for all 30 rounds: HBM traffic drops to one
read + one write of the state.

Same math as poseidon.py (which remains the reference implementation and
the CPU-backend path): uint32 limb arithmetic for the field ops, byte-
plane exact-f32 matmul for the small-circulant MDS (rides the MXU), x^7
S-box via the 16-bit-limb multiply. Verified against the exact host twin.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field import GF
from ..field import goldilocks as gl
from . import poseidon_params as pp
from .poseidon import _mds_matrix_np

MASK16 = np.uint32(0xFFFF)
TILE = 1024


def _mds_tile(lo, hi, mat_t):
    """MDS on a (12, T) uint32 pair (lanes on the vector dimension) via
    byte-plane f32 matmuls: out[r, t] = sum_j C[j, r] * in[j, t], i.e.
    C^T @ in, with inputs split into exact byte planes."""
    mask8 = np.uint32(0xFF)
    # Mosaic lacks direct u32<->f32 casts; byte values are < 2^8 so the
    # round-trip through int32 is exact.
    planes = jnp.concatenate([
        lo & mask8, (lo >> 8) & mask8, (lo >> 16) & mask8, lo >> 24,
        hi & mask8, (hi >> 8) & mask8, (hi >> 16) & mask8, hi >> 24,
    ], axis=0).astype(jnp.int32).astype(jnp.float32)  # (8*12, T)
    t = planes.shape[1]
    s = jnp.dot(mat_t, planes.reshape(8, 12, t).swapaxes(0, 1)
                .reshape(12, 8 * t),
                preferred_element_type=jnp.float32) \
        .reshape(12, 8, t).swapaxes(0, 1) \
        .astype(jnp.int32).astype(jnp.uint32)          # (8, 12, T)
    acc = [s[2 * k] + (s[2 * k + 1] << 8) for k in range(4)]  # (12, T)
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
    return gl.reduce128(r0, r1, c3, jnp.zeros_like(c3))


def _sbox7(lo, hi):
    l2, h2 = gl.mul(lo, hi, lo, hi)
    l3, h3 = gl.mul(l2, h2, lo, hi)
    l6, h6 = gl.mul(l3, h3, l3, h3)
    return gl.mul(l6, h6, lo, hi)


def _mds_tile_roll(lo, hi):
    """MDS on a (12, T) uint32 pair via sublane rolls + small-constant
    multiplies on 16-bit limb planes — no casts, no MXU. out[r] =
    sum_i circ[i] * x[(r + i) % 12] + diag[r] * x[r]; products are
    <= 41 * 2^16 and the 12-term accumulation stays < 2^26 per plane.
    Bit-identical to _mds_tile (same carry chain + reduce128)."""
    params = pp.default_params()
    acc = [None] * 4

    def add_term(acc_k, rolled, c, k):
        half = (rolled[k // 2] >> np.uint32(16 * (k % 2))) & MASK16
        term = half * np.uint32(c)
        return term if acc_k is None else acc_k + term

    for i, c in enumerate(params.mds_circ):
        if c == 0:
            continue
        rl = pltpu.roll(lo, 12 - i, 0) if i else lo
        rh = pltpu.roll(hi, 12 - i, 0) if i else hi
        for k in range(4):
            acc[k] = add_term(acc[k], (rl, rh), c, k)
    # diag is (8, 0, ..., 0): add 8*x only on sublane 0 (iota mask — a
    # captured numpy array constant is not allowed in a pallas kernel)
    assert params.mds_diag[1:] == (0,) * 11 and params.mds_diag[0] == 8
    row0 = jax.lax.broadcasted_iota(jnp.uint32, (12, 1), 0) == 0
    for k in range(4):
        half = ((lo, hi)[k // 2] >> np.uint32(16 * (k % 2))) & MASK16
        acc[k] = acc[k] + jnp.where(row0, half << 3, 0)
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
    return gl.reduce128(r0, r1, c3, jnp.zeros_like(c3))


def _rc_limb_tables():
    rcs = pp.round_constants_np()
    return (rcs & np.uint64(0xFFFFFFFF)).astype(np.uint32), \
        (rcs >> np.uint64(32)).astype(np.uint32)


# MDS strategy: "roll" (sublane rolls + small-constant VPU multiplies)
# or "matmul" (byte-plane f32 MXU). Both bit-identical on chip vs the
# exact host twin; roll measured 13.9 vs 12.2 Mperm/s on v5e (the
# 12x12 matmul pads to the 128x128 MXU tile at <1% utilization).
MDS_IMPL = "roll"


def _rounds(lo, hi, rc_lo_tab, rc_hi_tab, mat_t):
    """All 30 Poseidon rounds on a (12, T) uint32 limb pair held in
    registers/VMEM; shared by the permute and fused-sponge kernels."""
    params = pp.default_params()
    h = params.half_full_rounds
    npart = params.n_partial_rounds
    n_rounds = params.n_rounds

    def add_rc(lo, hi, rnd):
        # dynamic lane slices need 128-alignment in Mosaic; select the
        # round's constants by masked reduction instead
        mask = jax.lax.broadcasted_iota(jnp.uint32, (1, n_rounds), 1) \
            == rnd
        # unsigned reductions unsupported: reduce as int32 (bit-identical)
        rcl = jnp.sum(jnp.where(mask, rc_lo_tab.astype(jnp.int32), 0),
                      axis=1, keepdims=True).astype(jnp.uint32)
        rch = jnp.sum(jnp.where(mask, rc_hi_tab.astype(jnp.int32), 0),
                      axis=1, keepdims=True).astype(jnp.uint32)
        return gl.add(lo, hi, rcl, rch)

    # fori_loop bodies keep the Mosaic program small (compile time for the
    # 30 unrolled rounds is minutes; looped it is seconds)
    mds = (lambda lo, hi: _mds_tile_roll(lo, hi)) \
        if MDS_IMPL == "roll" else \
        (lambda lo, hi: _mds_tile(lo, hi, mat_t))

    def full_round(rnd, carry):
        lo, hi = carry
        lo, hi = add_rc(lo, hi, rnd)
        lo, hi = _sbox7(lo, hi)
        lo, hi = mds(lo, hi)
        return (lo, hi)

    def partial_round(rnd, carry):
        lo, hi = carry
        lo, hi = add_rc(lo, hi, rnd)
        s0l, s0h = _sbox7(lo[:1, :], hi[:1, :])
        lo = jnp.concatenate([s0l, lo[1:, :]], axis=0)
        hi = jnp.concatenate([s0h, hi[1:, :]], axis=0)
        lo, hi = mds(lo, hi)
        return (lo, hi)

    lo, hi = jax.lax.fori_loop(0, h, full_round, (lo, hi))
    lo, hi = jax.lax.fori_loop(h, h + npart, partial_round, (lo, hi))
    lo, hi = jax.lax.fori_loop(h + npart, 2 * h + npart, full_round,
                               (lo, hi))
    return lo, hi


def _permute_kernel(rc_lo_ref, rc_hi_ref, mat_t_ref,
                    lo_ref, hi_ref, out_lo_ref, out_hi_ref):
    lo, hi = _rounds(lo_ref[:], hi_ref[:], rc_lo_ref[:], rc_hi_ref[:],
                     mat_t_ref[:])
    out_lo_ref[:] = lo
    out_hi_ref[:] = hi


@lru_cache(maxsize=32)
def _permute_call(batch: int, interpret: bool):
    grid = (batch // TILE,)
    spec = pl.BlockSpec((12, TILE), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    n_rounds = pp.default_params().n_rounds
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _permute_kernel,
        grid=grid,
        in_specs=[const((12, n_rounds)), const((12, n_rounds)),
                  const((12, 12)), spec, spec],
        out_specs=(spec, spec),
        out_shape=(jax.ShapeDtypeStruct((12, batch), jnp.uint32),
                   jax.ShapeDtypeStruct((12, batch), jnp.uint32)),
        interpret=interpret,
    )


@jax.jit
def _permute_pallas_jit(lo, hi, rc_lo, rc_hi, mat_t):
    b = lo.shape[0]
    olo, ohi = _permute_call(b, False)(rc_lo, rc_hi, mat_t, lo.T, hi.T)
    return olo.T, ohi.T


def permute_pallas(state: GF, interpret: bool = False) -> GF:
    """Poseidon permutation over a (B, 12) GF state, B a multiple of
    TILE (pad externally or use the jnp path for ragged batches)."""
    b = state.shape[0]
    assert b % TILE == 0, (b, TILE)
    rc_lo, rc_hi = _rc_limb_tables()
    if interpret:
        olo, ohi = _permute_call(b, True)(
            jnp.asarray(rc_lo.T.copy()), jnp.asarray(rc_hi.T.copy()),
            jnp.asarray(_mds_matrix_np().T.copy()),
            state.lo.T, state.hi.T)
        return GF(olo.T, ohi.T)
    lo, hi = _permute_pallas_jit(
        state.lo, state.hi, jnp.asarray(rc_lo.T.copy()),
        jnp.asarray(rc_hi.T.copy()),
        jnp.asarray(_mds_matrix_np().T.copy()))
    return GF(lo, hi)


def available(batch: int) -> bool:
    return batch % TILE == 0 and jax.default_backend() not in ("cpu",)


# ---------------------------------------------------------------------------
# Fused sponge: hash whole Merkle leaves (rows of a trace LDE) with the
# sponge state resident in VMEM across ALL absorb chunks. The scanned jnp
# sponge (poseidon.hash_rows) round-trips the (B, 12) state through HBM and
# relaunches the permutation per 8-column chunk; for a 64-column leaf that
# is 8 kernel dispatches and 16 extra state transfers. Here the grid is
# (row_tiles, chunks) with chunks innermost: the state scratch persists
# across chunk steps, so HBM traffic is exactly one read of the leaf
# matrix + one write of the digests.

def _sponge_kernel(last_limit, rc_lo_ref, rc_hi_ref, mat_t_ref,
                   clo_ref, chi_ref, out_lo_ref, out_hi_ref,
                   slo_ref, shi_ref):
    c = pl.program_id(1)
    n_chunks = pl.num_programs(1)

    @pl.when(c == 0)
    def _init():
        zero = jnp.zeros((pp.WIDTH, TILE), jnp.uint32)
        slo_ref[:] = zero
        shi_ref[:] = zero

    # overwrite-mode absorb: rows < limit take the chunk, the rest keep
    # the running state (matches poseidon.hash_rows exactly, including the
    # trailing partial chunk where limit = n_cols % 8)
    limit = jnp.where(c == n_chunks - 1, np.uint32(last_limit),
                      np.uint32(pp.RATE))
    mask = jax.lax.broadcasted_iota(jnp.uint32, (pp.WIDTH, 1), 0) < limit
    lo = jnp.where(mask, jnp.concatenate([clo_ref[:], slo_ref[8:, :]],
                                         axis=0), slo_ref[:])
    hi = jnp.where(mask, jnp.concatenate([chi_ref[:], shi_ref[8:, :]],
                                         axis=0), shi_ref[:])
    lo, hi = _rounds(lo, hi, rc_lo_ref[:], rc_hi_ref[:], mat_t_ref[:])
    slo_ref[:] = lo
    shi_ref[:] = hi

    @pl.when(c == n_chunks - 1)
    def _emit():
        out_lo_ref[:] = lo[:4, :]
        out_hi_ref[:] = hi[:4, :]


@lru_cache(maxsize=32)
def _sponge_call(n_rows: int, n_chunks: int, last_limit: int,
                 interpret: bool):
    from functools import partial
    grid = (n_rows // TILE, n_chunks)
    chunk_spec = pl.BlockSpec((pp.RATE, TILE), lambda i, c: (c, i),
                              memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((4, TILE), lambda i, c: (0, i),
                            memory_space=pltpu.VMEM)
    n_rounds = pp.default_params().n_rounds
    const = lambda shape: pl.BlockSpec(shape, lambda i, c: (0, 0),
                                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_sponge_kernel, last_limit),
        grid=grid,
        in_specs=[const((12, n_rounds)), const((12, n_rounds)),
                  const((12, 12)), chunk_spec, chunk_spec],
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((4, n_rows), jnp.uint32),
                   jax.ShapeDtypeStruct((4, n_rows), jnp.uint32)),
        scratch_shapes=[pltpu.VMEM((pp.WIDTH, TILE), jnp.uint32),
                        pltpu.VMEM((pp.WIDTH, TILE), jnp.uint32)],
        interpret=interpret,
    )


def sponge_pallas(matrix_t: GF, interpret: bool = False) -> GF:
    """Digests of the COLUMNS of a (n_cols, n_rows) GF matrix: returns
    (n_rows, 4), bit-identical to poseidon.hash_rows(matrix_t.T). Callers
    that hold the LDE in (polys, points) layout pass it directly — under
    jit their .T and ours cancel, so no transpose is materialized."""
    n_cols, n_rows = matrix_t.shape
    assert n_rows % TILE == 0 and n_cols > 4, (matrix_t.shape,)
    n_chunks = -(-n_cols // pp.RATE)
    rem = n_cols % pp.RATE
    last_limit = rem if rem else pp.RATE
    pad_rows = n_chunks * pp.RATE - n_cols
    if pad_rows:
        matrix_t = GF.concatenate(
            [matrix_t, GF.zeros((pad_rows, n_rows))], axis=0)
    rc_lo, rc_hi = _rc_limb_tables()
    olo, ohi = _sponge_call(n_rows, n_chunks, last_limit, interpret)(
        jnp.asarray(rc_lo.T.copy()), jnp.asarray(rc_hi.T.copy()),
        jnp.asarray(_mds_matrix_np().T.copy()),
        matrix_t.lo, matrix_t.hi)
    return GF(olo.T, ohi.T)


def sponge_available(n_rows: int, n_cols: int) -> bool:
    return (n_rows % TILE == 0 and n_cols > 4
            and jax.default_backend() not in ("cpu",))
