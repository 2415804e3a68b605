"""Dense-layout fused Pallas Poseidon kernel (round-4 rewrite).

The round-3 kernel (poseidon_pallas.py) keeps the state as a (12, T)
tile: the 12-element state dimension sits on sublanes, so every op pads
12 rows onto 16 sublanes (25% waste), the circulant MDS needs 12
cross-tile sublane rolls per round, and the partial-round S-box runs on
a (1, T) slice at 1/8 sublane occupancy. ROOFLINE.md measured it ~5.5x
off the VPU ceiling and named the layout as lever #1.

Here the state is *registerized*: 12 state elements x 2 uint32 limbs
live as 24 independent (8, 128)-shaped register tiles, each holding
TILE=1024 distinct states fully dense on lanes AND sublanes. The MDS
becomes straight-line per-output-row accumulation over 16-bit planes
(small-circulant constants <= 41, products exact in uint32) — no rolls,
no masks, no MXU. Round constants load as SMEM scalars indexed by the
fori_loop round counter. S-boxes use 3-mul32 squaring and skip
canonicalization between chained multiplies (values stay < 2^64 and
the MDS reduce canonicalizes each round).

Protocol-identical to poseidon.permute / poseidon.hash_rows (checked
bit-exact against the python-int host twin); the permutation itself
follows plonky2's PoseidonGoldilocksConfig shape (reference usage:
/root/reference/evm_arithmetization/src/prover.rs:100-111).
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field import GF
from ..field import goldilocks as gl
from . import poseidon_params as pp

MASK16 = np.uint32(0xFFFF)
TILE = 1024          # minimum states per grid step (availability gate)
BEST_TILE = 2048     # preferred tile: 16 sublanes x 128 lanes (measured
                     # fastest on v5e; 1024 and 4096 within ~5%)
W = pp.WIDTH


def _pick_tile(batch: int) -> int:
    return BEST_TILE if batch % BEST_TILE == 0 else TILE


def _sbox7_nc(lo, hi):
    """x^7 on a limb-pair tile; accepts/returns non-canonical < 2^64."""
    l2, h2 = gl.square_nc(lo, hi)
    l3, h3 = gl.mul_nc(l2, h2, lo, hi)
    l6, h6 = gl.square_nc(l3, h3)
    return gl.mul_nc(l6, h6, lo, hi)


def _mds_dense(los, his):
    """Circulant MDS on 12 registerized elements (values < 2^64 accepted:
    the integer accumulation is linear, so +p offsets reduce away).
    Returns canonical outputs. out[r] = sum_i circ[i]*x[(r+i)%12]
    (+ 8*x[0] for r=0), matching poseidon._mds exactly."""
    params = pp.default_params()
    circ = params.mds_circ
    assert params.mds_diag == (8,) + (0,) * 11
    planes = [
        [lo & MASK16 for lo in los],
        [lo >> 16 for lo in los],
        [hi & MASK16 for hi in his],
        [hi >> 16 for hi in his],
    ]
    out_los, out_his = [], []
    for r in range(W):
        acc = [None] * 4
        for i, c in enumerate(circ):
            j = (r + i) % W
            cc = np.uint32(c)
            for k in range(4):
                term = planes[k][j] * cc
                acc[k] = term if acc[k] is None else acc[k] + term
        if r == 0:
            for k in range(4):
                acc[k] = acc[k] + (planes[k][0] << 3)
        # 4x <=2^26 plane sums -> 96-bit value -> one Goldilocks reduce
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
        rlo, rhi = gl.reduce128(t0 | (t1 << 16), t2 | (t3 << 16), c3,
                                jnp.zeros_like(c3))
        out_los.append(rlo)
        out_his.append(rhi)
    return out_los, out_his


def _rounds_dense(los, his, rc_lo_ref, rc_hi_ref):
    """All 30 rounds on registerized state; RCs are SMEM scalar loads."""
    params = pp.default_params()
    h = params.half_full_rounds
    npart = params.n_partial_rounds

    def add_rc(los, his, rnd):
        out_l, out_h = [], []
        for j in range(W):
            l, hh = gl.add(los[j], his[j], rc_lo_ref[rnd, j],
                           rc_hi_ref[rnd, j])
            out_l.append(l)
            out_h.append(hh)
        return out_l, out_h

    def full_round(rnd, carry):
        los = list(carry[:W])
        his = list(carry[W:])
        los, his = add_rc(los, his, rnd)
        for j in range(W):
            los[j], his[j] = _sbox7_nc(los[j], his[j])
        los, his = _mds_dense(los, his)
        return tuple(los) + tuple(his)

    def partial_round(rnd, carry):
        los = list(carry[:W])
        his = list(carry[W:])
        los, his = add_rc(los, his, rnd)
        los[0], his[0] = _sbox7_nc(los[0], his[0])
        los, his = _mds_dense(los, his)
        return tuple(los) + tuple(his)

    carry = tuple(los) + tuple(his)
    carry = jax.lax.fori_loop(0, h, full_round, carry)
    carry = jax.lax.fori_loop(h, h + npart, partial_round, carry)
    carry = jax.lax.fori_loop(h + npart, 2 * h + npart, full_round, carry)
    return list(carry[:W]), list(carry[W:])


def _permute_kernel(rc_lo_ref, rc_hi_ref, lo_ref, hi_ref,
                    olo_ref, ohi_ref):
    los = [lo_ref[j] for j in range(W)]
    his = [hi_ref[j] for j in range(W)]
    los, his = _rounds_dense(los, his, rc_lo_ref, rc_hi_ref)
    for j in range(W):
        olo_ref[j] = los[j]
        ohi_ref[j] = his[j]


@lru_cache(maxsize=32)
def _permute_call(batch: int, interpret: bool):
    tile = _pick_tile(batch)
    grid = (batch // tile,)
    spec = pl.BlockSpec((W, tile // 128, 128), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    return pl.pallas_call(
        _permute_kernel,
        grid=grid,
        in_specs=[smem, smem, spec, spec],
        out_specs=(spec, spec),
        out_shape=(jax.ShapeDtypeStruct((W, batch // 128, 128), jnp.uint32),
                   jax.ShapeDtypeStruct((W, batch // 128, 128), jnp.uint32)),
        interpret=interpret,
    )


def _rc_tables():
    rcs = pp.round_constants_np()        # (30, 12) uint64
    return ((rcs & np.uint64(0xFFFFFFFF)).astype(np.uint32),
            (rcs >> np.uint64(32)).astype(np.uint32))


@partial(jax.jit, static_argnames=("interpret",))
def _permute_dense_jit(lo, hi, rc_lo, rc_hi, interpret=False):
    b = lo.shape[0]
    lo3 = lo.T.reshape(W, b // 128, 128)
    hi3 = hi.T.reshape(W, b // 128, 128)
    olo, ohi = _permute_call(b, interpret)(rc_lo, rc_hi, lo3, hi3)
    return (olo.reshape(W, b).T, ohi.reshape(W, b).T)


def permute_dense(state: GF, interpret: bool = False) -> GF:
    """Poseidon permutation over a (B, 12) GF state, B % TILE == 0."""
    b = state.shape[0]
    assert b % TILE == 0, (b, TILE)
    rc_lo, rc_hi = _rc_tables()
    lo, hi = _permute_dense_jit(state.lo, state.hi, jnp.asarray(rc_lo),
                                jnp.asarray(rc_hi), interpret=interpret)
    return GF(lo, hi)


# ---------------------------------------------------------------------------
# Fused sponge: state registerized across ALL absorb chunks; grid is
# (row_tiles, chunks) with chunks innermost so the VMEM scratch state
# persists across chunk steps. HBM traffic = one read of the leaf
# matrix + one write of the digests.
# ---------------------------------------------------------------------------

def _sponge_kernel(last_limit, rc_lo_ref, rc_hi_ref, clo_ref, chi_ref,
                   out_lo_ref, out_hi_ref, slo_ref, shi_ref):
    tile_sub = slo_ref.shape[1]
    c = pl.program_id(1)
    n_chunks = pl.num_programs(1)

    @pl.when(c == 0)
    def _init():
        zero = jnp.zeros((W, tile_sub, 128), jnp.uint32)
        slo_ref[:] = zero
        shi_ref[:] = zero

    last = c == n_chunks - 1
    los, his = [], []
    # overwrite-mode absorb: element j takes the chunk column except when
    # this is the (possibly partial) last chunk and j >= last_limit
    for j in range(pp.RATE):
        if j < last_limit:
            los.append(clo_ref[j])
            his.append(chi_ref[j])
        else:
            los.append(jnp.where(last, slo_ref[j], clo_ref[j]))
            his.append(jnp.where(last, shi_ref[j], chi_ref[j]))
    for j in range(pp.RATE, W):
        los.append(slo_ref[j])
        his.append(shi_ref[j])

    los, his = _rounds_dense(los, his, rc_lo_ref, rc_hi_ref)
    for j in range(W):
        slo_ref[j] = los[j]
        shi_ref[j] = his[j]

    @pl.when(last)
    def _emit():
        for e in range(4):
            out_lo_ref[e] = los[e]
            out_hi_ref[e] = his[e]


@lru_cache(maxsize=32)
def _sponge_call(n_rows: int, n_chunks: int, last_limit: int,
                 interpret: bool):
    tile = _pick_tile(n_rows)
    grid = (n_rows // tile, n_chunks)
    chunk_spec = pl.BlockSpec((pp.RATE, tile // 128, 128),
                              lambda i, c: (c, i, 0),
                              memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((4, tile // 128, 128), lambda i, c: (0, i, 0),
                            memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    return pl.pallas_call(
        partial(_sponge_kernel, last_limit),
        grid=grid,
        in_specs=[smem, smem, chunk_spec, chunk_spec],
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((4, n_rows // 128, 128), jnp.uint32),
            jax.ShapeDtypeStruct((4, n_rows // 128, 128), jnp.uint32)),
        scratch_shapes=[pltpu.VMEM((W, tile // 128, 128), jnp.uint32),
                        pltpu.VMEM((W, tile // 128, 128), jnp.uint32)],
        interpret=interpret,
    )


@partial(jax.jit, static_argnames=("interpret",))
def _sponge_dense_jit(mlo, mhi, rc_lo, rc_hi, interpret=False):
    n_cols, n_rows = mlo.shape
    n_chunks = -(-n_cols // pp.RATE)
    rem = n_cols % pp.RATE
    last_limit = rem if rem else pp.RATE
    pad = n_chunks * pp.RATE - n_cols
    if pad:
        mlo = jnp.concatenate(
            [mlo, jnp.zeros((pad, n_rows), jnp.uint32)], axis=0)
        mhi = jnp.concatenate(
            [mhi, jnp.zeros((pad, n_rows), jnp.uint32)], axis=0)
    lo3 = mlo.reshape(n_chunks * pp.RATE, n_rows // 128, 128)
    hi3 = mhi.reshape(n_chunks * pp.RATE, n_rows // 128, 128)
    olo, ohi = _sponge_call(n_rows, n_chunks, last_limit, interpret)(
        rc_lo, rc_hi, lo3, hi3)
    return olo.reshape(4, n_rows).T, ohi.reshape(4, n_rows).T


def sponge_dense(matrix_t: GF, interpret: bool = False) -> GF:
    """Digests of the COLUMNS of a (n_cols, n_rows) GF matrix: returns
    (n_rows, 4), bit-identical to poseidon.hash_rows(matrix_t.T)."""
    n_cols, n_rows = matrix_t.shape
    assert n_rows % TILE == 0 and n_cols > 4, (matrix_t.shape,)
    rc_lo, rc_hi = _rc_tables()
    lo, hi = _sponge_dense_jit(matrix_t.lo, matrix_t.hi,
                               jnp.asarray(rc_lo), jnp.asarray(rc_hi),
                               interpret=interpret)
    return GF(lo, hi)
