"""Dense registerized Pallas Poseidon kernel vs exact host twin
(interpret mode on the CPU test backend; the compiled path is the
default device dispatch in poseidon.permute/hash_rows and is exercised
by /verify on the real chip). Also covers the non-canonical field ops
the kernel's S-box chain relies on."""

import numpy as np

from zk_evm_tpu.field import GF, host
from zk_evm_tpu.field import goldilocks as gl
from zk_evm_tpu.hash import poseidon_dense as pd
from zk_evm_tpu.hash import host_poseidon as hp

rng = np.random.default_rng(92)


def test_nc_field_ops_exact():
    """mul_nc/square_nc accept any < 2^64 operands and return values
    < 2^64 congruent mod p; square == mul(x, x) canonically."""
    a = rng.integers(0, 2**64, size=1024, dtype=np.uint64)
    b = rng.integers(0, 2**64, size=1024, dtype=np.uint64)
    a[:2] = [host.P, 2**64 - 1]
    alo, ahi = gl.from_u64(a)
    blo, bhi = gl.from_u64(b)
    got = gl.to_u64(*gl.mul_nc(alo, ahi, blo, bhi))
    assert int(got.max()) < 2**64
    for g, x, y in zip(got[:64], a[:64], b[:64]):
        assert int(g) % host.P == (int(x) * int(y)) % host.P
    gots = gl.to_u64(*gl.square_nc(alo, ahi))
    for g, x in zip(gots[:64], a[:64]):
        assert int(g) % host.P == (int(x) * int(x)) % host.P
    gc = gl.to_u64(*gl.square(alo, ahi))
    for g, x in zip(gc[:64], a[:64]):
        assert int(g) == (int(x) * int(x)) % host.P


def test_dense_permute_interpret_matches_host():
    st = rng.integers(0, host.P, size=(pd.TILE, 12), dtype=np.uint64)
    st[0] = 0
    st[1] = host.P - 1
    out = pd.permute_dense(GF.from_u64(st), interpret=True).to_u64()
    for i in (0, 1, 7, pd.TILE - 1):
        assert out[i].tolist() == hp.permute([int(x) for x in st[i]]), i


def test_dense_permute_best_tile_batch():
    """A batch divisible by BEST_TILE routes through the wider tile and
    must stay bit-identical."""
    b = pd.BEST_TILE
    st = rng.integers(0, host.P, size=(b, 12), dtype=np.uint64)
    out = pd.permute_dense(GF.from_u64(st), interpret=True).to_u64()
    for i in (0, b // 2, b - 1):
        assert out[i].tolist() == hp.permute([int(x) for x in st[i]]), i


def test_dense_sponge_interpret_matches_hash_rows(monkeypatch):
    """Dense fused sponge == scanned jnp sponge for a multi-chunk leaf
    a multi-chunk width (17), a ragged
    width (13) and a single-partial width (6); the 64-column bench shape
    runs compiled on the chip. Interpret mode emulates every lane op in
    python, so the tile gate shrinks to keep the suite fast — the
    compiled kernel at full tile is exercised on the chip by /verify
    and bench.py."""
    from zk_evm_tpu.hash import poseidon

    monkeypatch.setattr(pd, "TILE", 128)
    monkeypatch.setattr(pd, "BEST_TILE", 128)
    pd._sponge_call.cache_clear()
    try:
        for n_cols in (17, 13, 6):
            mat = rng.integers(0, host.P, size=(128, n_cols),
                               dtype=np.uint64)
            want = poseidon.hash_rows(GF.from_u64(mat)).to_u64()
            got = pd.sponge_dense(GF.from_u64(mat.T.copy()),
                                  interpret=True).to_u64()
            assert got.tolist() == want.tolist(), n_cols
    finally:
        pd._sponge_call.cache_clear()
