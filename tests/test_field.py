"""Device Goldilocks limb arithmetic vs exact python-int ground truth."""

import numpy as np
import pytest

from zk_evm_tpu.field import GF, GFE, host
from zk_evm_tpu.field import goldilocks as gl

P = host.P
rng = np.random.default_rng(0)


def rand_field(n):
    """Random canonical field elements incl. adversarial boundary values."""
    vals = rng.integers(0, P, size=n, dtype=np.uint64)
    specials = np.array(
        [0, 1, 2, P - 1, P - 2, 0xFFFFFFFF, 0x100000000, P >> 1,
         0xFFFFFFFF00000000, 0xFFFFFFFE00000002 % P],
        dtype=np.uint64,
    )
    k = min(len(specials), n)
    vals[:k] = specials[:k]
    return vals


N = 64
A = rand_field(N)
B = rand_field(N)[::-1].copy()


def test_roundtrip():
    x = GF.from_u64(A)
    assert np.array_equal(x.to_u64(), A)


def test_add():
    got = (GF.from_u64(A) + GF.from_u64(B)).to_u64()
    want = [(int(a) + int(b)) % P for a, b in zip(A, B)]
    assert got.tolist() == want


def test_sub():
    got = (GF.from_u64(A) - GF.from_u64(B)).to_u64()
    want = [(int(a) - int(b)) % P for a, b in zip(A, B)]
    assert got.tolist() == want


def test_neg():
    got = (-GF.from_u64(A)).to_u64()
    want = [(-int(a)) % P for a in A]
    assert got.tolist() == want


def test_mul():
    got = (GF.from_u64(A) * GF.from_u64(B)).to_u64()
    want = [(int(a) * int(b)) % P for a, b in zip(A, B)]
    assert got.tolist() == want


def test_mul32():
    import jax.numpy as jnp
    a32 = rng.integers(0, 1 << 32, size=N, dtype=np.uint64).astype(np.uint32)
    b32 = rng.integers(0, 1 << 32, size=N, dtype=np.uint64).astype(np.uint32)
    a32[:3] = [0xFFFFFFFF, 0xFFFFFFFF, 0]
    b32[:3] = [0xFFFFFFFF, 1, 0xFFFFFFFF]
    lo, hi = gl.mul32(jnp.asarray(a32), jnp.asarray(b32))
    got = np.asarray(lo, dtype=np.uint64) | (np.asarray(hi, dtype=np.uint64) << 32)
    want = [(int(a) * int(b)) & ((1 << 64) - 1) for a, b in zip(a32, b32)]
    assert got.tolist() == want


def test_square():
    got = GF.from_u64(A).square().to_u64()
    want = [(int(a) * int(a)) % P for a in A]
    assert got.tolist() == want


def test_mul_small():
    for k in (0, 1, 7, 12345, 65535):
        got = (GF.from_u64(A) * k).to_u64()
        want = [(int(a) * k) % P for a in A]
        assert got.tolist() == want, k


def test_mul_pow2():
    x = GF.from_u64(A)
    for k in (1, 5, 31):
        got = GF(*gl.mul_pow2(x.lo, x.hi, k)).to_u64()
        want = [(int(a) << k) % P for a in A]
        assert got.tolist() == want, k


def test_exp():
    got = GF.from_u64(A).exp(12345).to_u64()
    want = [pow(int(a), 12345, P) for a in A]
    assert got.tolist() == want


def test_inv():
    nz = A.copy()
    nz[nz == 0] = 1
    got = GF.from_u64(nz).inv().to_u64()
    want = [pow(int(a), P - 2, P) for a in nz]
    assert got.tolist() == want


def test_sum():
    x = GF.from_u64(A).reshape(8, 8)
    got = x.sum(axis=1).to_u64()
    want = [sum(int(v) for v in A[i * 8:(i + 1) * 8]) % P for i in range(8)]
    assert got.tolist() == want
    got0 = x.sum(axis=0).to_u64()
    want0 = [sum(int(A[j * 8 + i]) for j in range(8)) % P for i in range(8)]
    assert got0.tolist() == want0
    # non-power-of-two axis
    y = GF.from_u64(A[:30]).reshape(5, 6)
    gots = y.sum(axis=1).to_u64()
    wants = [sum(int(v) for v in A[i * 6:(i + 1) * 6]) % P for i in range(5)]
    assert gots.tolist() == wants


def test_extension_mul_inv():
    a = GFE.from_u64_pair(A, B)
    b = GFE.from_u64_pair(B, A)
    got = a * b
    ga, gb = got.to_u64_pair()
    for i in range(N):
        want = host.emul((int(A[i]), int(B[i])), (int(B[i]), int(A[i])))
        assert (int(ga[i]), int(gb[i])) == want
    # inverse
    nz_a = A.copy()
    nz_a[0] = 1  # avoid (0,0)
    x = GFE.from_u64_pair(nz_a, B)
    prod = x * x.inv()
    pa, pb = prod.to_u64_pair()
    assert pa.tolist() == [1] * N
    assert pb.tolist() == [0] * N


def test_root_of_unity():
    g = host.primitive_root_of_unity(3)
    assert host.fexp(g, 8) == 1
    assert host.fexp(g, 4) == P - 1
    assert host.primitive_root_of_unity(32) == host.POWER_OF_TWO_GENERATOR
    assert host.primitive_root_of_unity(0) == 1


def test_batch_inv():
    xs = [int(a) for a in A]
    xs[5] = 0
    out = host.batch_inv(xs)
    for x, y in zip(xs, out):
        assert (y == 0) if x == 0 else (host.fmul(x, y) == 1)


def test_gf_under_jit():
    import jax

    @jax.jit
    def f(x: GF, y: GF) -> GF:
        return x * y + x.square() - y

    got = f(GF.from_u64(A), GF.from_u64(B)).to_u64()
    want = [(int(a) * int(b) + int(a) ** 2 - int(b)) % P for a, b in zip(A, B)]
    assert got.tolist() == want
