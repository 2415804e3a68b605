"""Device NTT / LDE vs exact host oracle."""

import numpy as np

from zk_evm_tpu.field import GF, host
from zk_evm_tpu import ntt
from zk_evm_tpu.ntt import host as hntt

P = host.P
rng = np.random.default_rng(2)


def rand_poly(n):
    return rng.integers(0, P, size=n, dtype=np.uint64)


def test_powers():
    got = ntt.powers(7, 11).to_u64()
    want = [pow(7, i, P) for i in range(11)]
    assert got.tolist() == want


def test_bit_reverse():
    x = rand_poly(16)
    got = ntt.bit_reverse(GF.from_u64(x)).to_u64()
    want = hntt.bit_reverse([int(v) for v in x])
    assert got.tolist() == want
    # involution
    back = ntt.bit_reverse(ntt.bit_reverse(GF.from_u64(x))).to_u64()
    assert back.tolist() == x.tolist()


def test_fft_matches_host():
    for logn in (0, 1, 3, 6, 9):
        n = 1 << logn
        c = rand_poly(n)
        got = ntt.fft(GF.from_u64(c)).to_u64()
        want = hntt.fft([int(v) for v in c])
        assert got.tolist() == want, logn


def test_fft_is_evaluation():
    n = 8
    c = rand_poly(n)
    got = ntt.fft(GF.from_u64(c)).to_u64()
    g = host.primitive_root_of_unity(3)
    for i in range(n):
        x = host.fexp(g, i)
        want = sum(int(c[j]) * pow(x, j, P) for j in range(n)) % P
        assert int(got[i]) == want, i


def test_ifft_roundtrip():
    for logn in (1, 4, 8):
        n = 1 << logn
        c = rand_poly(n)
        back = ntt.ifft(ntt.fft(GF.from_u64(c))).to_u64()
        assert back.tolist() == c.tolist(), logn


def test_coset_fft():
    n = 16
    c = rand_poly(n)
    got = ntt.coset_fft(GF.from_u64(c), 7).to_u64()
    want = hntt.coset_fft([int(v) for v in c], 7)
    assert got.tolist() == want


def test_lde_bitrev():
    n = 32
    v = rand_poly(n)
    got = ntt.lde_bitrev(GF.from_u64(v), rate_bits=1, shift=7).to_u64()
    want = hntt.bit_reverse(hntt.lde([int(x) for x in v], 1, 7))
    assert got.tolist() == want


def test_lde_agrees_on_low_degree():
    # LDE of values of a degree < n polynomial evaluates the same polynomial.
    n = 8
    c = [int(x) for x in rand_poly(n)]
    vals = hntt.fft(c)
    ext = ntt.lde_bitrev(GF.from_u64(np.array(vals, dtype=np.uint64)),
                         rate_bits=2, shift=7).to_u64()
    ext_nat = hntt.bit_reverse([int(x) for x in ext])
    g = host.primitive_root_of_unity(5)
    for i in range(0, 32, 5):
        x = host.fmul(7, host.fexp(g, i))
        want = sum(c[j] * pow(x, j, P) for j in range(n)) % P
        assert int(ext_nat[i]) == want, i


def test_batched_polys():
    n, k = 16, 3
    m = rng.integers(0, P, size=(k, n), dtype=np.uint64)
    got = ntt.fft(GF.from_u64(m)).to_u64()
    for i in range(k):
        want = hntt.fft([int(v) for v in m[i]])
        assert got[i].tolist() == want, i
