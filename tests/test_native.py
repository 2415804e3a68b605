"""Native host library vs pure-python twins."""

import numpy as np
import pytest

from zk_evm_tpu import native
from zk_evm_tpu.field import host, np_field
from zk_evm_tpu.tables.keccak_sponge import keccak256 as py_keccak256

rng = np.random.default_rng(81)


def test_native_builds():
    assert native.available(), "native/libzkhost.so failed to build"


def test_keccak256_matches():
    for data in (b"", b"abc", bytes(range(200)), rng.bytes(1000)):
        assert native.keccak256(data) == py_keccak256(data)


def test_gl_vec_mul_matches():
    a = rng.integers(0, host.P, size=257, dtype=np.uint64)
    b = rng.integers(0, host.P, size=257, dtype=np.uint64)
    got = native.gl_vec_mul(a, b)
    want = np_field.mul(a, b)
    assert got.tolist() == want.tolist()


def test_gl_suffix_sum_matches():
    a = rng.integers(0, host.P, size=100, dtype=np.uint64)
    got = native.gl_suffix_sum(a)
    acc = 0
    want = [0] * 100
    for i in range(99, -1, -1):
        acc = host.fadd(acc, int(a[i]))
        want[i] = acc
    assert got.tolist() == want
