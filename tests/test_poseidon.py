"""Device Poseidon vs exact python-int twin."""

import numpy as np

from zk_evm_tpu.field import GF, host
from zk_evm_tpu.hash import host_poseidon as hp
from zk_evm_tpu.hash import poseidon as dp
from zk_evm_tpu.hash import poseidon_params as pp

P = host.P
rng = np.random.default_rng(1)


def rand_states(n):
    v = rng.integers(0, P, size=(n, pp.WIDTH), dtype=np.uint64)
    v[0] = 0
    v[1] = P - 1
    return v


def test_round_constants_deterministic():
    a = pp.derive_round_constants()
    assert len(a) == pp.N_ROUNDS * pp.WIDTH
    assert all(0 <= c < P for c in a)
    assert a == pp.derive_round_constants()
    assert len(set(a)) == len(a)  # no repeats (overwhelmingly likely)


def test_permute_matches_host():
    states = rand_states(16)
    got = dp.permute(GF.from_u64(states)).to_u64()
    for i in range(16):
        want = hp.permute([int(x) for x in states[i]])
        assert got[i].tolist() == want, i


def test_hash_rows_matches_host():
    for n_cols in (3, 4, 5, 8, 9, 16, 23):
        m = rng.integers(0, P, size=(7, n_cols), dtype=np.uint64)
        got = dp.hash_rows(GF.from_u64(m)).to_u64()
        for i in range(7):
            want = hp.hash_or_noop([int(x) for x in m[i]])
            assert got[i].tolist() == want, (n_cols, i)


def test_compress_matches_host():
    l = rng.integers(0, P, size=(9, 4), dtype=np.uint64)
    r = rng.integers(0, P, size=(9, 4), dtype=np.uint64)
    got = dp.compress(GF.from_u64(l), GF.from_u64(r)).to_u64()
    for i in range(9):
        want = hp.two_to_one([int(x) for x in l[i]], [int(x) for x in r[i]])
        assert got[i].tolist() == want, i


def test_permute_under_jit():
    import jax

    states = rand_states(4)
    got = jax.jit(dp.permute)(GF.from_u64(states)).to_u64()
    want = hp.permute([int(x) for x in states[2]])
    assert got[2].tolist() == want
