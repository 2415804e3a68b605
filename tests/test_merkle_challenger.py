"""Device Merkle tree vs host oracle; challenger sanity/determinism."""

import numpy as np

from zk_evm_tpu.field import GF, host
from zk_evm_tpu.merkle import build_tree, host_merkle
from zk_evm_tpu.challenger import Challenger

P = host.P
rng = np.random.default_rng(3)


def test_tree_matches_host_and_paths_verify():
    n, leaf_len, cap_h = 32, 6, 2
    leaves = rng.integers(0, P, size=(n, leaf_len), dtype=np.uint64)
    tree = build_tree(GF.from_u64(leaves), cap_height=cap_h)

    host_leaves = [[int(x) for x in row] for row in leaves]
    _, host_cap = host_merkle.build_tree(host_leaves, cap_h)
    got_cap = [[int(x) for x in row] for row in tree.cap_u64()]
    assert got_cap == host_cap

    for idx in (0, 1, 13, 31):
        path = tree.prove(idx)
        assert len(path) == 3  # log2(32) - cap_height
        assert host_merkle.verify_path(host_leaves[idx], idx, path, got_cap)
        # wrong leaf must fail
        bad = list(host_leaves[idx])
        bad[0] ^= 1
        assert not host_merkle.verify_path(bad, idx, path, got_cap)


def test_narrow_leaves_passthrough():
    n = 16
    leaves = rng.integers(0, P, size=(n, 3), dtype=np.uint64)
    tree = build_tree(GF.from_u64(leaves), cap_height=0)
    host_leaves = [[int(x) for x in row] for row in leaves]
    _, host_cap = host_merkle.build_tree(host_leaves, 0)
    assert [[int(x) for x in r] for r in tree.cap_u64()] == host_cap


def test_challenger_deterministic_and_sensitive():
    c1 = Challenger()
    c1.observe_elements([1, 2, 3])
    a = c1.get_challenge()
    c2 = Challenger()
    c2.observe_elements([1, 2, 3])
    assert c2.get_challenge() == a
    c3 = Challenger()
    c3.observe_elements([1, 2, 4])
    assert c3.get_challenge() != a
    # drawing more challenges permutes eventually, stays deterministic
    assert c1.get_n_challenges(20) == c2.get_n_challenges(20)


def test_challenger_observe_invalidates_output():
    c1 = Challenger()
    c1.observe_elements([5, 6])
    x = c1.get_challenge()
    c1.observe_element(7)
    y = c1.get_challenge()
    c2 = Challenger()
    c2.observe_elements([5, 6])
    c2.get_challenge()
    c2.observe_element(7)
    assert c2.get_challenge() == y
    assert x != y


def test_compact_resumes_transcript():
    c = Challenger()
    c.observe_elements(range(10))
    state = c.compact()
    resumed = Challenger(state)
    fresh = Challenger()
    fresh.observe_elements(range(10))
    fresh.compact()
    assert resumed.get_challenge() == fresh.get_challenge()
