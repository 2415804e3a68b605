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


def test_keccak_merkle_config_roundtrip():
    """Keccak hasher config (the reference's outer
    KeccakGoldilocksConfig twin): tree build + path verification with
    the same shape-enforcing contract as the Poseidon host twin, and
    digests bound to the native keccak256."""
    import numpy as np
    from zk_evm_tpu.field import host
    from zk_evm_tpu.merkle import keccak_host as km
    from zk_evm_tpu.native import keccak256

    rng = np.random.default_rng(17)
    leaves = rng.integers(0, host.P, size=(32, 7), dtype=np.uint64)
    rows = [[int(x) for x in r] for r in leaves]
    levels, cap = km.build_tree(rows, cap_height=2)
    assert len(cap) == 4 and all(len(d) == 4 for d in cap)
    path_len = 3                                   # log2(32) - 2
    for idx in (0, 13, 31):
        path = []
        i = idx
        for lvl in levels[:-1]:
            path.append(lvl[i ^ 1])
            i >>= 1
        assert km.verify_path(rows[idx], idx, path, cap,
                              path_len=path_len)
        assert not km.verify_path(rows[idx], idx, path[:-1], cap,
                                  path_len=path_len)   # truncation
        bad = [list(p) for p in path]
        bad[0][0] ^= 1
        assert not km.verify_path(rows[idx], idx, bad, cap,
                                  path_len=path_len)
    # digest law is exactly keccak256 over LE limbs, reduced mod p
    raw = keccak256(b"".join(int(v).to_bytes(8, "little")
                             for v in rows[0]))
    want = [int.from_bytes(raw[k:k+8], "little") % host.P
            for k in range(0, 32, 8)]
    assert km.hash_or_noop(rows[0]) == want
    # hash_or_noop identity on short leaves (shared with Poseidon config)
    assert km.hash_or_noop([5, 6]) == [5, 6, 0, 0]
