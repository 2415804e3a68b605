"""Keccak Merkle commitment config (StarkConfig.hasher="keccak") — the
twin of the reference's KeccakGoldilocksConfig outer config (plonky2;
used by every evm_arithmetization integration test, e.g.
tests/simple_transfer.rs:24,30 `type C = KeccakGoldilocksConfig`)."""

import numpy as np
import pytest

from zk_evm_tpu.challenger import Challenger
from zk_evm_tpu.stark import StarkConfig, FriConfig, prove_stark, verify_stark


def _cfg(hasher):
    return StarkConfig(
        security_bits=1,
        fri_config=FriConfig(rate_bits=1, cap_height=1,
                             proof_of_work_bits=0, num_query_rounds=2,
                             arity_bits=2, final_poly_bits=2),
        hasher=hasher)


def test_keccak256_batch_vs_native():
    from zk_evm_tpu.hash.keccak_np import keccak256_batch
    from zk_evm_tpu.native import keccak256
    rng = np.random.default_rng(5)
    for L in (0, 1, 135, 136, 137, 512):
        msgs = rng.integers(0, 256, size=(5, L), dtype=np.uint8)
        got = keccak256_batch(msgs)
        for i in range(5):
            assert got[i].tobytes() == keccak256(msgs[i].tobytes()), (L, i)
    # published vector: keccak256('')
    assert keccak256_batch(np.zeros((1, 0), np.uint8))[0].tobytes().hex() \
        == ("c5d2460186f7233c927e7db2dcc703c0"
            "e500b653ca82273b7bfad8045d85a470")


def test_keccak_tree_matches_host_twin():
    from zk_evm_tpu.merkle.keccak_tree import build_tree_keccak
    from zk_evm_tpu.merkle import keccak_merkle
    rng = np.random.default_rng(9)
    from zk_evm_tpu.field import host
    leaves = rng.integers(0, host.P, size=(16, 7), dtype=np.uint64)
    tree = build_tree_keccak(leaves, cap_height=1)
    _, cap = keccak_merkle.build_tree([list(map(int, r)) for r in leaves],
                                      cap_height=1)
    assert tree.cap_ints() == cap
    # paths verify under the host keccak verifier
    for idx in (0, 5, 15):
        path = tree.prove(idx)
        assert keccak_merkle.verify_path(
            [int(x) for x in leaves[idx]], idx, path, cap, path_len=3)


def test_prove_verify_keccak_config():
    from zk_evm_tpu.tables import logic
    ops = [("xor", 0x1234, 0xF00F), ("and", 2**64 - 1, 77),
           ("or", 1 << 255, 3)] * 4
    trace = logic.generate_trace(ops)
    cfg = _cfg("keccak")
    proof = prove_stark(logic.LogicStark(), trace, cfg, Challenger())
    verify_stark(logic.LogicStark(), proof, cfg, Challenger())

    # the proof is NOT valid under the poseidon hasher config
    with pytest.raises(AssertionError):
        verify_stark(logic.LogicStark(), proof, _cfg("poseidon"),
                     Challenger())

    # caps differ from the poseidon-config proof (different hasher law),
    # and tampering with a cap is rejected
    p2 = prove_stark(logic.LogicStark(), trace, _cfg("poseidon"),
                     Challenger())
    assert proof.trace_cap != p2.trace_cap
    bad = proof.trace_cap[0][0] ^ 1
    proof.trace_cap[0][0] = bad
    with pytest.raises(AssertionError):
        verify_stark(logic.LogicStark(), proof, cfg, Challenger())


def test_recursion_rejects_keccak_config():
    from zk_evm_tpu.tables import logic
    from zk_evm_tpu.recursion.verify_tape import verify_stark_tape
    ops = [("xor", 1, 2)]
    trace = logic.generate_trace(ops)
    cfg = _cfg("keccak")
    proof = prove_stark(logic.LogicStark(), trace, cfg, Challenger())
    with pytest.raises(AssertionError, match="Poseidon"):
        verify_stark_tape(None, logic.LogicStark(), proof, cfg)
