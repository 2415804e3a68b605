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


def test_keccak_device_f1600_matches_numpy():
    """Device keccak-f[1600] (2x-u32-lane XLA) == host numpy twin."""
    import jax.numpy as jnp
    from zk_evm_tpu.hash.keccak_np import keccak_f1600
    from zk_evm_tpu.hash.keccak_device import keccak_f1600_pair
    rng = np.random.default_rng(11)
    state = rng.integers(0, 2**64, size=(6, 5, 5), dtype=np.uint64)
    want = keccak_f1600(state.copy())
    lo = jnp.asarray((state & 0xFFFFFFFF).astype(np.uint32))
    hi = jnp.asarray((state >> 32).astype(np.uint32))
    glo, ghi = keccak_f1600_pair(lo, hi)
    got = np.asarray(glo, dtype=np.uint64) \
        | (np.asarray(ghi, dtype=np.uint64) << np.uint64(32))
    assert np.array_equal(got, want)


def test_keccak_device_tree_bit_identical_to_host():
    """The DEVICE keccak commitment tree (hasher="keccak") equals the
    host-numpy twin cap-for-cap and path-for-path (VERDICT r4 #8)."""
    from zk_evm_tpu.field import GF, host
    from zk_evm_tpu.merkle import build_commitment_tree
    from zk_evm_tpu.merkle.keccak_tree import build_tree_keccak
    rng = np.random.default_rng(13)
    for width in (3, 7, 20):          # noop-leaf, 1-block, 2-block
        leaves = rng.integers(0, host.P, size=(16, width), dtype=np.uint64)
        dev = build_commitment_tree(GF.from_u64(leaves), cap_height=1,
                                    hasher="keccak")
        hostt = build_tree_keccak(leaves, cap_height=1)
        assert [[int(x) for x in r] for r in dev.cap_u64()] \
            == hostt.cap_ints(), f"width {width}"
        for idx in (0, 9, 15):
            assert dev.prove(idx) == hostt.prove(idx), (width, idx)


def test_prove_verify_keccak_device_matches_host_config():
    """A proof under the device keccak config is byte-identical to the
    host-numpy config's proof (same transcript, same caps)."""
    from zk_evm_tpu.tables import memory_continuation as mc
    from zk_evm_tpu.tables.segments import Segment
    from zk_evm_tpu.stark.serialization import proof_to_json
    values = [((0, int(Segment.MainMemory), i), 31 * i + 5)
              for i in range(6)]
    trace = mc.generate_trace(values)
    stark = mc.MemoryContinuationStark()
    p_dev = prove_stark(stark, trace, _cfg("keccak"), Challenger())
    p_host = prove_stark(stark, trace, _cfg("keccak_host"), Challenger())
    assert proof_to_json(p_dev) == proof_to_json(p_host)
    verify_stark(stark, p_dev, _cfg("keccak"), Challenger())
