"""KeccakSponge table: digest vectors, row constraints, roundtrip."""

import numpy as np
import pytest

from zk_evm_tpu.challenger import Challenger
from zk_evm_tpu.stark import StarkConfig, FriConfig, prove_stark, verify_stark
from zk_evm_tpu.stark.debug import check_constraints
from zk_evm_tpu.tables import keccak_sponge as ks

rng = np.random.default_rng(61)


def test_keccak256_vectors():
    assert ks.keccak256(b"").hex() == \
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    assert ks.keccak256(b"abc").hex() == \
        "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
    # multi-block input (> 136 bytes)
    data = bytes(range(256))
    assert len(ks.keccak256(data)) == 32


def _ops():
    return [
        ks.KeccakSpongeOp(0, 8, 100, 7, b"hello world"),
        ks.KeccakSpongeOp(1, 8, 0, 13, bytes(range(200))),  # 2 blocks
        ks.KeccakSpongeOp(0, 8, 64, 19, b""),
    ]


def test_trace_digest_matches():
    ops = _ops()
    trace = ks.generate_trace(ops)
    # final row of op0 is row 0 (11-byte input -> single final row)
    digest = bytes(int(trace[c, 0]) for c in ks.UPDATED_DIGEST_STATE_BYTES)
    assert digest == ks.keccak256(b"hello world")
    # op1 occupies rows 1 (full) and 2 (final)
    assert int(trace[ks.IS_FULL_INPUT_BLOCK, 1]) == 1
    digest1 = bytes(int(trace[c, 2]) for c in ks.UPDATED_DIGEST_STATE_BYTES)
    assert digest1 == ks.keccak256(bytes(range(200)))


def test_row_constraints():
    trace = ks.generate_trace(_ops())
    check_constraints(ks.KeccakSpongeStark(), trace,
                      rows=[0, 1, 2, 3, 4, 255])


def test_bad_padding_caught():
    trace = ks.generate_trace(_ops())
    trace[ks.BLOCK_BYTES[11], 0] = 0x05   # first pad byte must be 1
    with pytest.raises(AssertionError):
        check_constraints(ks.KeccakSpongeStark(), trace, rows=[0])


def test_sponge_roundtrip():
    trace = ks.generate_trace(_ops())
    cfg = StarkConfig(
        security_bits=1,
        fri_config=FriConfig(rate_bits=1, cap_height=2,
                             proof_of_work_bits=0, num_query_rounds=1,
                             arity_bits=2, final_poly_bits=2))
    proof = prove_stark(ks.KeccakSpongeStark(), trace, cfg, Challenger())
    verify_stark(ks.KeccakSpongeStark(), proof, cfg, Challenger())
