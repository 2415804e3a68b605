"""Public-value transcript encoding + proof JSON roundtrips."""

import numpy as np

from zk_evm_tpu.challenger import Challenger
from zk_evm_tpu.stark.public_values import (PublicValues, TrieRoots,
                                            BlockMetadata, BlockHashes,
                                            ExtraBlockData, h256_limbs)
from zk_evm_tpu.stark.serialization import (proof_to_json,
                                            stark_proof_from_json)
from zk_evm_tpu.stark import prove_stark, verify_stark


def test_encoding_shape():
    pv = PublicValues()
    els = pv.to_elements()
    # trie roots: 2 * 3 * 8; metadata: 5+3+8+2+2+1+2+2+8+64 = 97;
    # block hashes: 257 * 8; extra: 8+4+4
    assert len(els) == 48 + 97 + 2056 + 16
    # all elements are field-small (u32/u64-ish) and deterministic
    assert els == PublicValues().to_elements()


def test_encoding_sensitivity_and_limbs():
    assert h256_limbs(b"\x00" * 31 + b"\x01") == [1, 0, 0, 0, 0, 0, 0, 0]
    a = PublicValues()
    b = PublicValues(block_metadata=BlockMetadata(block_number=5))
    assert a.to_elements() != b.to_elements()
    c1, c2 = Challenger(), Challenger()
    a.observe(c1)
    b.observe(c2)
    assert c1.get_challenge() != c2.get_challenge()


def test_proof_json_roundtrip():
    from tests.test_stark import FibStark, fib_trace, _cfg
    trace, pis = fib_trace(32)
    cfg = _cfg()
    proof = prove_stark(FibStark(), trace, cfg, Challenger(), pis)
    blob = proof_to_json(proof)
    restored = stark_proof_from_json(blob)
    verify_stark(FibStark(), restored, cfg, Challenger())
