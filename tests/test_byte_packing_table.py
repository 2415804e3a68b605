"""BytePacking table tests."""

import numpy as np
import pytest

from zk_evm_tpu.challenger import Challenger
from zk_evm_tpu.stark import StarkConfig, FriConfig, prove_stark, verify_stark
from zk_evm_tpu.stark.debug import check_constraints
from zk_evm_tpu.tables import byte_packing as bp
from zk_evm_tpu.tables.segments import Segment

rng = np.random.default_rng(41)


def sample_ops():
    return [
        bp.BytePackingOp(True, 0, Segment.MainMemory, 100, 7,
                         rng.bytes(32)),
        bp.BytePackingOp(False, 1, Segment.Calldata, 5, 13, rng.bytes(11)),
        bp.BytePackingOp(True, 0, Segment.Returndata, 0, 19, b"\x01"),
    ]


def _cfg():
    return StarkConfig(
        security_bits=1,
        fri_config=FriConfig(rate_bits=1, cap_height=2,
                             proof_of_work_bits=0, num_query_rounds=2,
                             arity_bits=2, final_poly_bits=2))


def test_trace_and_rows():
    ops = sample_ops()
    trace = bp.generate_trace(ops)
    assert trace.shape[0] == bp.NUM_COLUMNS
    # bytes stored reversed
    assert int(trace[bp.VALUE_BYTES[0], 0]) == ops[0].bytes[-1]
    assert int(trace[bp.INDEX_LEN[31], 0]) == 1
    assert int(trace[bp.INDEX_LEN[10], 1]) == 1
    check_constraints(bp.BytePackingStark(), trace,
                      rows=[0, 1, 2, 3, 255])


def test_byte_packing_roundtrip():
    trace = bp.generate_trace(sample_ops())
    cfg = _cfg()
    proof = prove_stark(bp.BytePackingStark(), trace, cfg, Challenger())
    verify_stark(bp.BytePackingStark(), proof, cfg, Challenger())


def test_byte_packing_rejects_tail_bytes():
    trace = bp.generate_trace(sample_ops())
    # op 1 has len 11; byte index 20 must be zero
    trace[bp.VALUE_BYTES[20], 1] = 9
    with pytest.raises(AssertionError):
        check_constraints(bp.BytePackingStark(), trace, rows=[1])
