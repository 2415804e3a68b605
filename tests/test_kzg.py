"""BLS12-381 + the EIP-4844 KZG point-evaluation oracle
(witness/bls381.py, prover_input.rs:634-769 twin).

The pairing is checked by bilinearity and a synthetic-trusted-setup KZG
round-trip; the precompile path is checked with REAL consensus-valid
inputs that need no ceremony secret: the constant polynomial (proof is
the point at infinity) against the actual EIP-4844 trusted-setup point."""

import hashlib

import pytest

from zk_evm_tpu.witness import bls381 as b


def _versioned_hash(comm_bytes: bytes) -> int:
    h = int.from_bytes(hashlib.sha256(comm_bytes).digest(), "big")
    return (h & ((1 << 248) - 1)) | (b.KZG_VERSIONED_HASH << 248)


def _split48(data: bytes) -> tuple[int, int]:
    return int.from_bytes(data[:32], "big"), int.from_bytes(
        data[32:], "big")


def test_curve_and_groups():
    assert b.on_g1(b.G1) and b.on_g2(b.G2)
    assert b.on_g2(b.G2_TRUSTED_SETUP_POINT)
    assert b.g1_mul(b.G1, b.R) is None
    assert b.g2_mul(b.G2, b.R) is None


def test_g1_bytes_roundtrip():
    for k in (1, 2, 12345, b.R - 1):
        p = b.g1_mul(b.G1, k)
        assert b.g1_from_bytes(b.g1_to_bytes(p)) == p
    assert b.g1_from_bytes(b.g1_to_bytes(None)) is None
    with pytest.raises(ValueError):
        b.g1_from_bytes(bytes(48))          # no compression flag
    with pytest.raises(ValueError):
        b.g1_from_bytes(bytes([0xC0, 1]) + bytes(46))  # inf with x != 0


def test_pairing_bilinear():
    e = b.pairing(b.G1, b.G2)
    assert e != b.P12_ONE
    e2 = b.p12_pow(e, 2)
    assert b.pairing(b.g1_mul(b.G1, 2), b.G2) == e2
    assert b.pairing(b.G1, b.g2_mul(b.G2, 2)) == e2
    assert b.pairing(b.g1_mul(b.G1, 2), b.g2_mul(b.G2, 3)) \
        == b.p12_pow(e, 6)


def test_kzg_synthetic_setup_roundtrip():
    """Full KZG open/verify against a known-secret setup: correctness
    of the pairing identity independent of the ceremony."""
    s = 0x1234567890ABCDEF1122334455667788
    c = [3, 1415, 92653]
    f = lambda x: (c[0] + c[1] * x + c[2] * x * x) % b.R
    comm = b.g1_mul(b.G1, f(s))
    z = 0xABCDEF
    y = f(z)
    qs = (f(s) - y) * pow((s - z) % b.R, b.R - 2, b.R) % b.R
    proof = b.g1_mul(b.G1, qs)
    setup = b.g2_mul(b.G2, s)
    assert b.verify_kzg_proof(comm, z, y, proof, setup_g2=setup)
    assert not b.verify_kzg_proof(comm, z, (y + 1) % b.R, proof,
                                  setup_g2=setup)
    assert not b.verify_kzg_proof(comm, (z + 1) % b.R, y, proof,
                                  setup_g2=setup)


def test_point_eval_constant_poly_real_setup():
    """Constant polynomial f(X) = c: commitment c*G1, proof = infinity,
    f(z) = c for every z — a consensus-valid input against the REAL
    trusted setup (no secret needed)."""
    c = 0xDEADBEEF
    comm_bytes = b.g1_to_bytes(b.g1_mul(b.G1, c))
    proof_bytes = b.g1_to_bytes(None)
    comm_hi, comm_lo = _split48(comm_bytes)
    proof_hi, proof_lo = _split48(proof_bytes)
    vh = _versioned_hash(comm_bytes)
    z = 0x123456789
    out = b.kzg_point_eval(vh, z, c, comm_hi, comm_lo,
                           proof_hi, proof_lo)
    assert out == b.R, "valid constant-poly opening rejected"
    # wrong evaluation rejected
    assert b.kzg_point_eval(vh, z, c + 1, comm_hi, comm_lo,
                            proof_hi, proof_lo) == 0
    # wrong versioned hash rejected
    assert b.kzg_point_eval(vh ^ 1, z, c, comm_hi, comm_lo,
                            proof_hi, proof_lo) == 0
    # out-of-range scalar rejected
    assert b.kzg_point_eval(vh, b.R + 1, c, comm_hi, comm_lo,
                            proof_hi, proof_lo) == 0
    # malformed commitment (garbage high bits in the low word) rejected
    assert b.kzg_point_eval(vh, z, c, comm_hi, 1 << 200,
                            proof_hi, proof_lo) == 0


def test_zero_poly_infinity_commitment():
    """The zero polynomial: commitment AND proof at infinity, y = 0."""
    comm_bytes = b.g1_to_bytes(None)
    hi, lo = _split48(comm_bytes)
    vh = _versioned_hash(comm_bytes)
    assert b.kzg_point_eval(vh, 7, 0, hi, lo, hi, lo) == b.R
    assert b.kzg_point_eval(vh, 7, 1, hi, lo, hi, lo) == 0


def test_interpreter_oracle_dispatch():
    """The PROVER_INPUT(kzg_point_eval/_2) oracle methods read the
    kernel's documented stack layout (kzg_peval.asm:53-60)."""
    from zk_evm_tpu.witness.interpreter import Interpreter, KernelPanic

    class _K:                      # minimal kernel stand-in
        code = b"\x00"
        global_labels = {}
        prover_inputs = {}

    c = 42
    comm_bytes = b.g1_to_bytes(b.g1_mul(b.G1, c))
    proof_bytes = b.g1_to_bytes(None)
    comm_hi, comm_lo = _split48(comm_bytes)
    proof_hi, proof_lo = _split48(proof_bytes)
    vh = _versioned_hash(comm_bytes)
    # initial_stack is bottom-to-top; peek(0) is the top
    stack = [0, 0, proof_lo, proof_hi, comm_lo, comm_hi, c, 5, vh]
    interp = Interpreter(_K(), 0, stack)
    out = interp._pi_kzg_point_eval(("kzg_point_eval",))
    assert out == b.R
    interp.push(out)
    assert interp._pi_kzg_point_eval_2(("kzg_point_eval_2",)) \
        == b.FIELD_ELEMENTS_PER_BLOB
    interp.pop()
    interp.push(0)
    with pytest.raises(KernelPanic):
        interp._pi_kzg_point_eval_2(("kzg_point_eval_2",))
