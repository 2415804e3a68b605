"""FRI commit/open/verify roundtrip: device prover vs independent host
verifier."""

import numpy as np
import pytest

from zk_evm_tpu.field import GF, host
from zk_evm_tpu.challenger import Challenger
from zk_evm_tpu.stark.config import FriConfig
from zk_evm_tpu.stark.poly_batch import PolynomialBatch
from zk_evm_tpu.stark import fri

P = host.P
rng = np.random.default_rng(7)


def _setup(degree_bits=6, num_polys=5, num_queries=3, pow_bits=4,
           arity_bits=2, final_poly_bits=2):
    n = 1 << degree_bits
    cfg = FriConfig(rate_bits=1, cap_height=1, proof_of_work_bits=pow_bits,
                    num_query_rounds=num_queries, arity_bits=arity_bits,
                    final_poly_bits=final_poly_bits)
    values = rng.integers(0, P, size=(num_polys, n), dtype=np.uint64)
    batch = PolynomialBatch.from_values(GF.from_u64(values), rate_bits=1,
                                        cap_height=cfg.cap_height)

    chal = Challenger()
    chal.observe_cap(batch.cap_ints())

    # open all polys at zeta and zeta*g
    zeta = (12345678901234567, 98765432109876543)
    g = host.primitive_root_of_unity(degree_bits)
    zeta_g = host.emul(zeta, (g, 0))
    ys = batch.open_at([zeta, zeta_g])
    batches = []
    for k, z in enumerate((zeta, zeta_g)):
        entries = [(0, i) for i in range(num_polys)]
        vals = [(int(ys[k, i, 0]), int(ys[k, i, 1]))
                for i in range(num_polys)]
        batches.append(fri.FriOpeningBatch(point=z, entries=entries,
                                           values=vals))
    for b in batches:
        for v in b.values:
            chal.observe_elements(v)
    alpha = chal.get_extension_challenge()
    return cfg, batch, batches, alpha, degree_bits, chal


def _fresh_verif_challenger(batch, batches):
    chal = Challenger()
    chal.observe_cap(batch.cap_ints())
    for b in batches:
        for v in b.values:
            chal.observe_elements(v)
    alpha = chal.get_extension_challenge()
    return chal, alpha


def test_fri_roundtrip():
    cfg, batch, batches, alpha, db, chal = _setup()
    proof = fri.prove_fri([batch], batches, alpha, db, chal, cfg)
    vchal, valpha = _fresh_verif_challenger(batch, batches)
    assert valpha == alpha
    fri.verify_fri([batch.cap_ints()], batches, valpha, db, proof,
                   vchal, cfg)


def test_fri_rejects_tampered_opening():
    cfg, batch, batches, alpha, db, chal = _setup()
    proof = fri.prove_fri([batch], batches, alpha, db, chal, cfg)
    # claim a different opening value: verifier's challenger diverges OR
    # the low-degree check fails; either way verification must not pass
    bad = [fri.FriOpeningBatch(b.point, b.entries, list(b.values))
           for b in batches]
    a0, b0 = bad[0].values[0]
    bad[0].values[0] = ((a0 + 1) % P, b0)
    vchal, valpha = _fresh_verif_challenger(batch, bad)
    with pytest.raises(AssertionError):
        fri.verify_fri([batch.cap_ints()], bad, valpha, db, proof,
                       vchal, cfg)


def test_fri_rejects_tampered_final_poly():
    cfg, batch, batches, alpha, db, chal = _setup(pow_bits=0)
    proof = fri.prove_fri([batch], batches, alpha, db, chal, cfg)
    proof.final_poly[0] = ((proof.final_poly[0][0] + 1) % P,
                          proof.final_poly[0][1])
    vchal, valpha = _fresh_verif_challenger(batch, batches)
    with pytest.raises(AssertionError):
        fri.verify_fri([batch.cap_ints()], batches, valpha, db, proof,
                       vchal, cfg)


def test_fri_rejects_wrong_leaf():
    cfg, batch, batches, alpha, db, chal = _setup(pow_bits=0)
    proof = fri.prove_fri([batch], batches, alpha, db, chal, cfg)
    proof.query_rounds[0].initial.leaves[0][0] = \
        (proof.query_rounds[0].initial.leaves[0][0] + 1) % P
    vchal, valpha = _fresh_verif_challenger(batch, batches)
    with pytest.raises(AssertionError):
        fri.verify_fri([batch.cap_ints()], batches, valpha, db, proof,
                       vchal, cfg)


def test_fri_multiple_arities_and_16():
    cfg, batch, batches, alpha, db, chal = _setup(
        degree_bits=9, num_polys=3, arity_bits=4, final_poly_bits=5,
        pow_bits=0, num_queries=2)
    proof = fri.prove_fri([batch], batches, alpha, db, chal, cfg)
    vchal, valpha = _fresh_verif_challenger(batch, batches)
    fri.verify_fri([batch.cap_ints()], batches, valpha, db, proof,
                   vchal, cfg)
