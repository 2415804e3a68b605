"""Single-table STARK prover.

Counterpart of the reference's per-table proving path (`prove_single_table`
wrapping starky::prove_with_commitment at /root/reference/
evm_arithmetization/src/prover.rs:301-338). Device does all O(n)-and-up
work: commitments (NTT+Merkle), whole-LDE constraint evaluation, quotient
interpolation, FRI. Host does transcript sequencing only.
"""

from __future__ import annotations

import numpy as np
import jax

from ..field import GF, host
from .. import ntt
from ..challenger import Challenger
from .config import StarkConfig
from .poly_batch import PolynomialBatch
from .stark import Stark, StarkFrame, ConstraintConsumer
from .proof import StarkProof, StarkOpeningSet
from . import domains, fri


def _quotient_chunks(stark: Stark, trace_batch: PolynomialBatch,
                     alphas: list[int], config: StarkConfig,
                     public_inputs: list[int]) -> GF:
    """Evaluate the constraint composition over the LDE coset and return
    quotient chunk coefficients, shape (num_challenges << rate_bits, n)."""
    degree_bits = trace_batch.degree.bit_length() - 1
    rate_bits = config.rate_bits
    log_m = degree_bits + rate_bits
    m = 1 << log_m

    lde = trace_batch.lde                       # (cols, m) bitrev
    perm = domains.next_row_perm_bitrev(log_m, rate_bits)
    import jax.numpy as jnp
    next_lde = lde.take(jnp.asarray(perm), axis=-1)
    sel = domains.selector_tables_bitrev(degree_bits, rate_bits)

    frame = StarkFrame(
        local=[lde[i] for i in range(stark.num_columns)],
        next_=[next_lde[i] for i in range(stark.num_columns)],
        public_inputs=public_inputs)
    cc = ConstraintConsumer(
        alphas=alphas,
        zero=GF.zeros((m,)),
        z_last=GF.from_u64(sel["z_last"]),
        lagrange_first=GF.from_u64(sel["l_first"]),
        lagrange_last=GF.from_u64(sel["l_last"]))
    stark.eval(frame, cc)

    zh_inv = GF.from_u64(sel["zh_inv"])
    q_vals = GF.stack([acc * zh_inv for acc in cc.accs], axis=0)
    coeffs = ntt.coset_ifft_from_bitrev(q_vals)      # (nc, m)
    n = 1 << degree_bits
    chunks = coeffs.reshape(len(alphas) << rate_bits, n)
    return chunks


def prove_stark(stark: Stark, trace: np.ndarray, config: StarkConfig,
                challenger: Challenger,
                public_inputs: list[int] | None = None) -> StarkProof:
    public_inputs = public_inputs or []
    assert trace.shape[0] == stark.num_columns
    n = trace.shape[1]
    degree_bits = n.bit_length() - 1
    assert 1 << degree_bits == n
    fri_cfg = config.fri_config

    init_state = challenger.compact()

    # 1. trace commitment
    trace_batch = PolynomialBatch.from_values(
        GF.from_u64(trace), rate_bits=config.rate_bits,
        cap_height=config.cap_height)
    trace_cap = trace_batch.cap_ints()
    challenger.observe_cap(trace_cap)

    # 2. constraint-folding challenges + quotient commitment
    alphas = challenger.get_n_challenges(config.num_challenges)
    chunks = _quotient_chunks(stark, trace_batch, alphas, config,
                              public_inputs)
    quotient_batch = PolynomialBatch.from_coeffs(
        chunks, rate_bits=config.rate_bits, cap_height=config.cap_height)
    quotient_cap = quotient_batch.cap_ints()
    challenger.observe_cap(quotient_cap)

    # 3. openings at zeta / zeta*g
    zeta = challenger.get_extension_challenge()
    g = host.primitive_root_of_unity(degree_bits)
    zeta_next = host.emul(zeta, (g, 0))
    t_open = trace_batch.open_at([zeta, zeta_next])
    q_open = quotient_batch.open_at([zeta])
    openings = StarkOpeningSet(
        trace_local=[tuple(map(int, v)) for v in t_open[0]],
        trace_next=[tuple(map(int, v)) for v in t_open[1]],
        aux_local=[], aux_next=[], ctl_zs_first=[],
        quotient=[tuple(map(int, v)) for v in q_open[0]])
    challenger.observe_elements(openings.observe_order())

    # 4. FRI batched opening proof
    alpha = challenger.get_extension_challenge()
    batches = [
        fri.FriOpeningBatch(
            point=zeta,
            entries=[(0, i) for i in range(trace_batch.num_polys)]
            + [(1, j) for j in range(quotient_batch.num_polys)],
            values=openings.trace_local + openings.quotient),
        fri.FriOpeningBatch(
            point=zeta_next,
            entries=[(0, i) for i in range(trace_batch.num_polys)],
            values=openings.trace_next),
    ]
    fri_proof = fri.prove_fri([trace_batch, quotient_batch], batches,
                              alpha, degree_bits, challenger, fri_cfg)

    return StarkProof(degree_bits=degree_bits, trace_cap=trace_cap,
                      aux_cap=None, quotient_cap=quotient_cap,
                      openings=openings, fri_proof=fri_proof,
                      init_challenger_state=init_state,
                      public_inputs=list(public_inputs))
