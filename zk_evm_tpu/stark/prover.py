"""Single-table STARK prover (with logUp / CTL auxiliary columns).

Counterpart of the reference's per-table proving path (`prove_single_table`
wrapping starky::prove_with_commitment at /root/reference/
evm_arithmetization/src/prover.rs:301-338). Device does all O(n)-and-up
work: commitments (NTT+Merkle), aux-column generation (batched inverses +
associative-scan running sums), whole-LDE constraint evaluation, quotient
interpolation, FRI. Host does transcript sequencing only.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..field import GF, host
from .. import ntt
from ..challenger import Challenger
from .config import StarkConfig
from .poly_batch import PolynomialBatch
from .stark import Stark, StarkFrame, ConstraintConsumer
from .proof import StarkProof, StarkOpeningSet
from . import domains, fri, lookup
from ..timing import timed


def _quotient_chunks(stark: Stark, trace_batch: PolynomialBatch,
                     aux_batch: PolynomialBatch | None,
                     lookups, groups, challenges,
                     alphas: list[int], config: StarkConfig,
                     public_inputs: list[int],
                     pre_batch: PolynomialBatch | None = None) -> GF:
    """Evaluate the constraint composition over the LDE coset and return
    quotient chunk coefficients, shape (num_challenges << rate_bits, n)."""
    degree_bits = trace_batch.degree.bit_length() - 1
    rate_bits = config.rate_bits
    log_m = degree_bits + rate_bits
    m = 1 << log_m

    lde = trace_batch.lde                       # (cols, m) bitrev
    if pre_batch is not None:
        # preprocessed (program) columns occupy the low indices
        lde = GF.concatenate([pre_batch.lde, lde], axis=0)
    perm = jnp.asarray(domains.next_row_perm_bitrev(log_m, rate_bits))
    next_lde = lde.take(perm, axis=-1)
    sel = domains.selector_tables_bitrev(degree_bits, rate_bits)

    aux_local, aux_next = [], []
    if aux_batch is not None:
        aux_local = aux_batch.lde
        aux_next = aux_local.take(perm, axis=-1)

    # local/next are whole GF matrices: lv[i] yields a column row-vector
    # and lv[a:b] a (K, m) block (tables with uniform wide constraint
    # families slice blocks and use cc.constraint_block).
    frame = StarkFrame(
        local=lde, next_=next_lde,
        aux_local=aux_local, aux_next=aux_next,
        public_inputs=public_inputs)
    cc = ConstraintConsumer(
        alphas=alphas,
        zero=GF.zeros((m,)),
        z_last=GF.from_u64(sel["z_last"]),
        lagrange_first=GF.from_u64(sel["l_first"]),
        lagrange_last=GF.from_u64(sel["l_last"]))
    stark.eval(frame, cc)
    if lookups or groups:
        lookup.eval_aux_constraints(lookups, groups, challenges, frame, cc)

    zh_inv = GF.from_u64(sel["zh_inv"])
    q_vals = GF.stack([acc * zh_inv for acc in cc.accs], axis=0)
    coeffs = ntt.coset_ifft_from_bitrev(q_vals)      # (nc, m)
    n = 1 << degree_bits
    return coeffs.reshape(len(alphas) << rate_bits, n)


def shard_rows(x: GF, mesh) -> GF:
    """Lay a (polys, n) batch out with the evaluation axis sharded over
    the mesh; every jitted stage downstream compiles SPMD and XLA
    inserts the NTT/transpose collectives. Proof bytes are unchanged —
    the math is exact and the tree order fixed (SURVEY §2.9 P1)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec
    sh = NamedSharding(mesh, PartitionSpec(None, mesh.axis_names[0]))
    return jax.device_put(x, sh)


def prove_stark(stark: Stark, trace: np.ndarray, config: StarkConfig,
                challenger: Challenger,
                public_inputs: list[int] | None = None,
                challenges: lookup.ChallengeSet | None = None,
                ctl_groups=None,
                observe_trace_cap: bool = True,
                trace_batch: PolynomialBatch | None = None,
                mesh=None) -> StarkProof:
    """Prove one table. In multi-table mode (AllStark) the caller commits
    the trace, observes every cap globally, draws the shared CTL challenge
    set, and passes challenges/ctl_views/trace_batch in.

    `mesh`: a jax.sharding.Mesh to shard the proof computation over
    (rows axis); the resulting proof is bit-identical to single-device."""
    public_inputs = public_inputs or []
    groups = list(ctl_groups or [])
    lookups = stark.lookups()
    n = trace.shape[1]
    degree_bits = n.bit_length() - 1
    assert 1 << degree_bits == n
    assert trace.shape[0] == stark.num_columns
    fri_cfg = config.fri_config
    npre = stark.num_preprocessed
    pre_batch = stark.preprocessed_batch(config)
    assert (pre_batch is None) == (npre == 0)
    if pre_batch is not None:
        assert np.array_equal(stark.preprocessed(), trace[:npre]), \
            "trace's program columns deviate from stark.preprocessed()"

    trace_gf = GF.from_u64(trace)     # full (incl. program cols): aux gen
    if mesh is not None:
        trace_gf = shard_rows(trace_gf, mesh)
    if trace_batch is None:
        with timed("commit trace"):
            trace_batch = PolynomialBatch.from_values(
                trace_gf[npre:] if npre else trace_gf,
                rate_bits=config.rate_bits,
                cap_height=config.cap_height)
    trace_cap = trace_batch.cap_ints()

    init_state = challenger.compact()
    if observe_trace_cap:
        challenger.observe_cap(trace_cap)
        # Bind single-table public inputs into the transcript (the
        # AllStark layer observes them globally instead).
        challenger.observe_elements(public_inputs)
    if pre_batch is not None:
        # the program cap is part of the verification key; observing it
        # domain-separates transcripts of different programs
        challenger.observe_cap(pre_batch.cap_ints())

    # 1. lookup/CTL challenges + aux commitment
    aux_batch = None
    aux_cap = None
    if lookups or groups:
        if challenges is None:
            challenges = lookup.get_challenge_set(
                challenger, config.num_challenges)
        with timed("generate aux columns"):
            aux_gf = lookup.generate_aux_trace(trace_gf, lookups, groups,
                                               challenges)
        if mesh is not None:
            aux_gf = shard_rows(aux_gf, mesh)
        with timed("commit aux"):
            aux_batch = PolynomialBatch.from_values(
                aux_gf, rate_bits=config.rate_bits,
                cap_height=config.cap_height)
            aux_cap = aux_batch.cap_ints()
        challenger.observe_cap(aux_cap)

    # 2. constraint-folding challenges + quotient commitment
    alphas = challenger.get_n_challenges(config.num_challenges)
    with timed("evaluate quotient"):
        chunks = _quotient_chunks(stark, trace_batch, aux_batch, lookups,
                                  groups, challenges, alphas, config,
                                  public_inputs, pre_batch=pre_batch)
    with timed("commit quotient"):
        quotient_batch = PolynomialBatch.from_coeffs(
            chunks, rate_bits=config.rate_bits,
            cap_height=config.cap_height)
        quotient_cap = quotient_batch.cap_ints()
    challenger.observe_cap(quotient_cap)

    # 3. openings at zeta / zeta*g (and x=1 for CTL running sums)
    zeta = challenger.get_extension_challenge()
    g = host.primitive_root_of_unity(degree_bits)
    zeta_next = host.emul(zeta, (g, 0))
    with timed("openings"):
        t_open = trace_batch.open_at([zeta, zeta_next])
        q_open = quotient_batch.open_at([zeta])
        pre_local, pre_next = [], []
        if pre_batch is not None:
            p_open = pre_batch.open_at([zeta, zeta_next])
            pre_local = [tuple(map(int, v)) for v in p_open[0]]
            pre_next = [tuple(map(int, v)) for v in p_open[1]]
    aux_local_open, aux_next_open, ctl_zs_first = [], [], []
    z_idxs: list[int] = []
    if aux_batch is not None:
        a_open = aux_batch.open_at([zeta, zeta_next, (1, 0)])
        aux_local_open = [tuple(map(int, v)) for v in a_open[0]]
        aux_next_open = [tuple(map(int, v)) for v in a_open[1]]
        z_idxs = lookup.ctl_z_first_indices(lookups, groups, challenges)
        for i in z_idxs:
            a, b = int(a_open[2, i, 0]), int(a_open[2, i, 1])
            assert b == 0, "CTL Z opening at x=1 must be base-field"
            ctl_zs_first.append(a)
    openings = StarkOpeningSet(
        trace_local=pre_local + [tuple(map(int, v)) for v in t_open[0]],
        trace_next=pre_next + [tuple(map(int, v)) for v in t_open[1]],
        aux_local=aux_local_open, aux_next=aux_next_open,
        ctl_zs_first=ctl_zs_first,
        quotient=[tuple(map(int, v)) for v in q_open[0]])
    challenger.observe_elements(openings.observe_order())

    # 4. FRI batched opening proof (oracle order: [pre?, trace, aux?, q])
    alpha = challenger.get_extension_challenge()
    oracles = []
    zeta_entries, next_entries = [], []
    if pre_batch is not None:
        oracles.append(pre_batch)
        zeta_entries += [(0, i) for i in range(npre)]
        next_entries += [(0, i) for i in range(npre)]
    tidx = len(oracles)
    oracles.append(trace_batch)
    zeta_entries += [(tidx, i) for i in range(trace_batch.num_polys)]
    next_entries += [(tidx, i) for i in range(trace_batch.num_polys)]
    zeta_values = list(openings.trace_local)
    next_values = list(openings.trace_next)
    if aux_batch is not None:
        aidx = len(oracles)
        oracles.append(aux_batch)
        zeta_entries += [(aidx, i) for i in range(aux_batch.num_polys)]
        zeta_values += list(openings.aux_local)
        next_entries += [(aidx, i) for i in range(aux_batch.num_polys)]
        next_values += list(openings.aux_next)
    qidx = len(oracles)
    oracles.append(quotient_batch)
    zeta_entries += [(qidx, j) for j in range(quotient_batch.num_polys)]
    zeta_values += list(openings.quotient)
    batches = [
        fri.FriOpeningBatch(point=zeta, entries=zeta_entries,
                            values=zeta_values),
        fri.FriOpeningBatch(point=zeta_next, entries=next_entries,
                            values=next_values),
    ]
    if ctl_zs_first:
        batches.append(fri.FriOpeningBatch(
            point=(1, 0),
            entries=[(aidx, i) for i in z_idxs],
            values=[(v, 0) for v in openings.ctl_zs_first]))
    with timed("FRI"):
        fri_proof = fri.prove_fri(oracles, batches, alpha, degree_bits,
                                  challenger, fri_cfg)

    return StarkProof(degree_bits=degree_bits, trace_cap=trace_cap,
                      aux_cap=aux_cap, quotient_cap=quotient_cap,
                      openings=openings, fri_proof=fri_proof,
                      init_challenger_state=init_state,
                      public_inputs=list(public_inputs))
