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
import jax
import jax.numpy as jnp

from ..field import GF, host
from .. import ntt
from ..challenger import Challenger
from .config import StarkConfig
from .poly_batch import PolynomialBatch
from .stark import Stark, StarkFrame, ConstraintConsumer, StackingConsumer
from .proof import StarkProof, StarkOpeningSet
from . import domains, fri, lookup
from ..timing import timed


_QUOTIENT_FN_CACHE: dict = {}


def _use_jit_quotient() -> bool:
    """Fused-jit the quotient program on real accelerators (one dispatch
    instead of thousands through the tunnel); run eagerly on the CPU
    backend, where XLA's compile of the fused constraint graph is
    pathologically slow (>25 min for a tiny Logic table) and eager
    dispatch is cheap. ZK_JIT_QUOTIENT=0/1 overrides."""
    import os
    env = os.environ.get("ZK_JIT_QUOTIENT")
    if env is not None:
        return env not in ("0", "false")
    import jax
    return jax.default_backend() != "cpu"


def _use_stack_fold() -> bool:
    """Fold the constraint composition as one stacked log-tree reduction
    (StackingConsumer) instead of a serial per-constraint alpha chain.
    Bit-identical math; besides being the faster shape on the device it
    is the round-5 FIX for the windowed-quotient TPU miscompile (the
    axon XLA build miscompiles the fused eval+serial-fold graph for the
    Poseidon/Keccak block-constraint tables — scripts/bisect_poseidon*).
    ZK_SEQ_FOLD=1 restores the old serial fold for A/B debugging."""
    import os
    return os.environ.get("ZK_SEQ_FOLD") not in ("1", "true")


def _make_consumer(alphas, zero, z_last, lagrange_first, lagrange_last):
    cls = StackingConsumer if _use_stack_fold() else ConstraintConsumer
    return cls(alphas=alphas, zero=zero, z_last=z_last,
               lagrange_first=lagrange_first, lagrange_last=lagrange_last)


def _plan_sig(lookups, groups):
    return (tuple(repr(lk) for lk in lookups),
            tuple((ci, s, tuple(repr(v) for v in views))
                  for ci, s, views in groups))


def _make_quotient_fn(stark, lookups, groups, degree_bits: int,
                      rate_bits: int, num_challenges: int,
                      public_inputs: tuple, has_aux: bool,
                      jit: bool = True):
    """ONE jitted program evaluating the whole constraint composition
    over the LDE coset, returning the scaled quotient VALUES (bitrev
    order). Challenges, alphas, and the stark's per-proof scalars
    (frame.params) enter traced, so the compiled program is reused
    across segments and proofs; the unjitted form issued one tunnel
    dispatch per constraint op (tens of thousands for the wide bitwise
    tables).

    The interpolation back to coefficients happens in a SEPARATE jitted
    program (_coset_ifft_reshape): fusing the constraint graph into the
    NTT's while-loop operand trips a catastrophic XLA:CPU codegen
    pathology (a 64-row toy quotient ran >20 min; as its own program the
    same graph executes in 8 ms). optimization_barrier does not help —
    XLA:CPU strips it. One extra dispatch per proof is noise.

    `jit=False` returns the same function un-jitted: XLA:CPU's compile
    of the fused constraint graph is itself pathological (a tiny Logic
    quotient compiles for >25 min on the CPU backend), so the CPU
    backend — tests, dryruns, tunnel-down fallback — runs eagerly, where
    per-op dispatch is cheap. Results are bit-identical either way."""
    log_m = degree_bits + rate_bits
    m = 1 << log_m
    perm = jnp.asarray(domains.next_row_perm_bitrev(log_m, rate_bits))
    sel = domains.selector_tables_bitrev(degree_bits, rate_bits)
    n_params = len(stark.proof_param_names)

    def fn(lde, aux_lde, alphas_gf, betas, gammas, params_gf):
        next_lde = lde.take(perm, axis=-1)
        aux_local, aux_next = [], []
        if has_aux:
            aux_local = aux_lde
            aux_next = aux_lde.take(perm, axis=-1)
        frame = StarkFrame(
            local=lde, next_=next_lde,
            aux_local=aux_local, aux_next=aux_next,
            public_inputs=list(public_inputs),
            params=tuple(params_gf[i] for i in range(n_params)))
        cc = _make_consumer(
            alphas=[alphas_gf[i] for i in range(num_challenges)],
            zero=GF.zeros((m,)),
            z_last=GF.from_u64(sel["z_last"]),
            lagrange_first=GF.from_u64(sel["l_first"]),
            lagrange_last=GF.from_u64(sel["l_last"]))
        stark.eval(frame, cc)
        if lookups or groups:
            chs = lookup.ChallengeSet(tuple(
                (betas[i], gammas[i]) for i in range(num_challenges)))
            lookup.eval_aux_constraints(lookups, groups, chs, frame, cc)
        if isinstance(cc, StackingConsumer):
            cc.finalize()
        zh_inv = GF.from_u64(sel["zh_inv"])
        return GF.stack([acc * zh_inv for acc in cc.accs], axis=0)

    return jax.jit(fn) if jit else fn


def _quotient_window_log() -> int:
    import os
    return int(os.environ.get("ZK_QUOTIENT_WINDOW_LOG", "16"))


def _make_windowed_quotient_fn(stark, lookups, groups,
                               num_challenges: int,
                               public_inputs: tuple, has_aux: bool):
    """Shape-parameterized constraint composition over ONE window of the
    LDE coset. Everything degree-dependent — the next-row view and the
    selector tables (z_last, lagrange first/last, Z_H^-1) — enters as
    traced window arguments, so a single compiled program per stark
    serves EVERY window, degree bucket, and segment. This both bounds
    the compile-helper footprint (a full-degree fused program for the
    2^18-row Memory quotient gets its compile subprocess SIGKILLed) and
    removes per-bucket quotient recompiles entirely."""
    n_params = len(stark.proof_param_names)

    @jax.jit
    def fn(lde_w, next_w, aux_w, aux_next_w, zl_w, lf_w, ll_w, zhinv_w,
           alphas_gf, betas, gammas, params_gf):
        w = lde_w.shape[-1]
        frame = StarkFrame(
            local=lde_w, next_=next_w,
            aux_local=aux_w if has_aux else [],
            aux_next=aux_next_w if has_aux else [],
            public_inputs=list(public_inputs),
            params=tuple(params_gf[i] for i in range(n_params)))
        cc = _make_consumer(
            alphas=[alphas_gf[i] for i in range(num_challenges)],
            zero=GF.zeros((w,)),
            z_last=zl_w, lagrange_first=lf_w, lagrange_last=ll_w)
        stark.eval(frame, cc)
        if lookups or groups:
            chs = lookup.ChallengeSet(tuple(
                (betas[i], gammas[i]) for i in range(num_challenges)))
            lookup.eval_aux_constraints(lookups, groups, chs, frame, cc)
        if isinstance(cc, StackingConsumer):
            cc.finalize()
        return GF.stack([acc * zhinv_w for acc in cc.accs], axis=0)

    return fn


@jax.jit
def _take_perm(x: GF, perm) -> GF:
    return x.take(perm, axis=-1)


from functools import partial


@partial(jax.jit, static_argnums=(1, 2))
def _coset_ifft_reshape(q_vals: GF, degree_bits: int, rate_bits: int) -> GF:
    coeffs = ntt.coset_ifft_from_bitrev(q_vals)          # (nc, m)
    n = 1 << degree_bits
    return coeffs.reshape(q_vals.shape[0] << rate_bits, n)


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

    lde = trace_batch.lde                       # (cols, m) bitrev
    if pre_batch is not None:
        # preprocessed (program) columns occupy the low indices
        lde = GF.concatenate([pre_batch.lde, lde], axis=0)
    has_aux = aux_batch is not None
    use_jit = _use_jit_quotient()
    params = stark.proof_params()
    pairs = challenges.pairs if challenges is not None else ()
    alphas_gf = GF.from_u64(np.array(list(alphas), dtype=np.uint64))
    betas_gf = GF.from_u64(np.array([b for b, _g in pairs] or [0],
                                    dtype=np.uint64))
    gammas_gf = GF.from_u64(np.array([g for _b, g in pairs] or [0],
                                     dtype=np.uint64))
    params_gf = GF.from_u64(np.array(list(params) or [0], dtype=np.uint64))

    if use_jit:
        key = ("win", stark.jit_key(), _plan_sig(lookups, groups),
               len(alphas), tuple(public_inputs or ()), has_aux,
               _use_stack_fold())
        fn = _QUOTIENT_FN_CACHE.get(key)
        if fn is None:
            fn = _make_windowed_quotient_fn(
                stark, lookups, groups, len(alphas),
                tuple(public_inputs or ()), has_aux)
            _QUOTIENT_FN_CACHE[key] = fn
        log_m = degree_bits + rate_bits
        m = 1 << log_m
        w = min(m, 1 << _quotient_window_log())
        perm = jnp.asarray(domains.next_row_perm_bitrev(log_m, rate_bits))
        sel = domains.selector_tables_bitrev(degree_bits, rate_bits)
        next_lde = _take_perm(lde, perm)
        aux_lde = aux_batch.lde if has_aux else GF.zeros((1, m))
        aux_next = _take_perm(aux_lde, perm) if has_aux else aux_lde
        zl = GF.from_u64(sel["z_last"])
        lf = GF.from_u64(sel["l_first"])
        ll = GF.from_u64(sel["l_last"])
        zhi = GF.from_u64(sel["zh_inv"])
        parts = []
        for off in range(0, m, w):
            sl = slice(off, off + w)
            parts.append(fn(
                lde[:, sl], next_lde[:, sl], aux_lde[:, sl],
                aux_next[:, sl], zl[sl], lf[sl], ll[sl], zhi[sl],
                alphas_gf, betas_gf, gammas_gf, params_gf))
        q_vals = parts[0] if len(parts) == 1 \
            else GF.concatenate(parts, axis=-1)
        return _coset_ifft_reshape(q_vals, degree_bits, rate_bits)

    key = (stark.jit_key(), _plan_sig(lookups, groups), degree_bits,
           rate_bits, len(alphas), tuple(public_inputs or ()), has_aux,
           use_jit, _use_stack_fold())
    fn = _QUOTIENT_FN_CACHE.get(key)
    if fn is None:
        fn = _make_quotient_fn(stark, lookups, groups, degree_bits,
                               rate_bits, len(alphas),
                               tuple(public_inputs or ()), has_aux,
                               jit=use_jit)
        _QUOTIENT_FN_CACHE[key] = fn

    q_vals = fn(
        lde,
        aux_batch.lde if has_aux else GF.zeros((1, lde.shape[-1])),
        alphas_gf, betas_gf, gammas_gf, params_gf)
    return _coset_ifft_reshape(q_vals, degree_bits, rate_bits)


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
                cap_height=config.cap_height, hasher=config.hasher)
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
                cap_height=config.cap_height, hasher=config.hasher)
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
            cap_height=config.cap_height, hasher=config.hasher)
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
                                  challenger, fri_cfg,
                                  hasher=config.hasher)

    return StarkProof(degree_bits=degree_bits, trace_cap=trace_cap,
                      aux_cap=aux_cap, quotient_cap=quotient_cap,
                      openings=openings, fri_proof=fri_proof,
                      init_challenger_state=init_state,
                      public_inputs=list(public_inputs))
