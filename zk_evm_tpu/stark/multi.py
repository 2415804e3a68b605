"""Multi-table proving: the AllStark layer.

Transcript follows SURVEY.md Appendix A (from /root/reference/
evm_arithmetization/src/prover.rs:113-158 and get_challenges.rs): all trace
caps observed in table order (zero-caps for unused optional tables), then
public values, then the global CTL challenge set, then each table proves
under the shared sequential challenger (each proof snapshots
init_challenger_state). The global verifier additionally cross-checks the
CTL running-sum totals across tables (verifier.rs:319's extra looking sums
enter here).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..field import GF, host
from ..challenger import Challenger
from ..hash import poseidon_params as pp
from .config import StarkConfig
from .poly_batch import PolynomialBatch
from .stark import Stark
from .proof import StarkProof
from .prover import prove_stark
from .verifier import verify_stark
from . import lookup


@dataclass
class AllProof:
    proofs: list[StarkProof | None]      # None = table unused (skipped)
    table_in_use: list[bool]
    public_inputs: list[int] = field(default_factory=list)
    public_values: object | None = None  # PublicValues (block proofs)


def _zero_cap(config: StarkConfig) -> list[list[int]]:
    return [[0, 0, 0, 0] for _ in range(1 << config.cap_height)]


class _nullcontext:
    def __enter__(self):
        return None

    def __exit__(self, *exc):
        return False


def observe_global(challenger: Challenger, caps, public_inputs) -> None:
    for cap in caps:
        challenger.observe_cap(cap)
    challenger.observe_elements(public_inputs)


def prove_all(starks: list[Stark], traces: list[np.ndarray | None],
              ctls: list[lookup.CrossTableLookup], config: StarkConfig,
              public_inputs: list[int] | None = None,
              public_values=None,
              table_public_inputs: dict[int, list[int]] | None = None,
              parallel_commits: bool = False,
              devices: list | None = None,
              mesh=None) -> AllProof:
    """Prove every in-use table under one transcript. traces[i] may be
    None for unused optional tables (zero-cap observed, no proof).
    `public_values` (a PublicValues) takes the place of raw
    public_inputs for block proofs: its Appendix-A encoding is what the
    transcript observes (get_challenges.rs:202-227).
    `table_public_inputs[t]` feeds table t's per-proof public inputs
    (e.g. the Rvm's PUB bindings) without re-observing them — the
    global observation already covers them when the caller passes the
    same values in `public_inputs`.
    `mesh`: a jax.sharding.Mesh — every table's commitment and proof
    computes rows-sharded over it (SURVEY §2.9 P1); caps and proofs are
    bit-identical to the single-device run (Appendix A determinism),
    asserted in tests/test_sharded_prove.py."""
    if public_values is not None:
        assert public_inputs is None, \
            "pass public_values OR raw public_inputs, not both"
        public_inputs = public_values.to_elements()
    public_inputs = public_inputs or []
    table_in_use = [t is not None for t in traces]

    from ..timing import timed
    challenger = Challenger()
    batches: list[PolynomialBatch | None] = []
    caps = []
    if parallel_commits:
        # P2 per-table parallelism (SURVEY §2.9): every trace commitment
        # happens BEFORE any challenger sequencing, so they are
        # independent — fan them out across threads (each JAX dispatch
        # releases the GIL; with `devices` given, round-robin the tables
        # over chips). The per-table prove phases stay sequential: the
        # shared transcript orders them by construction.
        from concurrent.futures import ThreadPoolExecutor
        import jax

        def commit(item):
            i, trace = item
            if trace is None:
                return i, None
            dev = devices[i % len(devices)] if devices else None
            ctx = jax.default_device(dev) if dev is not None else \
                _nullcontext()
            npre = starks[i].num_preprocessed
            with ctx:
                with timed(f"commit {starks[i].name} trace"):
                    return i, PolynomialBatch.from_values(
                        GF.from_u64(trace[npre:]),
                        rate_bits=config.rate_bits,
                        cap_height=config.cap_height,
                        hasher=config.hasher)

        with ThreadPoolExecutor(max_workers=len(starks)) as pool:
            results = dict(pool.map(commit, enumerate(traces)))
        for i in range(len(starks)):
            b = results[i]
            batches.append(b)
            caps.append(b.cap_ints() if b is not None
                        else _zero_cap(config))
    else:
        for stark, trace in zip(starks, traces):
            if trace is None:
                batches.append(None)
                caps.append(_zero_cap(config))
                continue
            with timed(f"commit {stark.name} trace"):
                tr = GF.from_u64(trace[stark.num_preprocessed:])
                if mesh is not None:
                    from .prover import shard_rows
                    tr = shard_rows(tr, mesh)
                b = PolynomialBatch.from_values(
                    tr, rate_bits=config.rate_bits,
                    cap_height=config.cap_height, hasher=config.hasher)
            batches.append(b)
            caps.append(b.cap_ints())
    observe_global(challenger, caps, public_inputs)
    challenges = lookup.get_challenge_set(challenger, config.num_challenges)

    proofs: list[StarkProof | None] = []
    for t, (stark, trace) in enumerate(zip(starks, traces)):
        if trace is None:
            proofs.append(None)
            continue
        groups = lookup.ctl_groups_for_table(ctls, t)
        with timed(f"prove {stark.name} {trace.shape}"):
            proofs.append(prove_stark(
                stark, trace, config, challenger,
                public_inputs=(table_public_inputs or {}).get(t),
                challenges=challenges, ctl_groups=groups,
                observe_trace_cap=False, trace_batch=batches[t],
                mesh=mesh))
    return AllProof(proofs=proofs, table_in_use=table_in_use,
                    public_inputs=list(public_inputs),
                    public_values=public_values)


def verify_all(starks: list[Stark], all_proof: AllProof,
               ctls: list[lookup.CrossTableLookup], config: StarkConfig,
               extra_looking_sums: dict[int, list[int]] | None = None,
               extra_looking_values: dict[int, list] | None = None,
               optional_tables: tuple[int, ...] = ()) -> None:
    """Verify every table proof under the replayed transcript, then check
    every CTL's global sum: sum of looking totals (+ extra looking sums,
    keyed by CTL index, one value per challenge) == looked total.

    `extra_looking_values` maps a CTL index to raw value rows the
    VERIFIER contributes (e.g. the memory table's public-value writes,
    verifier.rs:319-512); their logUp sums are computed here under the
    derived challenges — callers cannot inject arbitrary sums.
    `extra_looking_sums` remains for lower-level harnesses.

    `optional_tables` are the only table indices allowed to omit a proof
    (the reference's OPTIONAL_TABLE_INDICES, all_stark.rs:110-126);
    every other table MUST carry one — otherwise an all-None AllProof
    with degenerate 0==0 CTL sums verifies (ADVICE r1 high)."""
    extra_looking_sums = dict(extra_looking_sums or {})
    assert len(all_proof.proofs) == len(starks), "proof count mismatch"
    assert len(all_proof.table_in_use) == len(starks)
    for t, proof in enumerate(all_proof.proofs):
        assert all_proof.table_in_use[t] == (proof is not None), \
            f"table_in_use[{t}] inconsistent with supplied proofs"
        if proof is None and t not in optional_tables:
            raise AssertionError(f"missing proof for required table {t}")
    challenger = Challenger()
    caps = [p.trace_cap if p is not None else _zero_cap(config)
            for p in all_proof.proofs]
    observe_global(challenger, caps, all_proof.public_inputs)
    challenges = lookup.get_challenge_set(challenger, config.num_challenges)

    for ci, rows in (extra_looking_values or {}).items():
        sums = []
        for beta, gamma in challenges.pairs:
            s = 0
            for row in rows:
                combined = 0
                gp = 1
                for v in row:
                    combined = host.fadd(combined,
                                         host.fmul(int(v) % host.P, gp))
                    gp = host.fmul(gp, gamma)
                s = host.fadd(s, host.finv(host.fadd(beta, combined)))
            sums.append(s)
        assert ci not in extra_looking_sums
        extra_looking_sums[ci] = sums

    for t, (stark, proof) in enumerate(zip(starks, all_proof.proofs)):
        if proof is None:
            continue
        groups = lookup.ctl_groups_for_table(ctls, t)
        verify_stark(stark, proof, config, challenger,
                     challenges=challenges, ctl_groups=groups,
                     observe_trace_cap=False)

    # ---- global CTL sum check ------------------------------------------
    totals = _collect_ctl_totals(all_proof, ctls, challenges)
    nc = len(challenges.pairs)
    for ci, ctl in enumerate(ctls):
        for c in range(nc):
            looking = totals.get((ci, "looking", c), 0)
            extra = extra_looking_sums.get(ci)
            if extra is not None:
                looking = host.fadd(looking, extra[c])
            looked = totals.get((ci, "looked", c), 0)
            assert looking == looked, \
                f"CTL '{ctl.name}' unbalanced (challenge {c})"


def _collect_ctl_totals(all_proof: AllProof, ctls, challenges):
    """Sum exported Z(first) totals into (ctl_index, side, challenge)
    buckets across tables. Unused tables contribute zero."""
    totals: dict = {}
    nc = len(challenges.pairs)
    for t, proof in enumerate(all_proof.proofs):
        groups = lookup.ctl_groups_for_table(ctls, t)
        if proof is None:
            continue
        zs = proof.openings.ctl_zs_first
        assert len(zs) == nc * len(groups), \
            f"table {t}: ctl_zs_first count mismatch"
        k = 0
        for c in range(nc):
            for ci, side, _views in groups:
                key = (ci, side, c)
                totals[key] = host.fadd(totals.get(key, 0), zs[k])
                k += 1
    return totals
