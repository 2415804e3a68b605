"""logUp lookups and cross-table lookup (CTL) machinery.

Functional twin of starky's lookup/CTL arguments as used by the reference
(in-table range checks e.g. arithmetic RANGE_COUNTER/RC_FREQUENCIES,
/root/reference/evm_arithmetization/src/arithmetic/columns.rs:113-116;
10 CTLs wired in all_stark.rs:153-172; logUp spec in
book/src/framework/range_check.md and ctls.md).

Design (suffix-sum form; see stark/DESIGN.md):
- challenge set: per global challenge c, a pair (beta_c, gamma_c);
  columns combine as gamma^0 v0 + gamma^1 v1 + ... and denominators are
  (beta + combined).
- in-table lookup: looking columns paired into helpers
  h = 1/(b+C1) + 1/(b+C2), table side ht = freq/(b+T); running column
  Z(x) = delta(x) + Z(g x), delta = sum(h) - ht, with Z(first) == 0.
- CTL view (one side of a cross-table lookup in one table): helper
  h = filter/(b+combined), running Z with delta = h; Z(first) is the
  view's exported total, opened at x=1 ("ctl_zs_first") and summed across
  tables by the global verifier.

Aux trace generation runs on device (batched loop-inverse + an
associative-scan suffix sum); constraint evaluation is one generic routine
over either algebra (GF arrays / HExt scalars).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax

from ..field import GF, host


# ---------------------------------------------------------------------------
# Specs
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Lookup:
    """In-table logUp: every value of each looking column appears in
    `table_column`; `frequencies_column` holds the multiplicities."""
    looking_columns: tuple[int, ...]
    table_column: int
    frequencies_column: int

    def num_helpers(self) -> int:
        return (len(self.looking_columns) + 1) // 2 + 1  # + table helper


@dataclass(frozen=True)
class Filter:
    """Row filter: product of up to two columns, or a constant-1 (None)."""
    column: int | None = None
    product: tuple[int, int] | None = None

    def eval(self, local):
        """In either algebra, from local column values."""
        if self.product is not None:
            a, b = self.product
            return local[a] * local[b]
        if self.column is not None:
            return local[self.column]
        return None  # constant 1

    def eval_np(self, trace: np.ndarray) -> np.ndarray:
        from ..field import np_field
        if self.product is not None:
            a, b = self.product
            return np_field.mul(trace[a], trace[b])
        if self.column is not None:
            return trace[self.column].astype(np.uint64)
        return np.ones(trace.shape[1], dtype=np.uint64)


@dataclass(frozen=True)
class CtlView:
    """One side of a CTL inside one table: the filtered rows contribute
    their combined column tuple to the multiset."""
    table: int                     # table index in the AllStark registry
    columns: tuple[int, ...]
    filter: Filter = field(default_factory=Filter)


@dataclass(frozen=True)
class CrossTableLookup:
    """Multiset equality: union of looking views' rows == looked view's
    rows (the reference's 1:1 coprocessor dispatch CTLs)."""
    name: str
    looking: tuple[CtlView, ...]
    looked: CtlView


@dataclass(frozen=True)
class ChallengeSet:
    """num_challenges (beta, gamma) pairs, drawn once globally."""
    pairs: tuple[tuple[int, int], ...]


def get_challenge_set(challenger, num_challenges: int) -> ChallengeSet:
    return ChallengeSet(tuple(
        (challenger.get_challenge(), challenger.get_challenge())
        for _ in range(num_challenges)))


def views_for_table(ctls: list[CrossTableLookup],
                    table: int) -> list[CtlView]:
    """All CTL views living in `table`, in canonical aux order: per CTL,
    looking views first (listed order), then the looked view."""
    out = []
    for ctl in ctls:
        for v in ctl.looking:
            if v.table == table:
                out.append(v)
        if ctl.looked.table == table:
            out.append(ctl.looked)
    return out


def num_aux_columns(lookups: list[Lookup], views: list[CtlView],
                    num_challenges: int) -> int:
    per = sum(lk.num_helpers() + 1 for lk in lookups) + 2 * len(views)
    return per * num_challenges


# ---------------------------------------------------------------------------
# Aux trace generation (device)
# ---------------------------------------------------------------------------

def _gf_suffix_sum(x: GF) -> GF:
    """Z[i] = sum_{j >= i} x[j], via an associative scan (device)."""
    from ..field import goldilocks as gl

    def add_pair(a, b):
        lo, hi = gl.add(a[0], a[1], b[0], b[1])
        return (lo, hi)

    axis = x.lo.ndim - 1
    lo, hi = jax.lax.associative_scan(
        add_pair, (x.lo, x.hi), reverse=True, axis=axis)
    return GF(lo, hi)


def _combine(local, columns, gamma: int):
    acc = local[columns[0]]
    gp = gamma
    for c in columns[1:]:
        acc = acc + local[c] * gp
        gp = host.fmul(gp, gamma)
    return acc


def generate_aux_trace(trace_gf: GF, lookups: list[Lookup],
                       views: list[CtlView],
                       challenges: ChallengeSet) -> GF | None:
    """Build all aux columns for one table. trace_gf: (cols, n).
    Returns (num_aux, n) GF or None if no aux needed."""
    cols = [trace_gf[i] for i in range(trace_gf.shape[0])]
    out: list[GF] = []
    for beta, gamma in challenges.pairs:
        b = GF.const(beta)
        for lk in lookups:
            delta = None
            lc = lk.looking_columns
            for i in range(0, len(lc) - 1, 2):
                h = (b + cols[lc[i]]).inv() + (b + cols[lc[i + 1]]).inv()
                out.append(h)
                delta = h if delta is None else delta + h
            if len(lc) % 2 == 1:
                h = (b + cols[lc[-1]]).inv()
                out.append(h)
                delta = h if delta is None else delta + h
            ht = cols[lk.frequencies_column] * \
                (b + cols[lk.table_column]).inv()
            out.append(ht)
            delta = delta - ht
            out.append(_gf_suffix_sum(delta))
        for v in views:
            combined = _combine(cols, v.columns, gamma)
            f = v.filter.eval(cols)
            h = (b + combined).inv()
            if f is not None:
                h = h * f
            out.append(h)
            out.append(_gf_suffix_sum(h))
    if not out:
        return None
    return GF.stack(out, axis=0)


# ---------------------------------------------------------------------------
# Generic constraint evaluation (runs in both algebras)
# ---------------------------------------------------------------------------

def eval_aux_constraints(lookups: list[Lookup], views: list[CtlView],
                         challenges: ChallengeSet, frame, cc) -> None:
    """Append all lookup/CTL constraints to the consumer. `frame` must
    carry aux_local / aux_next aligned with generate_aux_trace's layout."""
    local = frame.local
    aux = frame.aux_local
    aux_next = frame.aux_next
    k = 0
    for beta, gamma in challenges.pairs:
        for lk in lookups:
            delta = None
            lc = lk.looking_columns
            for i in range(0, len(lc) - 1, 2):
                h = aux[k]
                c1 = local[lc[i]] + beta
                c2 = local[lc[i + 1]] + beta
                cc.constraint(h * c1 * c2 - (c1 + c2))
                delta = h if delta is None else delta + h
                k += 1
            if len(lc) % 2 == 1:
                h = aux[k]
                cc.constraint(h * (local[lc[-1]] + beta) - 1)
                delta = h if delta is None else delta + h
                k += 1
            ht = aux[k]
            cc.constraint(ht * (local[lk.table_column] + beta)
                          - local[lk.frequencies_column])
            delta = delta - ht
            k += 1
            z = aux[k]
            z_next = aux_next[k]
            cc.constraint_transition(z - delta - z_next)
            cc.constraint_last_row(z - delta)
            cc.constraint_first_row(z)      # in-table lookups balance to 0
            k += 1
        for v in views:
            h = aux[k]
            combined = _combine(local, v.columns, gamma) + beta
            f = v.filter.eval(local)
            rhs = 1 if f is None else f
            cc.constraint(h * combined - rhs)
            k += 1
            z = aux[k]
            z_next = aux_next[k]
            cc.constraint_transition(z - h - z_next)
            cc.constraint_last_row(z - h)
            # Z(first) is exported (ctl_zs_first), not constrained to 0
            k += 1


def ctl_z_first_indices(lookups: list[Lookup], views: list[CtlView],
                        challenges: ChallengeSet) -> list[int]:
    """Aux-column indices of the CTL Z columns (whose x=1 openings are the
    exported totals), in (challenge, view) order."""
    out = []
    k = 0
    per_lookup = [lk.num_helpers() + 1 for lk in lookups]
    for _ in challenges.pairs:
        k += sum(per_lookup)
        for _v in views:
            k += 1          # helper
            out.append(k)   # Z
            k += 1
    return out
