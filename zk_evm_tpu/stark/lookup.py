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
class ColExpr:
    """Linear combination of trace columns (current and/or next row) plus a
    constant — the reference's `Column` (starky::lookup::Column; e.g. the
    Memory table looks up next-row addr_virtual, BytePacking's CTL exposes
    packed u32 limbs as byte combinations)."""
    terms: tuple[tuple[int, int], ...] = ()        # (column, coeff)
    next_terms: tuple[tuple[int, int], ...] = ()   # next-row (column, coeff)
    const: int = 0

    def eval(self, local, nxt=None):
        acc = None
        for c, k in self.terms:
            t = local[c] * (k % host.P)
            acc = t if acc is None else acc + t
        for c, k in self.next_terms:
            t = nxt[c] * (k % host.P)
            acc = t if acc is None else acc + t
        if self.const:
            acc = self.const if acc is None else acc + self.const
        if acc is None:
            return 0
        return acc

    def eval_np(self, trace: np.ndarray) -> np.ndarray:
        from ..field import np_field
        n = trace.shape[1]
        acc = np.full(n, np.uint64(self.const % host.P), dtype=np.uint64)
        for c, k in self.terms:
            acc = np_field.add(acc, np_field.mul(trace[c],
                                                 np.uint64(k % host.P)))
        for c, k in self.next_terms:
            rolled = np.roll(trace[c], -1)
            acc = np_field.add(acc, np_field.mul(rolled,
                                                 np.uint64(k % host.P)))
        return acc

    def uses_next(self) -> bool:
        return bool(self.next_terms)


def col(c: int) -> ColExpr:
    return ColExpr(terms=((c, 1),))


def col_next(c: int) -> ColExpr:
    return ColExpr(next_terms=((c, 1),))


def _coerce_expr(x) -> ColExpr:
    return x if isinstance(x, ColExpr) else col(x)


@dataclass(frozen=True)
class Lookup:
    """In-table logUp: every value of each looking column (expression)
    appears in `table_column`; `frequencies_column` holds the
    multiplicities. `filters` (optional, per looking column) restrict
    which rows contribute."""
    looking_columns: tuple
    table_column: int | ColExpr = 0
    frequencies_column: int = 0
    filters: tuple | None = None           # per looking column, or None

    def num_helpers(self) -> int:
        return (len(self.looking_columns) + 1) // 2 + 1  # + table helper


@dataclass(frozen=True)
class Filter:
    """Row filter: a column, a product of two columns, a sum of columns,
    or constant-1 (all fields None)."""
    column: int | None = None
    product: tuple[int, int] | None = None
    sum_cols: tuple[int, ...] | None = None

    def eval(self, local):
        """In either algebra, from local column values."""
        if self.product is not None:
            a, b = self.product
            return local[a] * local[b]
        if self.sum_cols is not None:
            acc = local[self.sum_cols[0]]
            for c in self.sum_cols[1:]:
                acc = acc + local[c]
            return acc
        if self.column is not None:
            return local[self.column]
        return None  # constant 1

    def eval_np(self, trace: np.ndarray) -> np.ndarray:
        from ..field import np_field
        if self.product is not None:
            a, b = self.product
            return np_field.mul(trace[a], trace[b])
        if self.sum_cols is not None:
            acc = trace[self.sum_cols[0]].astype(np.uint64)
            for c in self.sum_cols[1:]:
                acc = np_field.add(acc, trace[c])
            return acc
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


def _combine(local, nxt, columns, gamma: int):
    """gamma-weighted combination of column expressions."""
    exprs = [_coerce_expr(c) for c in columns]
    acc = exprs[0].eval(local, nxt)
    gp = gamma
    for e in exprs[1:]:
        acc = acc + e.eval(local, nxt) * gp
        gp = host.fmul(gp, gamma)
    return acc


def generate_aux_trace(trace_gf: GF, lookups: list[Lookup],
                       views: list[CtlView],
                       challenges: ChallengeSet) -> GF | None:
    """Build all aux columns for one table. trace_gf: (cols, n).
    Returns (num_aux, n) GF or None if no aux needed."""
    cols = [trace_gf[i] for i in range(trace_gf.shape[0])]
    nxt = [c.roll(-1, axis=-1) for c in cols] if any(
        _coerce_expr(e).uses_next()
        for lk in lookups for e in list(lk.looking_columns)
        + [lk.table_column]) or any(
        _coerce_expr(c).uses_next() for v in views for c in v.columns) \
        else cols
    out: list[GF] = []
    for beta, gamma in challenges.pairs:
        b = GF.const(beta)

        def term(expr, filt):
            h = (b + _coerce_expr(expr).eval(cols, nxt)).inv()
            f = filt.eval(cols) if filt is not None else None
            return h if f is None else h * f

        for lk in lookups:
            delta = None
            lc = list(lk.looking_columns)
            filts = list(lk.filters) if lk.filters else [None] * len(lc)
            for i in range(0, len(lc) - 1, 2):
                h = term(lc[i], filts[i]) + term(lc[i + 1], filts[i + 1])
                out.append(h)
                delta = h if delta is None else delta + h
            if len(lc) % 2 == 1:
                h = term(lc[-1], filts[-1])
                out.append(h)
                delta = h if delta is None else delta + h
            ht = cols[lk.frequencies_column] * \
                (b + _coerce_expr(lk.table_column).eval(cols, nxt)).inv()
            out.append(ht)
            delta = delta - ht
            out.append(_gf_suffix_sum(delta))
        for v in views:
            combined = _combine(cols, nxt, v.columns, gamma)
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
    nxt = frame.next
    aux = frame.aux_local
    aux_next = frame.aux_next
    k = 0
    for beta, gamma in challenges.pairs:
        for lk in lookups:
            delta = None
            lc = list(lk.looking_columns)
            filts = list(lk.filters) if lk.filters else [None] * len(lc)

            def cf(i):
                c = _coerce_expr(lc[i]).eval(local, nxt) + beta
                f = filts[i].eval(local) if filts[i] is not None else 1
                return c, f

            for i in range(0, len(lc) - 1, 2):
                h = aux[k]
                c1, f1 = cf(i)
                c2, f2 = cf(i + 1)
                cc.constraint(h * c1 * c2 - (f1 * c2 + f2 * c1))
                delta = h if delta is None else delta + h
                k += 1
            if len(lc) % 2 == 1:
                h = aux[k]
                c1, f1 = cf(len(lc) - 1)
                cc.constraint(h * c1 - f1)
                delta = h if delta is None else delta + h
                k += 1
            ht = aux[k]
            tcol = _coerce_expr(lk.table_column).eval(local, nxt)
            cc.constraint(ht * (tcol + beta)
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
            combined = _combine(local, nxt, v.columns, gamma) + beta
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
