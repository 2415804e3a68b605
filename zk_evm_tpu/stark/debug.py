"""Debug-mode constraint checking over raw traces (host-exact).

Analog of the reference's `debug_assertions` internal checks
(prover.rs:167-184): evaluate the full constraint system row by row with
exact ints and report the first violated constraint — far cheaper than a
failed proof for locating trace-generation bugs.
"""

from __future__ import annotations

import numpy as np

from ..field import HExt
from .stark import Stark, StarkFrame


class _RowChecker:
    def __init__(self, row: int, n: int):
        self.row = row
        self.n = n
        self.idx = 0

    def _check(self, c, active: bool):
        if active and isinstance(c, HExt) and c.v != (0, 0):
            raise AssertionError(
                f"constraint #{self.idx} violated at row {self.row}: {c}")
        self.idx += 1

    def constraint(self, c):
        self._check(c, True)

    def constraint_transition(self, c):
        self._check(c, self.row < self.n - 1)

    def constraint_first_row(self, c):
        self._check(c, self.row == 0)

    def constraint_last_row(self, c):
        self._check(c, self.row == self.n - 1)


class _NpF:
    """Whole-column field element for vectorized raw-trace checking."""
    __slots__ = ("v",)

    def __init__(self, v):
        self.v = np.asarray(v, dtype=np.uint64)

    @staticmethod
    def _coerce(x):
        if isinstance(x, _NpF):
            return x.v
        return np.uint64(int(x) % np_field.P)

    def __add__(self, o):
        return _NpF(np_field.add(self.v, self._coerce(o)))
    __radd__ = __add__

    def __sub__(self, o):
        return _NpF(np_field.sub(self.v, self._coerce(o)))

    def __rsub__(self, o):
        return _NpF(np_field.sub(self._coerce(o), self.v))

    def __mul__(self, o):
        return _NpF(np_field.mul(self.v, self._coerce(o)))
    __rmul__ = __mul__

    def __neg__(self):
        return _NpF(np_field.sub(np.uint64(0), self.v))


class _NpChecker:
    def __init__(self, n: int):
        self.n = n
        self.idx = 0

    def _check(self, c, mask):
        v = c.v if isinstance(c, _NpF) else None
        if v is not None:
            bad = np.nonzero(v[mask] if mask is not None else v)[0]
            if len(bad):
                r = int(bad[0])
                raise AssertionError(
                    f"constraint #{self.idx} violated at row {r} "
                    f"(value {int((v[mask] if mask is not None else v)[r])})")
        self.idx += 1

    def constraint(self, c):
        self._check(c, None)

    def constraint_transition(self, c):
        self._check(c, slice(0, self.n - 1))

    def constraint_first_row(self, c):
        self._check(c, slice(0, 1))

    def constraint_last_row(self, c):
        self._check(c, slice(self.n - 1, self.n))


from ..field import np_field


def check_constraints_np(stark: Stark, trace: np.ndarray,
                         public_inputs: list[int] | None = None) -> None:
    """Vectorized all-rows raw-trace check (uint64 numpy field ops) —
    the fast path for wide/long traces like the CPU table."""
    n = trace.shape[1]
    nxt = np.roll(np.arange(n), -1)
    frame = StarkFrame(
        local=[_NpF(trace[i]) for i in range(trace.shape[0])],
        next_=[_NpF(trace[i][nxt]) for i in range(trace.shape[0])],
        public_inputs=list(public_inputs or []))
    stark.eval(frame, _NpChecker(n))


def check_constraints(stark: Stark, trace: np.ndarray,
                      rows: list[int] | None = None,
                      public_inputs: list[int] | None = None,
                      aux: np.ndarray | None = None,
                      eval_extra=None) -> None:
    """Check stark.eval row-by-row on the raw trace (wrap-around next
    row). `rows=None` checks every row; pass a subset for wide traces.
    `aux`/`eval_extra` allow checking lookup/CTL constraints too."""
    n = trace.shape[1]
    if rows is None:
        rows = list(range(n))
    for r in rows:
        nxt = (r + 1) % n
        frame = StarkFrame(
            local=[HExt(int(v)) for v in trace[:, r]],
            next_=[HExt(int(v)) for v in trace[:, nxt]],
            public_inputs=list(public_inputs or []),
            aux_local=[HExt(int(v)) for v in aux[:, r]]
            if aux is not None else [],
            aux_next=[HExt(int(v)) for v in aux[:, nxt]]
            if aux is not None else [])
        cc = _RowChecker(r, n)
        stark.eval(frame, cc)
        if eval_extra is not None:
            eval_extra(frame, cc)
