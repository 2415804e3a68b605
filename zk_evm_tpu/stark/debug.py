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
