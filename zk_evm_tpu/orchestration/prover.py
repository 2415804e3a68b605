"""Segment -> batch proving pipeline over the in-process runtime.

Shape of the reference's `BlockProverInput::prove` (zero/src/prover.rs:97-
333): segments prove independently (zk-continuations, SURVEY.md §2.9 P3),
then aggregate in a binary tree. Until the recursive aggregation circuits
land, aggregation is structural: adjacent segments are chained by checking
MemAfter == next MemBefore dictionaries (the same consistency the
reference's segment-aggregation circuit enforces on public values), and
the "aggregate" carries the ordered proof list.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..stark import prove_all, verify_all
from .runtime import Runtime, Operation, Monoid


@dataclass
class SegmentTask:
    """One zk-continuation segment: per-table traces + continuation
    dictionaries (mem_before/mem_after as address->value maps)."""
    index: int
    traces: list
    mem_before: dict
    mem_after: dict
    public_inputs: list = field(default_factory=list)


@dataclass
class SegmentProofResult:
    index: int
    proof: object
    mem_before: dict
    mem_after: dict


@dataclass
class AggSegmentProof:
    first: int
    last: int
    proofs: list
    mem_before: dict
    mem_after: dict


class SegmentProofOp(Operation):
    def __init__(self, starks, ctls, config):
        self.starks = starks
        self.ctls = ctls
        self.config = config

    def execute(self, task: SegmentTask, abort):
        abort.check()
        proof = prove_all(self.starks, task.traces, self.ctls, self.config,
                          public_inputs=task.public_inputs)
        return SegmentProofResult(task.index, proof, task.mem_before,
                                  task.mem_after)


class SegmentAggMonoid(Monoid):
    """Chains adjacent segments: rhs.mem_before must equal lhs.mem_after
    (the reference's aggregation-circuit public-value constraint,
    fixed_recursive_verifier.rs:2298-2408)."""

    def empty(self):
        return AggSegmentProof(0, -1, [], {}, {})

    def _lift(self, x):
        if isinstance(x, SegmentProofResult):
            return AggSegmentProof(x.index, x.index, [x.proof],
                                   x.mem_before, x.mem_after)
        return x

    def combine(self, a, b, abort):
        abort.check()
        a, b = self._lift(a), self._lift(b)
        if a.last == -1:
            return b
        if b.last == -1:
            return a
        assert a.last + 1 == b.first, "non-adjacent segments"
        assert a.mem_after == b.mem_before, \
            "continuation mismatch: mem_after != next mem_before"
        return AggSegmentProof(a.first, b.last, a.proofs + b.proofs,
                               a.mem_before, b.mem_after)


def prove_segments(starks, ctls, config, tasks: list[SegmentTask],
                   runtime: Runtime | None = None) -> AggSegmentProof:
    rt = runtime or Runtime()
    results = rt.map(SegmentProofOp(starks, ctls, config), tasks)
    return rt.fold(SegmentAggMonoid(), results)
