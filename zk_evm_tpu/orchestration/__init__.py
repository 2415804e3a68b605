from .runtime import Runtime, Operation, Monoid, AbortSignal
from .prover import SegmentTask, prove_segments

__all__ = ["Runtime", "Operation", "Monoid", "AbortSignal",
           "SegmentTask", "prove_segments"]
