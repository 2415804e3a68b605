"""P7 async pipelining: witness generation overlapped with proving.

The reference's zero prover streams SegmentDataIterator output into
proving futures (zero/src/prover.rs segment stream + paladin pipelining);
the TPU analog: witness generation (host python: interpreter + table
building) runs in a producer thread while the device proves the previous
segment — JAX dispatch releases the GIL, so the two genuinely overlap.
A bounded queue caps in-flight witness memory (segments hold full
table traces)."""

from __future__ import annotations

import queue
import threading

from ..timing import timed


def prove_segments_pipelined(segment_iter, prove_fn, prefetch: int = 1):
    """Drive `segment_iter` (yielding (segment, tables)) through
    `prove_fn(tables) -> proof` with witness generation running ahead of
    proving by up to `prefetch` segments. Returns proofs in order.
    Exceptions from either side propagate to the caller."""
    q: queue.Queue = queue.Queue(maxsize=max(1, prefetch))
    DONE = object()
    err: list = []

    def produce():
        try:
            for item in segment_iter:
                q.put(item)
        except BaseException as e:            # noqa: BLE001
            err.append(e)
        finally:
            q.put(DONE)

    th = threading.Thread(target=produce, daemon=True)
    th.start()
    proofs = []
    while True:
        item = q.get()
        if item is DONE:
            break
        seg, tables = item
        with timed(f"prove segment {getattr(seg, 'index', len(proofs))}"):
            proofs.append(prove_fn(tables))
    th.join()
    if err:
        raise err[0]
    return proofs
