"""Persistent XLA compilation cache + degree bucketing policy.

The proving pipeline's cold-start cost is dominated by XLA compilation
(one executable per (table, 2^k) shape). Two mitigations, mirroring the
reference's fixed per-table degree ranges (zero/src/prover_state/
circuit.rs:79-90, where every circuit is built once per size bucket and
persisted):

1. `enable_persistent_cache()` points JAX at an on-disk executable
   cache, so a re-prove of any already-seen shape skips compilation
   entirely (seconds instead of tens of minutes).
2. `bucket_rows(table_rows)` pads a trace length up to the next allowed
   power of two from a coarse bucket ladder, collapsing the shape space
   so a few warm executables cover every block.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser(
    os.environ.get("ZK_EVM_TPU_CACHE", "~/.cache/zk_evm_tpu/xla"))

# Allowed log2 sizes per proving shape: every table pads to one of
# these, so at most len(BUCKETS) executables exist per (table, phase).
# Contiguous like the reference's per-table circuit ranges
# (zero/src/prover_state/circuit.rs:79-90, every integer degree in
# range) — a gapped ladder would pad up to 2x rows, doubling prove
# work for the biggest tables; the floor at 2^8 only lifts trivial
# shapes.
BUCKETS = tuple(range(8, 23))


def enable_persistent_cache(path: str | None = None,
                            min_compile_secs: float = 0.1) -> str:
    """Idempotently enable the on-disk XLA executable cache.

    The threshold is low (0.1 s, not the 1 s default) because a proving
    run issues HUNDREDS of medium-sized programs (per-table transcript
    steps, FRI rounds, window programs); at 1 s each run re-pays the
    long tail, which dominates e.g. the 8-virtual-device dryrun."""
    import jax
    if path is None:
        # Segregate by backend: the cache stores AOT executables whose
        # machine features are backend- (and host-) specific. A CPU
        # process reading TPU-era entries spends MINUTES in
        # cpu_aot_loader rejecting every candidate (observed round 5:
        # a 17 s windowed-quotient compile took >9 min through a
        # TPU-polluted cache) — and vice versa.
        path = os.path.join(_DEFAULT_DIR, jax.default_backend())
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return path


def bucket_log2(n_rows: int) -> int:
    """Smallest allowed log2 bucket holding n_rows."""
    need = max(n_rows, 2).bit_length() - 1
    if (1 << need) < n_rows:
        need += 1
    for b in BUCKETS:
        if b >= need:
            return b
    return need


def bucket_rows(n_rows: int) -> int:
    return 1 << bucket_log2(n_rows)
