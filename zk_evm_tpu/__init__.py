"""zk_evm_tpu — a TPU-native STARK proving engine with the capabilities of
0xPolygonZero/zk_evm (evm_arithmetization + the starky/plonky2 proving
backend), built from scratch on JAX / XLA / Pallas.

Layer map (mirrors SURVEY.md §1, re-designed TPU-first):

  field/    Goldilocks F_p (p = 2^64 - 2^32 + 1) as 2x-uint32-limb JAX
            arithmetic + quadratic extension; host (python-int) twin.
  hash/     Poseidon-over-Goldilocks and Keccak-f[1600] batched device
            kernels; Merkle trees with caps; Fiat-Shamir challenger.
  ops/      NTT / LDE / polynomial device kernels (Pallas + XLA).
  stark/    The FRI-based STARK engine: commitments, logUp lookups,
            cross-table lookups, quotient, FRI prover/verifier.
  tables/   The 9 EVM trace tables (arithmetic, byte_packing, cpu, keccak,
            keccak_sponge, logic, memory, mem_before/after) — trace
            generation + vectorized AIR constraint evaluation.
  witness/  Host-side witness generation: kernel assembler, interpreter,
            memory model, trace recording, segmentation (zk-continuations).
  parallel/ Mesh sharding of LDE / Merkle / constraint-eval across chips.
  orchestration/  Segment -> batch -> block task graph (the reference's
            paladin/zero layer), in-process runtime.

The compute-dense pieces run on TPU; witness generation and tries stay on
host, as laid out in SURVEY.md §7.
"""

__version__ = "0.1.0"


def raise_stack_limit(want: int = 256 << 20) -> None:
    """Raise the main-thread stack soft limit: XLA:CPU's compiler
    recurses deeply on large fused programs and the default 8 MiB stack
    can overflow in long-lived prover processes (the reference's
    RUST_MIN_STACK=33554432 analog, scripts/prove_stdio.rs:38-46)."""
    import resource
    soft, hard = resource.getrlimit(resource.RLIMIT_STACK)
    if soft != resource.RLIM_INFINITY and soft < want:
        try:
            resource.setrlimit(resource.RLIMIT_STACK, (want, hard))
        except (ValueError, OSError):
            pass


def tune_allocator():
    """Keep large numpy temporaries in the malloc arena.

    Table builds allocate and free hundreds-of-MB numpy arrays per
    table; glibc's default mmap threshold (128 KB) services each from a
    fresh mmap and munmaps it on free, so every build re-faults its
    working set. Under this environment's hypervisor a page fault costs
    ~25 us — first-touch memcpy measures 0.16 GB/s vs 8 GB/s warm — so
    faults, not compute, dominated witness table builds. Raising the
    mmap/trim thresholds keeps big buffers in the arena: faulted once
    per process, reused forever (the reference gets the same effect
    from jemalloc, zero/src/bin/worker.rs:12-14).

    Called explicitly from the prover entry points (CLI, worker, bench)
    rather than at package import: mallopt mutates process-wide allocator
    state, which an embedding process must opt into.  ZK_MALLOC_TUNE=0
    disables it even there."""
    import os
    if os.environ.get("ZK_MALLOC_TUNE", "1") in ("0", "false"):
        return
    import ctypes
    import sys
    if not sys.platform.startswith("linux"):
        return
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_TRIM_THRESHOLD = -1
        M_MMAP_THRESHOLD = -3
        libc.mallopt(M_MMAP_THRESHOLD, 1 << 30)
        libc.mallopt(M_TRIM_THRESHOLD, 1 << 30)
    except OSError:
        pass


