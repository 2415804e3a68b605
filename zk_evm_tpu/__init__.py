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
