"""Benchmark: trace-commitment throughput (LDE + Poseidon-Merkle cap) on
the real TPU chip.

This is the reference prover's bottleneck operation ("the prover bottleneck
is Merkle-tree construction over LDEs", /root/reference/book/src/framework/
cost_model.md:2; invoked per table at evm_arithmetization/src/
prover.rs:100-111). Metric: committed trace field-elements per second
(polys * rows / wall), including the 2x LDE, full leaf hashing and tree
reduction to a height-4 cap.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no absolute numbers (BASELINE.md); vs_baseline is
measured against the round-1 recorded value of this same benchmark, so the
ratio tracks progress across rounds.
"""

import json
import sys
import time

import numpy as np

# Round-1 anchor: median of device-chained runs on TPU v5 lite (shared
# pool; occasional contention dips are environmental).
BASELINE_MELEM_S = 15.0

POLYS = 64
LOG_N = 15          # 2^15 rows -> 2^16-point LDE, 2M committed elements
ITERS = 10


def _init_backend(timeout_s: float = 120.0) -> str:
    """Probe the TPU (axon) tunnel in a SUBPROCESS — a stuck in-process
    probe would hold jax's backend-init lock and deadlock any fallback —
    and pin the CPU platform before this process's first backend init
    when the tunnel is unreachable. Returns the platform in use."""
    import subprocess
    import jax
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            capture_output=True, timeout=timeout_s, text=True)
        platform = r.stdout.strip().splitlines()[-1] if r.returncode == 0 \
            and r.stdout.strip() else None
    except subprocess.TimeoutExpired:
        platform = None
    if platform:
        return platform
    jax.config.update("jax_platforms", "cpu")
    return "cpu"


def main() -> None:
    import jax
    platform = _init_backend()
    global POLYS, LOG_N, ITERS
    if platform == "cpu":
        # tunnel-down fallback: tiny shapes so the run still completes;
        # the JSON line carries platform=cpu so the number is not read
        # as a TPU result
        POLYS, LOG_N, ITERS = 16, 12, 2
    from zk_evm_tpu.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    from zk_evm_tpu.field import GF, host
    from zk_evm_tpu.parallel import commit_cap

    rng = np.random.default_rng(42)
    values = rng.integers(0, host.P, size=(POLYS, 1 << LOG_N),
                          dtype=np.uint64)
    gf = GF.from_u64(values)

    # NOTE on methodology: block_until_ready does not actually block on
    # the axon tunnel backend and host readbacks measure the tunnel, not
    # the chip — so iterations are chained on-device (each commit's input
    # depends on the previous cap) and only the final scalar comes back.
    import jax.numpy as jnp
    from zk_evm_tpu.field import GF as _GF

    @jax.jit
    def chained(values, seed):
        seeded = _GF(values.lo.at[0, 0].add(seed), values.hi)
        return commit_cap(seeded, cap_height=4)

    cap = chained(gf, jnp.uint32(0))
    cap.to_u64()                                  # compile + settle

    t0 = time.time()
    seed = jnp.uint32(0)
    for _ in range(ITERS):
        cap = chained(gf, seed)
        seed = cap.lo[0, 0]
    seed.item()
    dt = (time.time() - t0) / ITERS

    elems = POLYS * (1 << LOG_N)
    melem_s = elems / dt / 1e6

    # ---- north-star sub-metrics (BASELINE.json): NTT Gelem/s and
    # Poseidon Mperm/s, measured with the same chained-iteration trick.
    from zk_evm_tpu import ntt as _ntt
    from zk_evm_tpu.hash import poseidon as _poseidon

    @jax.jit
    def chained_ntt(values, seed):
        seeded = _GF(values.lo.at[0, 0].add(seed), values.hi)
        return _ntt.lde_bitrev(seeded, rate_bits=1)

    out = chained_ntt(gf, jnp.uint32(0))
    out.to_u64()
    t0 = time.time()
    seed = jnp.uint32(0)
    for _ in range(ITERS):
        out = chained_ntt(gf, seed)
        seed = out.lo[0, 0]
    seed.item()
    ntt_dt = (time.time() - t0) / ITERS
    ntt_gelem_s = elems / ntt_dt / 1e9

    perm_rows = 1 << (18 if platform != "cpu" else 13)
    hval = rng.integers(0, host.P, size=(perm_rows, 8), dtype=np.uint64)
    hgf = GF.from_u64(hval)

    @jax.jit
    def chained_perm(rows, seed):
        seeded = _GF(rows.lo.at[0, 0].add(seed), rows.hi)
        return _poseidon.hash_rows(seeded)

    d = chained_perm(hgf, jnp.uint32(0))
    d.to_u64()
    t0 = time.time()
    seed = jnp.uint32(0)
    for _ in range(ITERS):
        d = chained_perm(hgf, seed)
        seed = d.lo[0, 0]
    seed.item()
    perm_dt = (time.time() - t0) / ITERS
    mperm_s = perm_rows / perm_dt / 1e6

    print(json.dumps({
        "metric": "trace_commit_throughput",
        "value": round(melem_s, 2),
        "unit": "Melem/s",
        "vs_baseline": round(melem_s / BASELINE_MELEM_S, 3),
        "ntt_gelem_s": round(ntt_gelem_s, 3),
        "poseidon_mperm_s": round(mperm_s, 2),
        "platform": platform,
    }))


if __name__ == "__main__":
    main()
