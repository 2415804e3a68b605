"""A/B the windowed (jit) quotient path against the eager path, per table.

Round-5 debugging tool for the round-4 regression: on-TPU proofs from the
windowed quotient fail verification ("constraint identity failed") while
eager proofs on the same chip verify. Two phases:

  python scripts/ab_quotient.py ref            # CPU eager ground truth -> npz
  python scripts/ab_quotient.py tpu [wlog]     # TPU windowed, diff vs npz
  python scripts/ab_quotient.py cpuwin [wlog]  # CPU windowed (eager-exec, no
                                               # jit) sanity check of windowing

The ref phase runs the eager per-op path on the CPU backend (the exact code
the green default suite exercises); the tpu phase compares element-wise and
reports the first divergent (constraint-chunk, position).
"""
import sys
sys.path.insert(0, ".")
import os

mode = sys.argv[1] if len(sys.argv) > 1 else "ref"
wlog = sys.argv[2] if len(sys.argv) > 2 else "16"
REF_NPZ = "/tmp/ab_quotient_ref.npz"

if mode in ("ref", "cpuwin"):
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
import jax
if mode in ("ref", "cpuwin"):
    jax.config.update("jax_platforms", "cpu")
from zk_evm_tpu.compile_cache import enable_persistent_cache
enable_persistent_cache()
print("backend:", jax.default_backend(), flush=True)

import time
import numpy as np
from zk_evm_tpu.field import GF
from zk_evm_tpu.stark import StarkConfig, FriConfig
from zk_evm_tpu.stark import prover as P
from zk_evm_tpu.stark import lookup
from zk_evm_tpu.stark.poly_batch import PolynomialBatch
from zk_evm_tpu.tables import all_stark as ast
from zk_evm_tpu.tables.scenarios import build_cdk_poseidon_scenario

traces, cpu_stark = build_cdk_poseidon_scenario()
starks = ast.all_starks("cdk_erigon")
starks[ast.Table.Cpu] = cpu_stark
ctls = ast.all_cross_table_lookups("cdk_erigon")
cfg = StarkConfig(security_bits=1,
                  fri_config=FriConfig(rate_bits=1, cap_height=2,
                                       proof_of_work_bits=0, num_query_rounds=1,
                                       arity_bits=2, final_poly_bits=2))

rng = np.random.default_rng(42)
num_ch = cfg.num_challenges
pairs = tuple((int(rng.integers(1, 2**63)), int(rng.integers(1, 2**63)))
              for _ in range(num_ch))
challenges = lookup.ChallengeSet(pairs)
alphas = [int(rng.integers(1, 2**63)) for _ in range(num_ch)]

os.environ["ZK_QUOTIENT_WINDOW_LOG"] = wlog
os.environ["ZK_JIT_QUOTIENT"] = "0" if mode == "ref" else "1"
if mode == "cpuwin":
    # exercise the windowed WINDOWING (slicing/concat/cache) but execute
    # each window eagerly: monkeypatch jax.jit to identity for the window fn
    P._QUOTIENT_FN_CACHE.clear()
    _realjit = jax.jit
    jax.jit = lambda f, **kw: f
ref = np.load(REF_NPZ) if mode != "ref" and os.path.exists(REF_NPZ) else None
out = {}

# smallest tables first so divergence (if any) surfaces early
order = sorted((ti for ti, t in enumerate(traces) if t is not None),
               key=lambda ti: traces[ti].size)
for ti in order:
    trace = traces[ti]
    stark = starks[ti]
    groups = lookup.ctl_groups_for_table(ctls, ti)
    lookups = stark.lookups()
    trace_gf = GF.from_u64(trace)
    npre = stark.num_preprocessed
    t0 = time.time()
    tb = PolynomialBatch.from_values(
        trace_gf[npre:] if npre else trace_gf,
        rate_bits=cfg.rate_bits, cap_height=cfg.cap_height)
    aux_batch = None
    if lookups or groups:
        aux_gf = lookup.generate_aux_trace(trace_gf, lookups, groups, challenges)
        aux_batch = PolynomialBatch.from_values(
            aux_gf, rate_bits=cfg.rate_bits, cap_height=cfg.cap_height)
    pre_batch = stark.preprocessed_batch(cfg)
    q = P._quotient_chunks(stark, tb, aux_batch, lookups, groups,
                           challenges, alphas, cfg, [], pre_batch=pre_batch)
    a = np.asarray(q.to_u64())
    name = type(stark).__name__
    print(f"table {ti} ({name}): shape={a.shape} cols={trace.shape[0]} "
          f"n={trace.shape[1]} in {time.time()-t0:.1f}s", flush=True)
    out[str(ti)] = a
    if ref is not None:
        b = ref[str(ti)]
        if np.array_equal(a, b):
            print(f"  == ref OK", flush=True)
        else:
            bad = np.argwhere(a != b)
            print(f"  MISMATCH {len(bad)} positions; first {bad[:5].tolist()}",
                  flush=True)
            i, j = bad[0]
            print(f"  ref={b[i, j]:#x} got={a[i, j]:#x}", flush=True)

if mode == "ref":
    np.savez(REF_NPZ, **out)
    print("saved", REF_NPZ, flush=True)
print("DONE", flush=True)
