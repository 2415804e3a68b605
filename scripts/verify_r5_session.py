"""Round-5 chip verification session: the windowed (jit) quotient path —
the default on any real accelerator — must produce VERIFYING proofs on
the TPU for both the eth sponge scenario (Keccak/Logic/Memory CTL graph)
and the cdk Poseidon scenario. This is the prove→verify invariant of
/root/reference/evm_arithmetization/src/prover.rs:72-184 + verifier.rs:172,
which round 4 broke on-chip (verify_r4.log EXIT=1); round 5 fixes it with
the stacked constraint fold (stark/stark.py StackingConsumer).
"""
import sys; sys.path.insert(0, ".")
import subprocess, time
r = subprocess.run([sys.executable, "-c", "import jax; print(jax.default_backend())"],
                   capture_output=True, timeout=120, text=True)
platform = r.stdout.strip().splitlines()[-1] if r.returncode == 0 else None
print("tunnel probe:", platform, flush=True)
assert platform == "tpu", "tunnel down"

from zk_evm_tpu.compile_cache import enable_persistent_cache
enable_persistent_cache()
import jax
print("backend:", jax.default_backend(), flush=True)
import os
assert os.environ.get("ZK_JIT_QUOTIENT") is None
from zk_evm_tpu.stark.prover import _use_jit_quotient, _use_stack_fold
assert _use_jit_quotient(), "windowed jit path must be the default on TPU"
assert _use_stack_fold(), "stacked fold must be the default"

from zk_evm_tpu.stark import StarkConfig, FriConfig, prove_all, verify_all
from zk_evm_tpu.tables import all_stark as ast
from zk_evm_tpu.tables.scenarios import (build_sponge_scenario,
                                         cpu_side_extra_sums,
                                         build_cdk_poseidon_scenario)

cfg = StarkConfig(security_bits=1,
                  fri_config=FriConfig(rate_bits=1, cap_height=2,
                                       proof_of_work_bits=0, num_query_rounds=1,
                                       arity_bits=2, final_poly_bits=2))

# --- eth sponge scenario (exercises Keccak's block constraints) ---------
traces, sponge_trace = build_sponge_scenario()
starks = ast.all_starks()
ctls = ast.all_cross_table_lookups()
optional = tuple(i for i, t in enumerate(traces) if t is None)
t0 = time.time()
proof = prove_all(starks, traces, ctls, cfg)
print(f"eth sponge AllStark proved on {jax.default_backend()} (windowed) "
      f"in {time.time()-t0:.1f}s", flush=True)
extra = cpu_side_extra_sums(proof, ctls, cfg, sponge_trace)
verify_all(starks, proof, ctls, cfg, extra_looking_sums=extra,
           optional_tables=optional)
print("host verifier accepted the TPU sponge proof", flush=True)

# --- cdk Poseidon scenario (round-4's red case) -------------------------
traces, cpu_stark = build_cdk_poseidon_scenario()
starks = ast.all_starks("cdk_erigon")
starks[ast.Table.Cpu] = cpu_stark
ctls = ast.all_cross_table_lookups("cdk_erigon")
optional = tuple(i for i, t in enumerate(traces) if t is None)
t0 = time.time()
proof = prove_all(starks, traces, ctls, cfg)
print(f"cdk AllStark proved on {jax.default_backend()} (windowed) "
      f"in {time.time()-t0:.1f}s", flush=True)
verify_all(starks, proof, ctls, cfg, optional_tables=optional)
print("host verifier accepted the TPU cdk proof", flush=True)

# --- negative: corrupted trace must be rejected -------------------------
from zk_evm_tpu.tables import cpu_columns as cc
traces2, cpu_stark2 = build_cdk_poseidon_scenario()
traces2[ast.Table.Cpu][cc.MEM_CHANNELS[0].value[0], 1] ^= 1
p2 = prove_all(starks, traces2, ctls, cfg)
try:
    verify_all(starks, p2, ctls, cfg, optional_tables=optional)
    print("FAIL: corrupted digest accepted", flush=True)
    sys.exit(1)
except AssertionError:
    print("corrupted simple-op digest correctly rejected", flush=True)
print("VERIFY_OK", flush=True)
