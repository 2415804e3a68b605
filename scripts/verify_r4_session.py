import sys; sys.path.insert(0, ".")
import subprocess, sys, time
r = subprocess.run([sys.executable, "-c", "import jax; print(jax.default_backend())"],
                   capture_output=True, timeout=120, text=True)
platform = r.stdout.strip().splitlines()[-1] if r.returncode == 0 else None
print("tunnel probe:", platform, flush=True)
assert platform == "tpu", "tunnel down"

import jax
print("backend:", jax.default_backend(), flush=True)

import os
os.environ["ZK_EVM_REFERENCE"] = "/nonexistent"
from zk_evm_tpu.witness.assembler import combined_kernel
from zk_evm_tpu.witness.testing_fixtures import build_simple_transfer_inputs
from zk_evm_tpu.witness.segments import generate_segment_tables, NUM_EXTRA_CYCLES_AFTER
kernel = combined_kernel()
print("frozen kernel loaded:", len(kernel.code), "bytes, epilogue budget",
      NUM_EXTRA_CYCLES_AFTER, flush=True)
gi = build_simple_transfer_inputs()
segs = list(generate_segment_tables(kernel, gi, max_cpu_len_log=14))
print("simple-transfer segments with 82-cycle epilogue budget:", len(segs), flush=True)

from zk_evm_tpu.stark import StarkConfig, FriConfig, prove_all, verify_all
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
t0 = time.time()
proof = prove_all(starks, traces, ctls, cfg)
print(f"cdk AllStark proved on {jax.default_backend()} in {time.time()-t0:.1f}s", flush=True)
optional = tuple(i for i, t in enumerate(traces) if t is None)
verify_all(starks, proof, ctls, cfg, optional_tables=optional)
print("host verifier accepted the TPU cdk proof (no extra-looking sums)", flush=True)

from zk_evm_tpu.tables import cpu_columns as cc
traces2, cpu_stark2 = build_cdk_poseidon_scenario()
traces2[ast.Table.Cpu][cc.MEM_CHANNELS[0].value[0], 1] ^= 1
p2 = prove_all(starks, traces2, ctls, cfg)
try:
    verify_all(starks, p2, ctls, cfg, optional_tables=optional)
    print("FAIL: corrupted digest accepted", flush=True)
except AssertionError:
    print("corrupted simple-op digest correctly rejected", flush=True)
print("VERIFY_OK", flush=True)
