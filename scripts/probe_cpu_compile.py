"""Probe XLA:CPU compile time of the windowed quotient program for the
smallest table under various XLA flags (round-5: can the jit path be
tested on the CPU backend at all?). Usage: probe_cpu_compile.py "<flags>"
"""
import sys; sys.path.insert(0, ".")
import os, time
flags = sys.argv[1] if len(sys.argv) > 1 else ""
os.environ["XLA_FLAGS"] = flags
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from zk_evm_tpu.field import GF
from zk_evm_tpu.stark import StarkConfig, FriConfig
from zk_evm_tpu.stark import prover as P, lookup
from zk_evm_tpu.stark.stark import StarkFrame
from zk_evm_tpu.tables import all_stark as ast

starks = ast.all_starks()
ctls = ast.all_cross_table_lookups()
ti = int(ast.Table.MemBefore)
stark = starks[ti]
groups = lookup.ctl_groups_for_table(ctls, ti)
lookups = stark.lookups()
fn = P._make_windowed_quotient_fn(stark, lookups, groups, 2, (), True)

w = 16
g = lambda *s: GF.from_u64(np.ones(s, dtype=np.uint64))
args = (g(stark.num_columns, w), g(stark.num_columns, w),
        g(4, w), g(4, w), g(w), g(w), g(w), g(w),
        g(2), g(2), g(2), g(1))
t0 = time.time()
out = fn(*args)
import jax
jax.block_until_ready((out.lo, out.hi))
print(f"windowed MemBefore quotient jit compile+run: {time.time()-t0:.1f}s "
      f"flags='{flags}'", flush=True)
