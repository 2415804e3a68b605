"""Bisect the PoseidonStark windowed-jit divergence on the TPU.

Runs stark.eval + eval_aux_constraints with a RECORDING consumer that
stacks every constraint's raw evaluation (no alpha folding), once eagerly
and once jitted, on the same inputs; prints the indices of constraints
whose values differ. m is tiny (4) so this pinpoints the miscompiled op.
"""
import sys
sys.path.insert(0, ".")
import os
import jax
from zk_evm_tpu.compile_cache import enable_persistent_cache
enable_persistent_cache()
print("backend:", jax.default_backend(), flush=True)

import time
import numpy as np
import jax.numpy as jnp
from zk_evm_tpu.field import GF
from zk_evm_tpu.stark import StarkConfig, FriConfig
from zk_evm_tpu.stark import prover as P, lookup, domains
from zk_evm_tpu.stark.poly_batch import PolynomialBatch
from zk_evm_tpu.stark.stark import StarkFrame, ConstraintConsumer
from zk_evm_tpu.tables import all_stark as ast
from zk_evm_tpu.tables.scenarios import build_cdk_poseidon_scenario


class RecordingConsumer(ConstraintConsumer):
    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.recorded = []

    def constraint(self, c):
        if isinstance(c, GF) and c.ndim == 1:
            self.recorded.append(c.reshape(1, -1))
        else:
            self.recorded.append(c)

    def constraint_block(self, cs):
        if isinstance(cs, (list, tuple)):
            for c in cs:
                self.constraint(c)
            return
        self.recorded.append(cs)


traces, cpu_stark = build_cdk_poseidon_scenario()
starks = ast.all_starks("cdk_erigon")
ctls = ast.all_cross_table_lookups("cdk_erigon")
cfg = StarkConfig(security_bits=1,
                  fri_config=FriConfig(rate_bits=1, cap_height=2,
                                       proof_of_work_bits=0, num_query_rounds=1,
                                       arity_bits=2, final_poly_bits=2))
ti = int(ast.Table.Poseidon)
trace = traces[ti]
stark = starks[ti]
groups = lookup.ctl_groups_for_table(ctls, ti)
lookups = stark.lookups()

rng = np.random.default_rng(42)
pairs = tuple((int(rng.integers(1, 2**63)), int(rng.integers(1, 2**63)))
              for _ in range(cfg.num_challenges))
challenges = lookup.ChallengeSet(pairs)

trace_gf = GF.from_u64(trace)
tb = PolynomialBatch.from_values(trace_gf, rate_bits=1, cap_height=2)
aux_gf = lookup.generate_aux_trace(trace_gf, lookups, groups, challenges)
aux_batch = PolynomialBatch.from_values(aux_gf, rate_bits=1, cap_height=2)

degree_bits = tb.degree.bit_length() - 1
rate_bits = cfg.rate_bits
log_m = degree_bits + rate_bits
m = 1 << log_m
perm = jnp.asarray(domains.next_row_perm_bitrev(log_m, rate_bits))
sel = domains.selector_tables_bitrev(degree_bits, rate_bits)
lde = tb.lde
next_lde = lde.take(perm, axis=-1)
aux_lde = aux_batch.lde
aux_next = aux_lde.take(perm, axis=-1)
zl = GF.from_u64(sel["z_last"])
lf = GF.from_u64(sel["l_first"])
ll = GF.from_u64(sel["l_last"])
betas = GF.from_u64(np.array([b for b, _ in pairs], dtype=np.uint64))
gammas = GF.from_u64(np.array([g for _, g in pairs], dtype=np.uint64))


def run(lde_w, next_w, aux_w, aux_next_w, zl_w, lf_w, ll_w, betas, gammas):
    w = lde_w.shape[-1]
    frame = StarkFrame(local=lde_w, next_=next_w,
                       aux_local=aux_w, aux_next=aux_next_w,
                       public_inputs=[], params=())
    cc = RecordingConsumer(alphas=[], zero=GF.zeros((w,)),
                           z_last=zl_w, lagrange_first=lf_w,
                           lagrange_last=ll_w)
    stark.eval(frame, cc)
    chs = lookup.ChallengeSet(tuple(
        (betas[i], gammas[i]) for i in range(len(pairs))))
    lookup.eval_aux_constraints(lookups, groups, chs, frame, cc)
    return GF.concatenate(cc.recorded, axis=0)


args = (lde, next_lde, aux_lde, aux_next, zl, lf, ll, betas, gammas)
t0 = time.time()
eager = np.asarray(run(*args).to_u64())
print(f"eager: {eager.shape} in {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
jitted = np.asarray(jax.jit(run)(*args).to_u64())
print(f"jit:   {jitted.shape} in {time.time()-t0:.1f}s", flush=True)

bad = np.argwhere((eager != jitted).any(axis=1)).ravel()
print(f"{len(bad)} / {eager.shape[0]} constraint rows differ", flush=True)
print("first bad rows:", bad[:20].tolist(), flush=True)
for r in bad[:5]:
    print(f"  row {r}: eager={[hex(v) for v in eager[r]]}")
    print(f"          jit  ={[hex(v) for v in jitted[r]]}", flush=True)
np.savez("/tmp/bisect_poseidon.npz", eager=eager, jitted=jitted, bad=bad)
print("DONE", flush=True)
