"""Phase 2: the constraint VALUES match jit-vs-eager on TPU; the folded
accumulators don't. Record acc[0] after every constraint()/constraint_block()
call and find the first call where jit and eager diverge."""
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
from zk_evm_tpu.stark import lookup, domains
from zk_evm_tpu.stark.poly_batch import PolynomialBatch
from zk_evm_tpu.stark.stark import StarkFrame, ConstraintConsumer
from zk_evm_tpu.tables import all_stark as ast
from zk_evm_tpu.tables.scenarios import build_cdk_poseidon_scenario


class SnapshottingConsumer(ConstraintConsumer):
    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.snaps = []
        self.labels = []

    def constraint(self, c):
        super().constraint(c)
        self.snaps.append(self.accs[0].reshape(1, -1))
        self.labels.append("c")

    def constraint_block(self, cs):
        super().constraint_block(cs)
        self.snaps.append(self.accs[0].reshape(1, -1))
        k = cs.shape[0] if not isinstance(cs, (list, tuple)) else len(cs)
        self.labels.append(f"B{k}")


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
alphas_int = [int(rng.integers(1, 2**63)) for _ in range(cfg.num_challenges)]

trace_gf = GF.from_u64(trace)
tb = PolynomialBatch.from_values(trace_gf, rate_bits=1, cap_height=2)
aux_gf = lookup.generate_aux_trace(trace_gf, lookups, groups, challenges)
aux_batch = PolynomialBatch.from_values(aux_gf, rate_bits=1, cap_height=2)

degree_bits = tb.degree.bit_length() - 1
log_m = degree_bits + cfg.rate_bits
m = 1 << log_m
perm = jnp.asarray(domains.next_row_perm_bitrev(log_m, cfg.rate_bits))
sel = domains.selector_tables_bitrev(degree_bits, cfg.rate_bits)
lde = tb.lde
next_lde = lde.take(perm, axis=-1)
aux_lde = aux_batch.lde
aux_next = aux_lde.take(perm, axis=-1)
zl = GF.from_u64(sel["z_last"])
lf = GF.from_u64(sel["l_first"])
ll = GF.from_u64(sel["l_last"])
betas = GF.from_u64(np.array([b for b, _ in pairs], dtype=np.uint64))
gammas = GF.from_u64(np.array([g for _, g in pairs], dtype=np.uint64))
alphas_gf = GF.from_u64(np.array(alphas_int, dtype=np.uint64))

labels_out = []


def run(lde_w, next_w, aux_w, aux_next_w, zl_w, lf_w, ll_w, betas, gammas,
        alphas):
    w = lde_w.shape[-1]
    frame = StarkFrame(local=lde_w, next_=next_w,
                       aux_local=aux_w, aux_next=aux_next_w,
                       public_inputs=[], params=())
    cc = SnapshottingConsumer(
        alphas=[alphas[i] for i in range(len(alphas_int))],
        zero=GF.zeros((w,)), z_last=zl_w, lagrange_first=lf_w,
        lagrange_last=ll_w)
    stark.eval(frame, cc)
    chs = lookup.ChallengeSet(tuple(
        (betas[i], gammas[i]) for i in range(len(pairs))))
    lookup.eval_aux_constraints(lookups, groups, chs, frame, cc)
    labels_out.clear()
    labels_out.extend(cc.labels)
    return GF.concatenate(cc.snaps, axis=0)


args = (lde, next_lde, aux_lde, aux_next, zl, lf, ll, betas, gammas,
        alphas_gf)
t0 = time.time()
eager = np.asarray(run(*args).to_u64())
labels = list(labels_out)
print(f"eager: {eager.shape} in {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
jitted = np.asarray(jax.jit(run)(*args).to_u64())
print(f"jit:   {jitted.shape} in {time.time()-t0:.1f}s", flush=True)

bad = np.argwhere((eager != jitted).any(axis=1)).ravel()
print(f"{len(bad)} / {eager.shape[0]} snapshots differ", flush=True)
if len(bad):
    f = bad[0]
    print(f"first divergent call: #{f} label={labels[f]}; "
          f"surrounding labels: {labels[max(0,f-3):f+4]}", flush=True)
    for r in range(max(0, f - 1), min(eager.shape[0], f + 2)):
        print(f"  call {r} ({labels[r]}): eager={[hex(v) for v in eager[r]]}")
        print(f"            jit  ={[hex(v) for v in jitted[r]]}", flush=True)
print("DONE", flush=True)
