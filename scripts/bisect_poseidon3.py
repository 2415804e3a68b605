"""Phase 3: is the TPU jit-vs-eager fold divergence a small-shape
(sub-lane padding/masking) lowering bug? Tile the identical inputs along
the last axis to several widths and rerun the full fold each way.

Usage: python scripts/bisect_poseidon3.py [reps...]   (default 1 8 32 256)
"""
import sys
sys.path.insert(0, ".")
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

traces, _ = build_cdk_poseidon_scenario()
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
perm = jnp.asarray(domains.next_row_perm_bitrev(log_m, cfg.rate_bits))
sel = domains.selector_tables_bitrev(degree_bits, cfg.rate_bits)
base = dict(
    lde=np.asarray(tb.lde.to_u64()),
    nxt=np.asarray(tb.lde.take(perm, axis=-1).to_u64()),
    aux=np.asarray(aux_batch.lde.to_u64()),
    auxn=np.asarray(aux_batch.lde.take(perm, axis=-1).to_u64()),
    zl=sel["z_last"], lf=sel["l_first"], ll=sel["l_last"])
betas = GF.from_u64(np.array([b for b, _ in pairs], dtype=np.uint64))
gammas = GF.from_u64(np.array([g for _, g in pairs], dtype=np.uint64))
alphas_gf = GF.from_u64(np.array(alphas_int, dtype=np.uint64))


def run(lde_w, next_w, aux_w, aux_next_w, zl_w, lf_w, ll_w, betas, gammas,
        alphas):
    w = lde_w.shape[-1]
    frame = StarkFrame(local=lde_w, next_=next_w,
                       aux_local=aux_w, aux_next=aux_next_w,
                       public_inputs=[], params=())
    cc = ConstraintConsumer(
        alphas=[alphas[i] for i in range(len(alphas_int))],
        zero=GF.zeros((w,)), z_last=zl_w, lagrange_first=lf_w,
        lagrange_last=ll_w)
    stark.eval(frame, cc)
    chs = lookup.ChallengeSet(tuple(
        (betas[i], gammas[i]) for i in range(len(pairs))))
    lookup.eval_aux_constraints(lookups, groups, chs, frame, cc)
    return GF.stack(cc.accs, axis=0)


jit_run = jax.jit(run)
reps_list = [int(x) for x in sys.argv[1:]] or [1, 8, 32, 256]
for reps in reps_list:
    args = [GF.from_u64(np.tile(base[k], (1, reps))
                        if base[k].ndim == 2 else np.tile(base[k], reps))
            for k in ("lde", "nxt", "aux", "auxn", "zl", "lf", "ll")]
    args += [betas, gammas, alphas_gf]
    t0 = time.time()
    e = np.asarray(run(*args).to_u64())
    t1 = time.time()
    j = np.asarray(jit_run(*args).to_u64())
    t2 = time.time()
    m = e.shape[-1]
    if np.array_equal(e, j):
        print(f"m={m}: OK (eager {t1-t0:.1f}s, jit {t2-t1:.1f}s)", flush=True)
    else:
        bad = np.argwhere(e != j)
        frac = len(bad) / e.size
        # which last-axis positions are bad?
        pos = sorted(set(int(p) for _, p in bad))
        print(f"m={m}: MISMATCH {len(bad)}/{e.size} ({frac:.1%}); "
              f"bad positions {pos[:16]}{'...' if len(pos) > 16 else ''} "
              f"(eager {t1-t0:.1f}s, jit {t2-t1:.1f}s)", flush=True)
print("DONE", flush=True)
