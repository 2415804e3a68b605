"""Compare Poseidon kernel variants on the real chip.

Times the permutation and the fused sponge (legacy (12,T)-tile layout vs
the round-4 dense registerized layout) with the fori-chained methodology
from ROOFLINE.md: iterations chained inside one jitted fori_loop with a
carried data dependency, so one dispatch covers all iterations.

Run: python scripts/prof_poseidon.py [log2_batch]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

ITERS = 30


def chain_time(fn, state, iters=ITERS):
    import jax
    import jax.numpy as jnp
    from zk_evm_tpu.field import GF

    @jax.jit
    def loop(lo, hi, n):
        def body(i, carry):
            lo, hi = carry
            out = fn(GF(lo, hi))
            return out.lo, out.hi
        return jax.lax.fori_loop(0, n, body, (lo, hi))

    r = loop(state.lo, state.hi, ITERS)
    jax.block_until_ready(r)
    t0 = time.time()
    r = loop(state.lo, state.hi, ITERS)
    jax.block_until_ready(r)
    return (time.time() - t0) / ITERS


def sponge_chain_time(fn, mat, iters=ITERS):
    """Chain sponge iterations: feed digests back into the matrix head."""
    import jax
    import jax.numpy as jnp
    from zk_evm_tpu.field import GF

    @jax.jit
    def loop(mlo, mhi, n):
        def body(i, carry):
            mlo, mhi = carry
            d = fn(GF(mlo, mhi))            # (rows, 4)
            mlo = mlo.at[:4, :].set(d.lo.T)
            mhi = mhi.at[:4, :].set(d.hi.T)
            return mlo, mhi
        return jax.lax.fori_loop(0, n, body, (mlo, mhi))

    r = loop(mat.lo, mat.hi, ITERS)
    jax.block_until_ready(r)
    t0 = time.time()
    r = loop(mat.lo, mat.hi, ITERS)
    jax.block_until_ready(r)
    return (time.time() - t0) / ITERS


def main():
    import jax
    from zk_evm_tpu.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    from zk_evm_tpu.field import GF, host
    from zk_evm_tpu.hash import poseidon_pallas as ppal
    from zk_evm_tpu.hash import poseidon_dense as pd

    log_b = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    B = 1 << log_b
    print(f"backend={jax.default_backend()} batch=2^{log_b}")
    rng = np.random.default_rng(0)
    st = GF.from_u64(rng.integers(0, host.P, size=(B, 12),
                                  dtype=np.uint64))

    # correctness cross-check first (chip vs chip)
    a = ppal.permute_pallas(st[:8192]).to_u64()
    b = pd.permute_dense(st[:8192]).to_u64()
    assert a.tolist() == b.tolist(), "dense != legacy on chip"
    print("permute: dense == legacy on chip")

    t_leg = chain_time(ppal.permute_pallas, st)
    print(f"legacy  permute: {t_leg*1e3:8.2f} ms  "
          f"{B/t_leg/1e6:7.2f} Mperm/s")
    t_den = chain_time(pd.permute_dense, st)
    print(f"dense   permute: {t_den*1e3:8.2f} ms  "
          f"{B/t_den/1e6:7.2f} Mperm/s   ({t_leg/t_den:.2f}x)")

    # sponge: 64-column leaves (the production commit shape)
    n_rows = max(B // 16, 2048)
    n_cols = 64
    mat = GF.from_u64(rng.integers(0, host.P, size=(n_cols, n_rows),
                                   dtype=np.uint64))
    a = ppal.sponge_pallas(mat[:, :8192]).to_u64()
    b = pd.sponge_dense(mat[:, :8192]).to_u64()
    assert a.tolist() == b.tolist(), "sponge dense != legacy on chip"
    print("sponge: dense == legacy on chip")

    perms = n_rows * (n_cols // 8)
    t_leg = sponge_chain_time(ppal.sponge_pallas, mat)
    print(f"legacy  sponge64: {t_leg*1e3:8.2f} ms  "
          f"{perms/t_leg/1e6:7.2f} Mperm/s")
    t_den = sponge_chain_time(pd.sponge_dense, mat)
    print(f"dense   sponge64: {t_den*1e3:8.2f} ms  "
          f"{perms/t_den/1e6:7.2f} Mperm/s   ({t_leg/t_den:.2f}x)")


if __name__ == "__main__":
    main()
