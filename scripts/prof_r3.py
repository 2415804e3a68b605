"""Round-3 component profiler: split commit-pipeline time on the real TPU.

The axon tunnel costs ~70 ms per dispatch, so per-call chained timing (the
round-2 bench methodology) mostly measures the tunnel. Here the iteration
chain lives INSIDE one jitted lax.fori_loop — one dispatch per measurement,
seed-carried dependency so XLA cannot elide iterations — and the dispatch
floor is measured separately and subtracted.

Run on the TPU: python scripts/prof_r3.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

POLYS = 64
LOG_N = 15
ITERS = 20


def fori_time(f, x0, iters=ITERS, floor=0.0):
    """Time f(x, seed)->GF chained `iters` times inside ONE jitted
    fori_loop. Returns seconds per iteration, dispatch floor removed."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(x, n):
        def body(i, seed):
            out = f(x, seed)
            return out.lo.reshape(-1)[0]
        return jax.lax.fori_loop(0, n, body, jnp.uint32(0))

    loop(x0, iters).item()                      # compile + settle
    t0 = time.time()
    loop(x0, iters).item()
    dt = time.time() - t0
    return max(dt - floor, 1e-9) / iters


def main():
    import jax
    import jax.numpy as jnp
    from zk_evm_tpu.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    from zk_evm_tpu.field import GF, host
    from zk_evm_tpu import ntt
    from zk_evm_tpu.ntt import ntt as nttmod
    from zk_evm_tpu.hash import poseidon
    from zk_evm_tpu.hash import poseidon_pallas as ppal
    from zk_evm_tpu.parallel import commit_cap

    print("backend:", jax.default_backend(), jax.devices())
    rng = np.random.default_rng(42)
    values = rng.integers(0, host.P, size=(POLYS, 1 << LOG_N), dtype=np.uint64)
    gf = GF.from_u64(values)

    # dispatch floor: time a no-work jitted loop round trip
    @jax.jit
    def tinyloop(x):
        return x + 1
    small = jnp.uint32(3)
    tinyloop(small).item()
    t0 = time.time()
    for _ in range(5):
        tinyloop(small).item()
    floor = (time.time() - t0) / 5
    print(f"dispatch+readback floor: {floor*1e3:8.2f} ms/call")

    def seeded(x, seed):
        return GF(x.lo.at[0, 0].add(seed), x.hi)

    n_in = POLYS * (1 << LOG_N)
    rows = 2 << LOG_N

    dt = fori_time(lambda x, s: ntt.lde_bitrev(seeded(x, s), rate_bits=1),
                   gf, floor=floor)
    print(f"lde_bitrev:          {dt*1e3:8.2f} ms   {n_in/dt/1e9:.3f} Gelem/s (in-elems)")

    big = GF.from_u64(rng.integers(0, host.P, (POLYS, 2 << LOG_N), dtype=np.uint64))
    dt = fori_time(lambda x, s: nttmod.fft_bitrev(seeded(x, s)), big, floor=floor)
    print(f"fft_bitrev 2^16:     {dt*1e3:8.2f} ms   {POLYS*rows/dt/1e9:.3f} Gelem/s")

    lde = ntt.lde_bitrev(gf, rate_bits=1)
    dt = fori_time(lambda x, s: poseidon.hash_rows(seeded(x, s).T), lde,
                   floor=floor)
    print(f"leaf sponge 64-col:  {dt*1e3:8.2f} ms   {rows*8/dt/1e6:.2f} Mperm/s ({rows} rows x 8 chunks)")

    perm_in = GF.from_u64(rng.integers(0, host.P, (1 << 18, 12), dtype=np.uint64))
    dt = fori_time(lambda x, s: ppal.permute_pallas(seeded(x, s)), perm_in,
                   floor=floor, iters=10)
    print(f"permute_pallas 2^18: {dt*1e3:8.2f} ms   {(1<<18)/dt/1e6:.2f} Mperm/s")

    digests = poseidon.hash_rows(lde.T)

    def tree(x, s):
        d = seeded(x, s)
        while d.shape[0] > 16:
            d = poseidon.compress(d[0::2], d[1::2])
        return d
    dt = fori_time(tree, digests, floor=floor)
    print(f"tree 2^16 -> cap16:  {dt*1e3:8.2f} ms   {(rows-16)/dt/1e6:.2f} Mperm/s")

    dt = fori_time(lambda x, s: commit_cap(seeded(x, s), cap_height=4), gf,
                   floor=floor, iters=10)
    print(f"commit_cap:          {dt*1e3:8.2f} ms   {n_in/dt/1e6:.2f} Melem/s")


if __name__ == "__main__":
    main()
