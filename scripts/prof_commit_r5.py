"""Round-5 commit-pipeline component profile (fori-chained, real TPU)."""
import sys, time
sys.path.insert(0, ".")
import numpy as np
from zk_evm_tpu.compile_cache import enable_persistent_cache
enable_persistent_cache()
import jax, jax.numpy as jnp
from zk_evm_tpu.field import GF, host
from zk_evm_tpu import ntt
from zk_evm_tpu.hash import poseidon as pos
from zk_evm_tpu.parallel import commit_cap

POLYS, LOGN, ITERS = 64, 15, 10
rng = np.random.default_rng(0)
gf = GF.from_u64(rng.integers(0, host.P, size=(POLYS, 1 << LOGN),
                              dtype=np.uint64))


def fori_time(f, x, iters=ITERS):
    """Chained timing where the carry is a cheap u32 SUM of the full
    output — nothing can be dead-code-eliminated — and the seed feeds
    back into the input."""
    @jax.jit
    def loop(x, n):
        def body(i, seed):
            out = f(GF(x.lo.at[(0,) * x.ndim].add(seed), x.hi))
            return out.lo.sum(dtype=jnp.uint32)
        return jax.lax.fori_loop(0, n, body, jnp.uint32(0))

    loop(x, jnp.int32(1)).item()
    t0 = time.time()
    loop(x, jnp.int32(iters)).item()
    return (time.time() - t0) / iters


m = 1 << (LOGN + 1)
elems = POLYS << LOGN


def chained(f):
    """x -> x with a data dependency on f(x): chainable in fori_loop."""
    def g(x):
        y = f(x)
        return GF(x.lo.at[(0,) * x.ndim].add(y.lo.reshape(-1)[0]), x.hi)
    return g


t = fori_time(chained(lambda x: ntt.lde_bitrev(x, rate_bits=1)), gf)
print(f"lde_bitrev      {t*1e3:8.2f} ms  {elems/t/1e6:8.1f} Melem/s")

lde = ntt.lde_bitrev(gf, rate_bits=1)
leaves = GF(lde.lo.T, lde.hi.T)              # (m, polys)
t = fori_time(chained(pos.hash_rows), leaves)
nperm = m * ((POLYS + 7) // 8)
print(f"hash_rows       {t*1e3:8.2f} ms  {nperm/t/1e6:8.1f} Mperm/s")

digests = pos.hash_rows(leaves)               # (m, 4)


def tree(d):
    while d.shape[0] > 16:
        d = pos.compress(d[0::2], d[1::2])
    return d


t = fori_time(chained(tree), digests)
print(f"tree reduce     {t*1e3:8.2f} ms  {(m-16)/t/1e6:8.1f} Mperm/s")

t = fori_time(chained(lambda x: commit_cap(x, cap_height=4)), gf)
print(f"commit_cap      {t*1e3:8.2f} ms  {elems/t/1e6:8.1f} Melem/s")
