"""One-off on-chip profile of the commit pipeline components."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp

from zk_evm_tpu.compile_cache import enable_persistent_cache
enable_persistent_cache()
from zk_evm_tpu.field import GF, host
from zk_evm_tpu.ntt import ntt as _ntt
from zk_evm_tpu.hash import poseidon as _pos
from zk_evm_tpu.hash import poseidon_pallas as ppal

rng = np.random.default_rng(0)
POLYS, LOGN, ITERS = 64, 15, 10
vals = rng.integers(0, host.P, size=(POLYS, 1 << LOGN), dtype=np.uint64)
gf = GF.from_u64(vals)

def chain(f, x, iters=ITERS):
    @jax.jit
    def step(v, seed):
        seeded = GF(v.lo.at[(0,) * v.ndim].add(seed), v.hi)
        return f(seeded)
    out = step(x, jnp.uint32(0))
    jax.block_until_ready((out.lo, out.hi))
    t0 = time.time()
    seed = jnp.uint32(0)
    for _ in range(iters):
        out = step(x, seed)
        seed = out.lo[(0,) * out.ndim]
    seed.item()
    return (time.time() - t0) / iters

n = POLYS << LOGN

# 1. full LDE (ifft + coset mul + fft of 2n)
dt = chain(lambda v: _ntt.lde_bitrev(v, rate_bits=1), gf)
print(f"lde_bitrev      {dt*1e3:8.2f} ms  {n/dt/1e6:8.1f} Melem/s")

# 2. just the forward pease on 2n points
gf2 = GF.from_u64(rng.integers(0, host.P, size=(POLYS, 2 << LOGN), dtype=np.uint64))
dt = chain(lambda v: _ntt._pease(v, inverse=False), gf2)
print(f"pease fwd 2n    {dt*1e3:8.2f} ms  {2*n/dt/1e6:8.1f} Melem/s")

# 3. elementwise GF mul of same size (bandwidth/compute floor)
tw = GF.from_u64(rng.integers(0, host.P, size=(POLYS, 2 << LOGN), dtype=np.uint64))
dt = chain(lambda v: v * tw, gf2)
print(f"gf mul 2n       {dt*1e3:8.2f} ms  {2*n/dt/1e6:8.1f} Melem/s")

# 4. one pease stage (butterfly + interleave)
twr = GF.from_u64(_ntt._pease_twiddles_np(LOGN + 1, False)[0])
def one_stage(v):
    half = v.shape[-1] // 2
    u, w = v[..., :half], v[..., half:]
    t0_, t1_ = u + w, (u - w) * twr
    return GF.stack([t0_, t1_], axis=-1).reshape(v.shape)
dt = chain(one_stage, gf2)
print(f"1 stage w/ ilv  {dt*1e3:8.2f} ms  {2*n/dt/1e6:8.1f} Melem/s")

# 5. one stage, concat instead of interleave
def one_stage_cat(v):
    half = v.shape[-1] // 2
    u, w = v[..., :half], v[..., half:]
    return GF.concatenate([u + w, (u - w) * twr], axis=-1)
dt = chain(one_stage_cat, gf2)
print(f"1 stage concat  {dt*1e3:8.2f} ms  {2*n/dt/1e6:8.1f} Melem/s")

# 6. poseidon permute_pallas vs sponge at 2^18
B = 1 << 18
st = GF.from_u64(rng.integers(0, host.P, size=(B, 12), dtype=np.uint64))
dt = chain(lambda v: ppal.permute_pallas(v), st)
print(f"permute_pallas  {dt*1e3:8.2f} ms  {B/dt/1e6:8.2f} Mperm/s")

rows = GF.from_u64(rng.integers(0, host.P, size=(B, 8), dtype=np.uint64))
dt = chain(lambda v: _pos.hash_rows(v), rows)
print(f"hash_rows b8    {dt*1e3:8.2f} ms  {B/dt/1e6:8.2f} Mperm/s")

# 7. leaf hash of the actual LDE shape: 64 cols x 65536 rows (8 chunks)
lde_t = GF.from_u64(rng.integers(0, host.P, size=(POLYS, 2 << LOGN), dtype=np.uint64))
dt = chain(lambda v: ppal.sponge_pallas(v), lde_t)
nperm = (2 << LOGN) * 8
print(f"sponge 64-col   {dt*1e3:8.2f} ms  {nperm/dt/1e6:8.2f} Mperm/s ({(2<<LOGN)/dt/1e6:.2f} Mleaf/s)")

# 8. full commit for reference
from zk_evm_tpu.parallel import commit_cap
dt = chain(lambda v: commit_cap(v, cap_height=4), gf)
print(f"commit_cap      {dt*1e3:8.2f} ms  {n/dt/1e6:8.1f} Melem/s")
