import sys, subprocess
r = subprocess.run([sys.executable, "-c", "import jax; print(jax.default_backend())"],
                   capture_output=True, timeout=90, text=True)
print("probe:", r.stdout.strip().splitlines()[-1])
import numpy as np, jax
from zk_evm_tpu.field import GF, host
print("backend:", jax.default_backend())
P = host.P
rng = np.random.default_rng(123)
boundary = np.array([0, 1, P - 1, 2**32 - 1, 2**32, P // 2], dtype=np.uint64)
a = np.concatenate([boundary, rng.integers(0, P, 58, dtype=np.uint64)])
b = np.concatenate([boundary[::-1], rng.integers(0, P, 58, dtype=np.uint64)])
ga, gb = GF.from_u64(a), GF.from_u64(b)
checks = {
  "add": (np.asarray((ga + gb).to_u64()), [(int(x) + int(y)) % P for x, y in zip(a, b)]),
  "mul": (np.asarray((ga * gb).to_u64()), [(int(x) * int(y)) % P for x, y in zip(a, b)]),
  "sub": (np.asarray((ga - gb).to_u64()), [(int(x) - int(y)) % P for x, y in zip(a, b)]),
}
for name, (dev, ref) in checks.items():
    ok = all(int(d) == r for d, r in zip(dev, ref))
    print(name, "OK" if ok else "FAIL")
    assert ok, name
# Poseidon leaf hash vs exact host twin
from zk_evm_tpu.hash import poseidon
from zk_evm_tpu.hash.host_poseidon import permute as host_perm
st = rng.integers(0, P, size=(4, 12), dtype=np.uint64)
dev = np.asarray(poseidon.permute(GF.from_u64(st)).to_u64())
refp = np.array([host_perm([int(v) for v in row]) for row in st], dtype=np.uint64)
print("poseidon", "OK" if (dev == refp).all() else "FAIL")
assert (dev == refp).all()
# commit cap on TPU vs host merkle twin
from zk_evm_tpu.parallel import commit_cap
from zk_evm_tpu.merkle import host as mhost
vals = rng.integers(0, P, size=(8, 256), dtype=np.uint64)
cap = np.asarray(commit_cap(GF.from_u64(vals), cap_height=2).to_u64())
print("commit_cap on", jax.default_backend(), "shape", cap.shape)
from zk_evm_tpu import ntt
lde = np.asarray(ntt.lde_bitrev(GF.from_u64(vals), rate_bits=1).to_u64())
_, hcap = mhost.build_tree([[int(v) for v in row] for row in np.asarray(lde).T], 2)
hc = np.array(hcap, dtype=np.uint64)
print("cap==host:", (cap == hc).all())
assert (cap == hc).all()
print("VERIFY_API_OK")
