"""Fused Pallas Poseidon kernel vs exact host twin (interpret mode on the
CPU test backend; the compiled path is exercised by /verify on the real
chip and by any TPU-side proving)."""

import numpy as np

from zk_evm_tpu.field import GF, host
from zk_evm_tpu.hash import poseidon_pallas as ppal
from zk_evm_tpu.hash import host_poseidon as hp

rng = np.random.default_rng(91)


def test_pallas_permute_interpret_matches_host():
    st = rng.integers(0, host.P, size=(ppal.TILE, 12), dtype=np.uint64)
    st[0] = 0
    st[1] = host.P - 1
    out = ppal.permute_pallas(GF.from_u64(st), interpret=True).to_u64()
    for i in (0, 1, 7, ppal.TILE - 1):
        assert out[i].tolist() == hp.permute([int(x) for x in st[i]]), i


def test_pallas_sponge_interpret_matches_hash_rows():
    """Fused-sponge kernel == scanned jnp sponge, for a multi-chunk leaf
    width (64 = the bench shape), a ragged width (13: one full chunk +
    5-element trailing overwrite) and a single-partial width (6)."""
    from zk_evm_tpu.hash import poseidon

    for n_cols in (64, 13, 6):
        mat = rng.integers(0, host.P, size=(ppal.TILE, n_cols),
                           dtype=np.uint64)
        want = poseidon.hash_rows(GF.from_u64(mat)).to_u64()
        got = ppal.sponge_pallas(GF.from_u64(mat.T.copy()),
                                 interpret=True).to_u64()
        assert got.tolist() == want.tolist(), n_cols
