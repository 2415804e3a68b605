"""Mesh-sharded commitment pipeline.

The reference's intra-proof parallelism (rayon over polys/rows inside
plonky2, SURVEY.md §2.9 P1) maps onto a JAX device mesh: the per-polynomial
NTT work shards over the `polys` axis with zero communication; leaf hashing
shards over the `rows` axis (one all-to-all resharding at the transpose,
inserted by GSPMD from the sharding annotations); the Merkle reduction's
top levels gather onto fewer devices automatically. The cap that falls out
is bit-identical to the single-device cap — the tree order is fixed — which
is what keeps the Fiat-Shamir transcript reproducible at any device count
(SURVEY.md Appendix A).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..field import GF
from .. import ntt
from ..hash import poseidon


def make_mesh(n_devices: int | None = None, axis: str = "polys") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


@partial(jax.jit, static_argnames=("cap_height", "rate_bits"))
def commit_cap(values: GF, cap_height: int = 4, rate_bits: int = 1) -> GF:
    """Fully-jittable trace commitment: values (polys, n) -> Merkle cap
    (2^cap_height, 4). One traced program: LDE + leaf hash + reduction.

    Note (round 5): padding the sub-tile tail levels onto the Pallas
    kernel was tried and measured a wash on-chip (119.5 vs 120.5
    Melem/s, bit-identical) — inside this one traced program XLA already
    fuses the scanned tail permutes well, and the pipeline is dominated
    by the leaf sponge (~77%), which sits near its op-count ceiling
    (ROOFLINE.md round-5b). Kept on the simple unpadded form."""
    lde = ntt.lde_bitrev(values, rate_bits=rate_bits)
    digests = poseidon.hash_rows(lde.T)
    while digests.shape[0] > (1 << cap_height):
        digests = poseidon.compress(digests[0::2], digests[1::2])
    return digests


def sharded_commit_cap(values: GF, mesh: Mesh,
                       cap_height: int = 4, rate_bits: int = 1) -> GF:
    """Commit with the polys axis sharded over the mesh; XLA inserts the
    transpose all-to-all and the tree-top gathers. Cap is replicated."""
    axis = mesh.axis_names[0]
    sharded = jax.device_put(
        values, NamedSharding(mesh, P(axis, None)))
    out_sh = NamedSharding(mesh, P(None, None))
    fn = jax.jit(commit_cap, static_argnames=("cap_height", "rate_bits"),
                 out_shardings=out_sh)
    return fn(sharded, cap_height=cap_height, rate_bits=rate_bits)
