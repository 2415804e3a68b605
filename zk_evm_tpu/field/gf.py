"""GF — an ergonomic array wrapper over the (lo, hi) uint32 limb pair.

Registered as a JAX pytree so GF arrays flow through jit / vmap / shard_map /
scan unchanged. All arithmetic dispatches to the elementwise limb kernels in
``goldilocks.py``; the wrapper adds shape plumbing (indexing, reshape,
concatenate, stack) needed by the STARK engine and the table constraint code.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import goldilocks as gl


@jax.tree_util.register_pytree_node_class
class GF:
    """An array of Goldilocks field elements (canonical, < p)."""

    __slots__ = ("lo", "hi")

    def __init__(self, lo, hi):
        self.lo = lo
        self.hi = hi

    # -- pytree protocol ----------------------------------------------------
    def tree_flatten(self):
        return (self.lo, self.hi), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # -- constructors -------------------------------------------------------
    @classmethod
    def from_u64(cls, x) -> "GF":
        return cls(*gl.from_u64(x))

    @classmethod
    def zeros(cls, shape) -> "GF":
        z = jnp.zeros(shape, dtype=jnp.uint32)
        return cls(z, z)

    @classmethod
    def ones(cls, shape) -> "GF":
        return cls(jnp.ones(shape, dtype=jnp.uint32),
                   jnp.zeros(shape, dtype=jnp.uint32))

    @classmethod
    def const(cls, value: int, shape=()) -> "GF":
        value %= gl.P
        lo = jnp.full(shape, np.uint32(value & 0xFFFFFFFF), dtype=jnp.uint32)
        hi = jnp.full(shape, np.uint32(value >> 32), dtype=jnp.uint32)
        return cls(lo, hi)

    def to_u64(self) -> np.ndarray:
        return gl.to_u64(self.lo, self.hi)

    # -- shape plumbing -----------------------------------------------------
    @property
    def shape(self):
        return self.lo.shape

    @property
    def ndim(self):
        return self.lo.ndim

    def __len__(self):
        return self.lo.shape[0]

    def __iter__(self):
        # explicit iterator: without it, unpacking falls into the sequence
        # protocol and jnp's clamping indexing never raises IndexError
        for i in range(self.lo.shape[0]):
            yield self[i]

    def reshape(self, *shape) -> "GF":
        return GF(self.lo.reshape(*shape), self.hi.reshape(*shape))

    def __getitem__(self, idx) -> "GF":
        return GF(self.lo[idx], self.hi[idx])

    def at_set(self, idx, value: "GF") -> "GF":
        return GF(self.lo.at[idx].set(value.lo),
                  self.hi.at[idx].set(value.hi))

    def transpose(self, *axes) -> "GF":
        return GF(self.lo.transpose(*axes), self.hi.transpose(*axes))

    @property
    def T(self) -> "GF":
        return GF(self.lo.T, self.hi.T)

    def broadcast_to(self, shape) -> "GF":
        return GF(jnp.broadcast_to(self.lo, shape),
                  jnp.broadcast_to(self.hi, shape))

    @staticmethod
    def concatenate(parts, axis=0) -> "GF":
        return GF(jnp.concatenate([p.lo for p in parts], axis=axis),
                  jnp.concatenate([p.hi for p in parts], axis=axis))

    @staticmethod
    def stack(parts, axis=0) -> "GF":
        return GF(jnp.stack([p.lo for p in parts], axis=axis),
                  jnp.stack([p.hi for p in parts], axis=axis))

    def roll(self, shift, axis=-1) -> "GF":
        return GF(jnp.roll(self.lo, shift, axis=axis),
                  jnp.roll(self.hi, shift, axis=axis))

    def take(self, indices, axis=0) -> "GF":
        return GF(jnp.take(self.lo, indices, axis=axis),
                  jnp.take(self.hi, indices, axis=axis))

    # -- arithmetic ---------------------------------------------------------
    def _coerce(self, other) -> "GF":
        if isinstance(other, GF):
            return other
        if isinstance(other, int):
            return GF.const(other)
        raise TypeError(f"cannot coerce {type(other)} to GF")

    def __add__(self, other) -> "GF":
        o = self._coerce(other)
        return GF(*gl.add(self.lo, self.hi, o.lo, o.hi))

    __radd__ = __add__

    def __sub__(self, other) -> "GF":
        o = self._coerce(other)
        return GF(*gl.sub(self.lo, self.hi, o.lo, o.hi))

    def __rsub__(self, other) -> "GF":
        return self._coerce(other) - self

    def __mul__(self, other) -> "GF":
        if isinstance(other, int) and 0 <= other < (1 << 16):
            return GF(*gl.mul_small(self.lo, self.hi, other))
        o = self._coerce(other)
        return GF(*gl.mul(self.lo, self.hi, o.lo, o.hi))

    __rmul__ = __mul__

    def __neg__(self) -> "GF":
        return GF(*gl.neg(self.lo, self.hi))

    def square(self) -> "GF":
        return GF(*gl.square(self.lo, self.hi))

    def exp(self, e: int) -> "GF":
        return GF(*gl.exp_u64(self.lo, self.hi, e))

    def inv(self) -> "GF":
        return GF(*gl.inv(self.lo, self.hi))

    def sum(self, axis=None) -> "GF":
        """Field sum along an axis via a log-tree of field adds."""
        if axis is None:
            flat = self.reshape(-1)
            return flat.sum(axis=0)
        x = self
        if axis < 0:
            axis += x.ndim
        n = x.shape[axis]
        # pad to a power of two with zeros, then halve repeatedly
        m = 1
        while m < n:
            m *= 2
        if m != n:
            pad_shape = list(x.shape)
            pad_shape[axis] = m - n
            x = GF.concatenate([x, GF.zeros(tuple(pad_shape))], axis=axis)
        while x.shape[axis] > 1:
            h = x.shape[axis] // 2
            idx_a = [slice(None)] * x.ndim
            idx_b = [slice(None)] * x.ndim
            idx_a[axis] = slice(0, h)
            idx_b[axis] = slice(h, 2 * h)
            x = x[tuple(idx_a)] + x[tuple(idx_b)]
        idx = [slice(None)] * x.ndim
        idx[axis] = 0
        return x[tuple(idx)]

    # -- predicates / misc --------------------------------------------------
    def is_zero(self):
        return (self.lo == 0) & (self.hi == 0)

    def equals(self, other):
        o = self._coerce(other)
        return (self.lo == o.lo) & (self.hi == o.hi)

    def select(self, mask, other: "GF") -> "GF":
        """Where mask (bool array) is true take self, else other."""
        return GF(jnp.where(mask, self.lo, other.lo),
                  jnp.where(mask, self.hi, other.hi))

    def astype_device(self) -> "GF":
        return GF(jnp.asarray(self.lo), jnp.asarray(self.hi))

    def __repr__(self):
        try:
            return f"GF({self.to_u64()!r})"
        except Exception:
            return f"GF(shape={self.shape})"
