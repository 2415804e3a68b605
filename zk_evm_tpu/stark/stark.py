"""Stark (AIR) abstraction: one constraint system evaluated in two algebras.

A table's constraints are written once against the operator surface shared
by GF arrays (prover: vectorized over the whole LDE coset) and HExt scalars
(verifier: at the out-of-domain point zeta). This replaces the reference's
eval_packed_generic / eval_ext_circuit duplication (every `*_stark.rs`, see
SURVEY.md §2.2) with a single generic eval.
"""

from __future__ import annotations


class StarkFrame:
    """Constraint inputs: column values on the current and next row (for
    the prover these are (m,)-shaped GF arrays; for the verifier HExt
    scalars), plus auxiliary (lookup/CTL) columns and public inputs."""

    __slots__ = ("local", "next", "aux_local", "aux_next",
                 "public_inputs", "params")

    def __init__(self, local, next_, public_inputs=None,
                 aux_local=None, aux_next=None, params=()):
        self.local = local
        self.next = next_
        self.aux_local = aux_local or []
        self.aux_next = aux_next or []
        self.params = tuple(params)
        self.public_inputs = public_inputs or []


class ConstraintConsumer:
    """Accumulates constraints as acc_i = acc_i * alpha_i + c per challenge.

    Row-filter selectors (z_last, lagrange_first/last) are algebra elements
    supplied by the caller, evaluated on the same domain as the frame."""

    def __init__(self, alphas, zero, z_last, lagrange_first, lagrange_last):
        self.alphas = list(alphas)
        self.accs = [zero for _ in alphas]
        self.z_last = z_last
        self.lagrange_first = lagrange_first
        self.lagrange_last = lagrange_last

    def constraint(self, c) -> None:
        """Must hold on every row of the trace."""
        self.accs = [acc * alpha + c
                     for acc, alpha in zip(self.accs, self.alphas)]

    def constraint_transition(self, c) -> None:
        """Must hold on every row but the last."""
        self.constraint(c * self.z_last)

    def constraint_first_row(self, c) -> None:
        self.constraint(c * self.lagrange_first)

    def constraint_last_row(self, c) -> None:
        self.constraint(c * self.lagrange_last)

    # -- block forms ---------------------------------------------------------
    # A block of K constraints folds exactly like K sequential constraint()
    # calls (acc*a^K + sum_k a^{K-1-k} c_k) but in O(log K) vectorized ops
    # when the constraints are a GF array of shape (K, m). Wide bitwise
    # tables (Keccak: tens of thousands of uniform bit constraints) are
    # infeasible as per-constraint dispatches. The verifier-side algebra
    # (list of HExt) takes the sequential path — the transcripts agree
    # because the fold math is identical.

    def constraint_block(self, cs) -> None:
        if isinstance(cs, (list, tuple)):
            for c in cs:
                self.constraint(c)
            return
        from ..field import GF, np_field
        import numpy as np
        k = cs.shape[0]
        new_accs = []
        for acc, alpha in zip(self.accs, self.alphas):
            if isinstance(alpha, int):
                w = np_field.powers(alpha, k)[::-1].copy()
                wgf = GF.from_u64(w.reshape(k, 1))
                ak = int(np_field.powers(alpha, k + 1)[k])
            else:
                # traced GF alpha (jitted quotient path): powers by
                # device log-doubling so the graph stays O(log k)
                wfwd, ak = _gf_powers(alpha, k)
                wgf = wfwd[::-1].reshape(k, 1)
            contrib = (cs * wgf).sum(axis=0)
            new_accs.append(acc * ak + contrib)
        self.accs = new_accs

    def constraint_block_transition(self, cs) -> None:
        if isinstance(cs, (list, tuple)):
            for c in cs:
                self.constraint_transition(c)
            return
        self.constraint_block(cs * self.z_last)


class StackingConsumer(ConstraintConsumer):
    """Same folding semantics as ConstraintConsumer, computed as ONE
    weighted log-tree reduction instead of a serial alpha-chain.

    Every constraint call stacks its (m,)- or (K, m)-shaped values; a
    final `finalize()` computes, per challenge,
        acc = sum_k alpha^{K_total-1-k} c_k
    which is bit-identical to K_total sequential `constraint()` folds
    (acc0 = 0). Two reasons to prefer this on the device:

    * the serial chain is K dependent mul-adds; the stacked form is one
      broadcast multiply + a log-depth tree sum — far better utilization
      for the wide bitwise tables;
    * round 5 root-cause: the XLA:TPU (axon) compile of the big fused
      eval+serial-fold graph MISCOMPILES for the Poseidon table (jit
      and eager disagreed; scripts/bisect_poseidon*.py) while both the
      stacked values and the single big fold compile correctly — this
      shape is the fix for the round-4 windowed-quotient regression.
    """

    def __init__(self, alphas, zero, z_last, lagrange_first, lagrange_last):
        super().__init__(alphas, zero, z_last, lagrange_first, lagrange_last)
        self._stack = []
        self._zero = zero

    def constraint(self, c) -> None:
        from ..field import GF
        if not isinstance(c, GF):
            c = self._zero + c
        if c.shape != self._zero.shape:
            c = c.broadcast_to(self._zero.shape)
        self._stack.append(c.reshape(1, -1))

    def constraint_block(self, cs) -> None:
        from ..field import GF
        if isinstance(cs, (list, tuple)):
            for c in cs:
                self.constraint(c)
            return
        self._stack.append(cs.reshape(-1, cs.shape[-1]))

    def finalize(self) -> None:
        """Compute accs from the stacked constraints. Idempotent."""
        from ..field import GF
        if not self._stack:
            return
        cs = GF.concatenate(self._stack, axis=0)
        self._stack = []
        k = cs.shape[0]
        new_accs = []
        for acc, alpha in zip(self.accs, self.alphas):
            if isinstance(alpha, int):
                from ..field import np_field
                import numpy as np
                w = np_field.powers(alpha, k)[::-1].copy()
                wgf = GF.from_u64(w.reshape(k, 1))
            else:
                wfwd, _ak = _gf_powers(alpha, k)
                wgf = wfwd[::-1].reshape(k, 1)
            # acc0 is zero by construction (fresh consumer per window)
            new_accs.append((cs * wgf).sum(axis=0))
        self.accs = new_accs


def _gf_powers(alpha, k: int):
    """[alpha^0 .. alpha^(k-1)] as a (k,) GF array plus alpha^k, built by
    log-doubling (O(log k) traced ops) from a GF scalar."""
    from ..field import GF
    import numpy as np
    arr = GF.from_u64(np.uint64(1)).reshape(1)   # alpha^0..alpha^(len-1)
    cur = alpha.reshape(1)                       # alpha^len(arr)
    while arr.shape[0] < k:
        take = min(arr.shape[0], k - arr.shape[0])
        arr = GF.concatenate([arr, arr[:take] * cur], axis=0)
        cur = cur * cur     # correct whenever the step doubled; the
        # only step where it does not is the last, after which the loop
        # exits and cur is unused
    ak = arr[k - 1] * alpha
    return arr, ak


class Stark:
    """Base class for one STARK table."""

    name: str = "stark"
    num_columns: int = 0
    num_public_inputs: int = 0
    constraint_degree: int = 3

    # Lookup/CTL metadata filled in by subclasses (see tables/, ctl.py):
    def lookups(self):
        return []

    # -- per-proof scalar parameters ---------------------------------------
    # Values that vary per proof (e.g. the CPU table's segment-boundary
    # pcs) enter constraint evaluation as TRACED scalars via
    # frame.params, so one compiled quotient program serves every
    # segment. Everything else on the instance is compile-time constant
    # and participates in jit_key().
    proof_param_names: tuple = ()

    def proof_params(self) -> tuple:
        return tuple(getattr(self, n) for n in self.proof_param_names)

    def jit_key(self) -> tuple:
        skip = set(self.proof_param_names) | {"_pre_cache"}
        items = tuple(sorted(
            (k, v) for k, v in vars(self).items()
            if k not in skip and isinstance(v, (int, str, bool, tuple))))
        return (type(self).__module__, type(self).__qualname__, items)

    def known_columns(self):
        """Columns whose values are fixed by data the verifier holds.
        The verifier recomputes their openings at zeta/zeta*g
        barycentrically (recursion/known.py) and asserts equality,
        binding the committed polynomials to the known data. Prefer
        `preprocessed()` (cap-constant binding, recursable)."""
        return {}

    # -- preprocessed (program) oracle ------------------------------------
    # The first `num_preprocessed` columns of the trace are fixed by data
    # the verifier holds (the Rvm's program). They are committed in their
    # OWN oracle whose Merkle cap is a constant of the verification key:
    # the verifier (and the recursion tape) bind openings to that cap via
    # FRI alone — plonky2's constant/preprocessed polynomial treatment.
    num_preprocessed: int = 0

    def preprocessed(self):
        """(num_preprocessed, n) uint64 values, or None."""
        return None

    def preprocessed_batch(self, config):
        """Commit the preprocessed columns once per (program, config)."""
        pre = self.preprocessed()
        if pre is None:
            return None
        key = ("_pre_batch", config.rate_bits, config.cap_height,
               config.hasher)
        cached = getattr(self, "_pre_cache", None)
        if cached is not None and cached[0] == key:
            return cached[1]
        from ..field import GF
        from .poly_batch import PolynomialBatch
        batch = PolynomialBatch.from_values(
            GF.from_u64(pre), rate_bits=config.rate_bits,
            cap_height=config.cap_height, hasher=config.hasher)
        self._pre_cache = (key, batch)
        return batch

    def requires_ctls(self):
        return False

    def eval(self, frame: StarkFrame, cc: ConstraintConsumer) -> None:
        raise NotImplementedError
