"""Arithmetic table: ADD..BYTE, SHL/SHR, ADDMOD/MULMOD/SUBMOD, FP254 ops,
plus CPU-dispatched range-check rows.

Functional twin of the reference's arithmetic unit (116 columns = 17 op
flags + OPCODE_COL + 6x16 shared 16-bit-limb registers + RANGE_COUNTER +
RC_FREQUENCIES; layout /root/reference/evm_arithmetization/src/arithmetic/
columns.rs, semantics addcy.rs / mul.rs / modular.rs / divmod.rs / byte.rs
/ shift.rs, spec book/src/tables/arithmetic.md). All 256-bit values are 16
little-endian 16-bit limbs; every shared column is range-checked to 16
bits via the logUp argument against RANGE_COUNTER.

Constraint strategy (same math, one generic implementation):
- ADD/SUB/LT/GT: the add-with-carry identity X + Y = Z + CY*2^256 checked
  limb-wise with carry chain t*(2^16 - t) == 0.
- MUL/SHL: polynomial identity a(x)b(x) - c(x) - (x-B)s(x) == 0 at each
  coefficient, with the carry polynomial s offset by 2^20 and split into
  16-bit halves.
- Modular ops (two rows): op(a,b) - c - q*m - (x-B)s == 0 with
  mod-is-zero handling and reducedness check via the addcy identity.
- BYTE: 5-bit multiplexer tree over the 16 limbs.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..field import host
from ..stark import Stark, Lookup

P = host.P
LIMB_BITS = 16
N_LIMBS = 16
BASE = 1 << LIMB_BITS
# 2^-16 mod p
BASE_INV = host.finv(BASE)
AUX_COEFF_ABS_MAX = 1 << 20
RANGE_MAX = 1 << 16

# BN254 base-field modulus (public parameter; reference keeps it in
# extension_tower.rs as BN_BASE)
BN_BASE = 21888242871839275222246405745257275088696311157297823662689037894645226208583

# ---------------------------------------------------------------------------
# Column layout (mirrors columns.rs)
# ---------------------------------------------------------------------------
IS_ADD = 0
IS_MUL = 1
IS_SUB = 2
IS_DIV = 3
IS_MOD = 4
IS_ADDMOD = 5
IS_MULMOD = 6
IS_ADDFP254 = 7
IS_MULFP254 = 8
IS_SUBFP254 = 9
IS_SUBMOD = 10
IS_LT = 11
IS_GT = 12
IS_BYTE = 13
IS_SHL = 14
IS_SHR = 15
IS_RANGE_CHECK = 16
OPCODE_COL = 17
START_SHARED_COLS = 18
NUM_SHARED_COLS = 6 * N_LIMBS

def _r(start, n=N_LIMBS):
    return list(range(start, start + n))

INPUT_REGISTER_0 = _r(START_SHARED_COLS)
INPUT_REGISTER_1 = _r(INPUT_REGISTER_0[-1] + 1)
INPUT_REGISTER_2 = _r(INPUT_REGISTER_1[-1] + 1)
OUTPUT_REGISTER = _r(INPUT_REGISTER_2[-1] + 1)
AUX_INPUT_REGISTER_0 = _r(OUTPUT_REGISTER[-1] + 1)
AUX_INPUT_REGISTER_1 = _r(AUX_INPUT_REGISTER_0[-1] + 1)
AUX_INPUT_REGISTER_DBL = AUX_INPUT_REGISTER_0 + AUX_INPUT_REGISTER_1

AUX_REGISTER_0 = _r(START_SHARED_COLS)
AUX_REGISTER_1 = _r(AUX_REGISTER_0[-1] + 1, 2 * N_LIMBS)
AUX_REGISTER_2 = _r(AUX_REGISTER_1[-1] + 1, 2 * N_LIMBS - 1)

MUL_AUX_INPUT_LO = AUX_INPUT_REGISTER_0
MUL_AUX_INPUT_HI = AUX_INPUT_REGISTER_1
MODULAR_QUO_INPUT = AUX_INPUT_REGISTER_DBL
MODULAR_OUT_AUX_RED = AUX_REGISTER_0
MODULAR_MOD_IS_ZERO = AUX_REGISTER_1[0]
MODULAR_AUX_INPUT_LO = AUX_REGISTER_1[1:]           # 31 cols
MODULAR_AUX_INPUT_HI = AUX_REGISTER_2               # 31 cols
MODULAR_DIV_DENOM_IS_ZERO = AUX_REGISTER_2[-1] + 1

RANGE_COUNTER = START_SHARED_COLS + NUM_SHARED_COLS
RC_FREQUENCIES = RANGE_COUNTER + 1
NUM_COLUMNS = RANGE_COUNTER + 2
SHARED_COLS = list(range(START_SHARED_COLS, RANGE_COUNTER))
OP_FLAGS = list(range(IS_ADD, IS_RANGE_CHECK + 1))

# byte-op column names inside AUX registers
BYTE_IDX_DECOMP = AUX_INPUT_REGISTER_0[0:6]
BYTE_IDX_DECOMP_HI = AUX_INPUT_REGISTER_0[5]
BYTE_LAST_LIMB_LO = AUX_INPUT_REGISTER_0[6]
BYTE_LAST_LIMB_HI = AUX_INPUT_REGISTER_0[7]
BYTE_IDX_IS_LARGE = AUX_INPUT_REGISTER_0[8]
BYTE_IDX_HI_LIMB_SUM_INV = AUX_INPUT_REGISTER_0[9:13]

U256_MASK = (1 << 256) - 1


def _to_limbs(x: int, n: int = N_LIMBS) -> list[int]:
    return [(x >> (LIMB_BITS * i)) & 0xFFFF for i in range(n)]


def _signed_limbs(num: int, n: int) -> list[int]:
    """bigint_to_columns semantics: limbs of |num|, negated if num < 0."""
    a = abs(num)
    limbs = [(a >> (LIMB_BITS * i)) & 0xFFFF for i in range(n)]
    if num < 0:
        limbs = [-c for c in limbs]
    return limbs


def _f(x: int) -> int:
    """Encode a (possibly negative) int as a canonical field element."""
    return x % P


# ---------------------------------------------------------------------------
# Polynomial helpers (generation side: python ints; eval side: algebra)
# ---------------------------------------------------------------------------

def pol_mul_lo(a, b, n):
    out = [0] * n if isinstance(a[0], int) else [a[0] * 0 for _ in range(n)]
    for deg in range(n):
        acc = None
        for i in range(deg + 1):
            t = a[i] * b[deg - i]
            acc = t if acc is None else acc + t
        out[deg] = acc
    return out


def pol_mul_wide(a, b):
    """(16,16) -> 31 coefficients."""
    out = [None] * (2 * N_LIMBS - 1)
    for i, ai in enumerate(a):
        for j, bj in enumerate(b):
            t = ai * bj
            out[i + j] = t if out[i + j] is None else out[i + j] + t
    return out


def pol_mul_wide2(a, b):
    """(32,16) -> 47 coefficients."""
    out = [None] * (3 * N_LIMBS - 1)
    for i, ai in enumerate(a):
        for j, bj in enumerate(b):
            t = ai * bj
            out[i + j] = t if out[i + j] is None else out[i + j] + t
    return out


def pol_adjoin_root(a, root_int):
    """(x - root) * a(x), root a small int constant."""
    n = len(a)
    res = [None] * n
    res[0] = a[0] * (P - root_int)       # -root * a[0]
    for deg in range(1, n):
        res[deg] = a[deg - 1] - a[deg] * root_int
    return res


def pol_remove_root_2exp(a, exp, n):
    """Exact division by (x - 2^exp) on integer coefficient lists."""
    q = [0] * n
    q[0] = -(a[0] >> exp)
    for deg in range(1, n - 1):
        q[deg] = (q[deg - 1] - a[deg]) >> exp
    return q


# ---------------------------------------------------------------------------
# Operations (witness API)
# ---------------------------------------------------------------------------

BINARY_FLAG = {
    "add": IS_ADD, "mul": IS_MUL, "sub": IS_SUB, "div": IS_DIV,
    "mod": IS_MOD, "lt": IS_LT, "gt": IS_GT, "byte": IS_BYTE,
    "shl": IS_SHL, "shr": IS_SHR, "addfp254": IS_ADDFP254,
    "mulfp254": IS_MULFP254, "subfp254": IS_SUBFP254,
}
TERNARY_FLAG = {"addmod": IS_ADDMOD, "mulmod": IS_MULMOD,
                "submod": IS_SUBMOD}
TWO_ROW_FLAGS = {IS_DIV, IS_MOD, IS_SHR, IS_ADDMOD, IS_MULMOD, IS_SUBMOD,
                 IS_ADDFP254, IS_MULFP254, IS_SUBFP254}


def binary_result(op: str, in0: int, in1: int) -> int:
    if op == "add":
        return (in0 + in1) & U256_MASK
    if op == "mul":
        return (in0 * in1) & U256_MASK
    if op == "sub":
        return (in0 - in1) & U256_MASK
    if op == "div":
        return 0 if in1 == 0 else in0 // in1
    if op == "mod":
        return 0 if in1 == 0 else in0 % in1
    if op == "lt":
        return int(in0 < in1)
    if op == "gt":
        return int(in0 > in1)
    if op == "byte":
        return 0 if in0 >= 32 else (in1 >> (8 * (31 - in0))) & 0xFF
    if op == "shl":
        return (in1 << in0) & U256_MASK if in0 < 256 else 0
    if op == "shr":
        return (in1 >> in0) if in0 < 256 else 0
    if op == "addfp254":
        return (in0 + in1) % BN_BASE
    if op == "mulfp254":
        return (in0 * in1) % BN_BASE
    if op == "subfp254":
        return (in0 - in1) % BN_BASE
    raise ValueError(op)


def ternary_result(op: str, in0: int, in1: int, in2: int) -> int:
    if in2 == 0:
        return 0
    if op == "addmod":
        return (in0 + in1) % in2
    if op == "mulmod":
        return (in0 * in1) % in2
    if op == "submod":
        return (in0 - in1) % in2
    raise ValueError(op)


@dataclass
class Op:
    kind: str                   # name in BINARY_FLAG/TERNARY_FLAG or "range_check"
    in0: int = 0
    in1: int = 0
    in2: int = 0
    opcode: int = 0
    result: int | None = None


# ---------------------------------------------------------------------------
# Trace generation (rows of python ints -> uint64 trace)
# ---------------------------------------------------------------------------

def _set(row, cols, vals):
    for c, v in zip(cols, vals):
        row[c] = _f(v)


def _gen_addcy(row, flag, left, right):
    _set(row, INPUT_REGISTER_0, _to_limbs(left))
    _set(row, INPUT_REGISTER_1, _to_limbs(right))
    _set(row, INPUT_REGISTER_2, [0] * N_LIMBS)
    if flag == IS_ADD:
        result = (left + right) & U256_MASK
        cy = (left + right) >> 256
        _set(row, AUX_INPUT_REGISTER_0, _to_limbs(cy))
        _set(row, OUTPUT_REGISTER, _to_limbs(result))
    elif flag == IS_SUB:
        diff = (left - right) & U256_MASK
        cy = int(left < right)
        _set(row, AUX_INPUT_REGISTER_0, _to_limbs(cy))
        _set(row, OUTPUT_REGISTER, _to_limbs(diff))
    elif flag == IS_LT:
        diff = (left - right) & U256_MASK
        cy = int(left < right)
        _set(row, AUX_INPUT_REGISTER_0, _to_limbs(diff))
        _set(row, OUTPUT_REGISTER, _to_limbs(cy))
    elif flag == IS_GT:
        diff = (right - left) & U256_MASK
        cy = int(right < left)
        _set(row, AUX_INPUT_REGISTER_0, _to_limbs(diff))
        _set(row, OUTPUT_REGISTER, _to_limbs(cy))


def _gen_mul_core(row, a_limbs, b_limbs):
    unreduced = pol_mul_lo(a_limbs, b_limbs, N_LIMBS)
    out = [0] * N_LIMBS
    cy = 0
    for col in range(N_LIMBS):
        t = unreduced[col] + cy
        cy = t >> LIMB_BITS
        out[col] = t & 0xFFFF
    _set(row, OUTPUT_REGISTER, out)
    diff = [u - o for u, o in zip(unreduced, out)]
    aux = pol_remove_root_2exp(diff, LIMB_BITS, N_LIMBS)
    aux[N_LIMBS - 1] = -cy
    aux = [c + AUX_COEFF_ABS_MAX for c in aux]
    _set(row, MUL_AUX_INPUT_LO, [c & 0xFFFF for c in aux])
    _set(row, MUL_AUX_INPUT_HI, [(c >> 16) & 0xFFFF for c in aux])


def _gen_mul(row, left, right):
    _set(row, INPUT_REGISTER_0, _to_limbs(left))
    _set(row, INPUT_REGISTER_1, _to_limbs(right))
    _set(row, INPUT_REGISTER_2, [0] * N_LIMBS)
    _gen_mul_core(row, _to_limbs(left), _to_limbs(right))


def _gen_modular_op(row, row2, flag, pol_input, modulus_limbs):
    """Port of generate_modular_op (modular.rs:211-341). pol_input: 31
    integer coefficients. Returns (output_limbs, quot_limbs)."""
    modulus = sum(c << (LIMB_BITS * i) for i, c in enumerate(modulus_limbs))
    constr_poly = list(pol_input) + [0]          # 32
    mod_is_zero = 0
    if modulus == 0:
        if flag in (IS_DIV, IS_SHR):
            modulus = 1 << 256
        else:
            modulus = 1
            modulus_limbs = list(modulus_limbs)
            modulus_limbs[0] = 1
        mod_is_zero = 1
    input_val = sum(c << (LIMB_BITS * i) for i, c in enumerate(constr_poly))
    output = input_val % modulus
    output_limbs = _to_limbs(output)
    quot = (input_val - output) // modulus
    quot_limbs = _signed_limbs(quot, 2 * N_LIMBS)
    out_aux_red = _to_limbs((1 << 256) - modulus + output)

    constr_poly = [c - o for c, o in zip(constr_poly,
                                         output_limbs + [0] * N_LIMBS)]
    prod = pol_mul_wide2(quot_limbs, modulus_limbs)
    assert all(x == 0 for x in prod[2 * N_LIMBS:]), "quot*mod overflow"
    constr_poly = [c - p for c, p in zip(constr_poly, prod[:2 * N_LIMBS])]

    aux_limbs = pol_remove_root_2exp(constr_poly, LIMB_BITS, 2 * N_LIMBS)
    aux_limbs = [c + AUX_COEFF_ABS_MAX for c in aux_limbs]
    assert all(0 <= c <= 2 * AUX_COEFF_ABS_MAX for c in aux_limbs)
    _set(row2, MODULAR_AUX_INPUT_LO,
         [c & 0xFFFF for c in aux_limbs[:2 * N_LIMBS - 1]])
    _set(row2, MODULAR_AUX_INPUT_HI,
         [(c >> 16) & 0xFFFF for c in aux_limbs[:2 * N_LIMBS - 1]])

    if flag in (IS_SUBMOD, IS_SUBFP254):
        lo = quot_limbs[:N_LIMBS]
        hi = quot_limbs[N_LIMBS:]
        assert all(c <= 0xFFFF for c in lo)
        assert all(d == 0 for d in hi)
        if quot < 0:
            lo = [c + 0xFFFF for c in lo]
            hi = [1] + [0] * (N_LIMBS - 1)
        quot_limbs = lo + hi

    row2[MODULAR_MOD_IS_ZERO] = _f(mod_is_zero)
    _set(row2, MODULAR_OUT_AUX_RED, out_aux_red)
    row2[MODULAR_DIV_DENOM_IS_ZERO] = _f(
        mod_is_zero * (1 if flag in (IS_DIV, IS_SHR) else 0))
    return output_limbs, quot_limbs


def _gen_ternary(row, row2, flag, in0, in1, in2):
    _set(row, INPUT_REGISTER_0, _to_limbs(in0))
    _set(row, INPUT_REGISTER_1, _to_limbs(in1))
    _set(row, INPUT_REGISTER_2, _to_limbs(in2))
    a = _to_limbs(in0)
    b = _to_limbs(in1)
    if flag in (IS_ADDMOD, IS_ADDFP254):
        pol_input = [x + y for x, y in zip(a, b)] + [0] * (N_LIMBS - 1)
    elif flag in (IS_SUBMOD, IS_SUBFP254):
        pol_input = [x - y for x, y in zip(a, b)] + [0] * (N_LIMBS - 1)
    else:
        pol_input = pol_mul_wide(a, b)
    out, quot = _gen_modular_op(row, row2, flag, pol_input,
                                _to_limbs(in2))
    _set(row, OUTPUT_REGISTER, out)
    _set(row, MODULAR_QUO_INPUT, quot)


def _gen_divmod(row, row2, flag, num_limbs, den_limbs):
    pol_input = list(num_limbs) + [0] * (N_LIMBS - 1)
    out, quot = _gen_modular_op(row, row2, flag, pol_input, den_limbs)
    assert all(c == 0 for c in quot[N_LIMBS:])
    if flag in (IS_DIV, IS_SHR):
        _set(row, AUX_INPUT_REGISTER_0, out)          # remainder
        _set(row, OUTPUT_REGISTER, quot[:N_LIMBS])    # quotient (output)
    else:  # IS_MOD
        _set(row, AUX_INPUT_REGISTER_0, quot[:N_LIMBS])
        _set(row, OUTPUT_REGISTER, out)


def _gen_byte(row, idx, val):
    _set(row, INPUT_REGISTER_0, _to_limbs(idx))
    _set(row, INPUT_REGISTER_1, _to_limbs(val))
    for i in range(5):
        row[BYTE_IDX_DECOMP[i]] = (idx >> i) & 1
    row[BYTE_IDX_DECOMP_HI] = ((idx & 0xFFFF) >> 5)
    idx_limbs = _to_limbs(idx)
    hi_limb_sum = row[BYTE_IDX_DECOMP_HI] + sum(idx_limbs[1:])
    hi_inv = host.finv(_f(hi_limb_sum)) if hi_limb_sum % P else 1
    for k in range(4):
        row[BYTE_IDX_HI_LIMB_SUM_INV[k]] = (hi_inv >> (16 * k)) & 0xFFFF
    row[BYTE_IDX_IS_LARGE] = int(hi_limb_sum != 0)

    val_limbs = _to_limbs(val)
    # mux tree over limbs, using low 5 bits of idx
    tree = []
    bit = (idx >> 4) & 1
    lvl = val_limbs[8:] if bit == 0 else val_limbs[:8]
    # Mirrors the generation loop (byte.rs:150-171): level selected by
    # !bit (reversed byte indexing), appended to tree.
    tree += lvl
    bit = (idx >> 3) & 1
    lvl = lvl[4:] if bit == 0 else lvl[:4]
    tree += lvl
    bit = (idx >> 2) & 1
    lvl = lvl[2:] if bit == 0 else lvl[:2]
    tree += lvl
    bit = (idx >> 1) & 1
    limb = lvl[1] if bit == 0 else lvl[0]
    tree += [limb]
    lo = limb & 0xFF
    hi = limb >> 8
    row[BYTE_LAST_LIMB_LO] = lo << 8
    row[BYTE_LAST_LIMB_HI] = hi
    out_byte = lo if (idx & 1) else hi
    tree += [out_byte]
    _set(row, AUX_INPUT_REGISTER_1, tree)
    result = out_byte if idx < 32 else 0
    _set(row, OUTPUT_REGISTER, _to_limbs(result))


def op_to_rows(op: Op) -> list[list[int]]:
    row = [0] * NUM_COLUMNS
    if op.kind == "range_check":
        row[IS_RANGE_CHECK] = 1
        row[OPCODE_COL] = _f(op.opcode)
        _set(row, INPUT_REGISTER_0, _to_limbs(op.in0))
        _set(row, INPUT_REGISTER_1, _to_limbs(op.in1))
        _set(row, INPUT_REGISTER_2, _to_limbs(op.in2))
        _set(row, OUTPUT_REGISTER, _to_limbs(op.result or 0))
        return [row]
    if op.kind in TERNARY_FLAG:
        flag = TERNARY_FLAG[op.kind]
        row[flag] = 1
        row2 = [0] * NUM_COLUMNS
        _gen_ternary(row, row2, flag, op.in0, op.in1, op.in2)
        return [row, row2]
    flag = BINARY_FLAG[op.kind]
    row[flag] = 1
    if flag in (IS_ADD, IS_SUB, IS_LT, IS_GT):
        _gen_addcy(row, flag, op.in0, op.in1)
        return [row]
    if flag == IS_MUL:
        _gen_mul(row, op.in0, op.in1)
        return [row]
    if flag == IS_BYTE:
        _gen_byte(row, op.in0, op.in1)
        return [row]
    if flag in (IS_ADDFP254, IS_MULFP254, IS_SUBFP254):
        row2 = [0] * NUM_COLUMNS
        _gen_ternary(row, row2, flag, op.in0, op.in1, BN_BASE)
        return [row, row2]
    if flag in (IS_DIV, IS_MOD):
        row2 = [0] * NUM_COLUMNS
        _set(row, INPUT_REGISTER_0, _to_limbs(op.in0))
        _set(row, INPUT_REGISTER_1, _to_limbs(op.in1))
        result = binary_result(op.kind, op.in0, op.in1)
        _set(row, OUTPUT_REGISTER, _to_limbs(result))
        _gen_divmod(row, row2, flag, _to_limbs(op.in0), _to_limbs(op.in1))
        return [row, row2]
    if flag == IS_SHL:
        shift, value = op.in0, op.in1
        _set(row, INPUT_REGISTER_0, _to_limbs(shift))
        _set(row, INPUT_REGISTER_1, _to_limbs(value))
        disp = (1 << shift) & U256_MASK if shift < 256 else 0
        _set(row, INPUT_REGISTER_2, _to_limbs(disp))
        _gen_mul_core(row, _to_limbs(value), _to_limbs(disp))
        return [row]
    if flag == IS_SHR:
        shift, value = op.in0, op.in1
        row2 = [0] * NUM_COLUMNS
        _set(row, INPUT_REGISTER_0, _to_limbs(shift))
        _set(row, INPUT_REGISTER_1, _to_limbs(value))
        disp = (1 << shift) & U256_MASK if shift < 256 else 0
        _set(row, INPUT_REGISTER_2, _to_limbs(disp))
        result = binary_result("shr", shift, value)
        _set(row, OUTPUT_REGISTER, _to_limbs(result))
        _gen_divmod(row, row2, IS_SHR, _to_limbs(value), _to_limbs(disp))
        return [row, row2]
    raise ValueError(op.kind)


def generate_trace(ops: list[Op], min_rows: int = RANGE_MAX,
                   range_max: int = RANGE_MAX) -> np.ndarray:
    """`range_max` parameterizes the 16-bit range check table size
    (production: 2^16, forcing >= 2^16 rows as in the reference's degree
    range 2^16..2^23; tests may shrink it together with matching small
    operand values)."""
    rows: list[list[int]] = []
    for op in ops:
        rows.extend(op_to_rows(op))
    n = max(min_rows, range_max, 1)
    while n < len(rows):
        n *= 2
    trace = np.zeros((NUM_COLUMNS, n), dtype=np.uint64)
    if rows:
        trace[:, :len(rows)] = np.array(rows, dtype=np.uint64).T
    # range counter: 0..range_max-1 then clamped
    trace[RANGE_COUNTER, :range_max] = np.arange(range_max, dtype=np.uint64)
    trace[RANGE_COUNTER, range_max:] = range_max - 1
    # frequencies of every shared-column value
    freq = np.zeros(n, dtype=np.uint64)
    for col in SHARED_COLS:
        vals = trace[col]
        assert vals.max(initial=0) < range_max, \
            f"column {col} value exceeds range-check bound {range_max}"
        counts = np.bincount(vals.astype(np.int64), minlength=range_max)
        freq[:len(counts)] += counts.astype(np.uint64)
    trace[RC_FREQUENCIES] = freq
    return trace


# ---------------------------------------------------------------------------
# Constraints (generic algebra: GF arrays on LDE, HExt at zeta)
# ---------------------------------------------------------------------------

def _eval_addcy(cc, filt, x, y, z, given_cy, two_row):
    cy = None
    for xi, yi, zi in zip(x, y, z):
        t = xi + yi - zi if cy is None else cy + xi + yi - zi
        if two_row:
            cc.constraint_transition(filt * t * (BASE - t))
        else:
            cc.constraint(filt * t * (BASE - t))
        cy = t * BASE_INV
    if two_row:
        cc.constraint_transition(filt * (cy - given_cy[0]))
        for c in given_cy[1:]:
            cc.constraint_transition(filt * c)
    else:
        cc.constraint(filt * given_cy[0] * (given_cy[0] - 1))
        cc.constraint(filt * (cy - given_cy[0]))
        for c in given_cy[1:]:
            cc.constraint(filt * c)


def _eval_mul(cc, lv, filt, a, b):
    out = [lv[i] for i in OUTPUT_REGISTER]
    aux = [lv[lo] + lv[hi] * BASE - AUX_COEFF_ABS_MAX
           for lo, hi in zip(MUL_AUX_INPUT_LO, MUL_AUX_INPUT_HI)]
    constr = pol_mul_lo(a, b, N_LIMBS)
    adjoin = pol_adjoin_root(aux, BASE)
    for i in range(N_LIMBS):
        cc.constraint(filt * (constr[i] - out[i] - adjoin[i]))


def _modular_constr_poly(cc, lv, nv, filt, output, modulus, quot):
    """Returns c(x) + q(x)m(x) + (x-B)s(x) as 32 coefficients; emits the
    mod-is-zero and reducedness checks (modular.rs:427-497)."""
    mod_is_zero = nv[MODULAR_MOD_IS_ZERO]
    cc.constraint_transition(filt * (mod_is_zero * mod_is_zero
                                     - mod_is_zero))
    limb_sum = modulus[0]
    for mi in modulus[1:]:
        limb_sum = limb_sum + mi
    cc.constraint_transition(filt * limb_sum * mod_is_zero)
    modulus = [modulus[0] + mod_is_zero] + list(modulus[1:])

    div_denom_is_zero = nv[MODULAR_DIV_DENOM_IS_ZERO]
    cc.constraint_transition(
        filt * (mod_is_zero * (lv[IS_DIV] + lv[IS_SHR])
                - div_denom_is_zero))
    out_adj = [output[0] + div_denom_is_zero] + list(output[1:])

    # reducedness: modulus + out_aux_red == output + is_less_than*2^256
    out_aux_red = [nv[i] for i in MODULAR_OUT_AUX_RED]
    zero = filt * 0
    ilt = [1 - mod_is_zero * (lv[IS_DIV] + lv[IS_SHR])] \
        + [zero] * (N_LIMBS - 1)
    _eval_addcy(cc, filt, modulus, out_aux_red, out_adj, ilt, True)

    prod = pol_mul_wide2(quot, modulus)
    for x in prod[2 * N_LIMBS:]:
        cc.constraint_transition(filt * x)
    constr = list(prod[:2 * N_LIMBS])
    for i in range(N_LIMBS):
        constr[i] = constr[i] + output[i]

    aux = [nv[lo] - AUX_COEFF_ABS_MAX + nv[hi] * BASE
           for lo, hi in zip(MODULAR_AUX_INPUT_LO, MODULAR_AUX_INPUT_HI)]
    aux.append(zero)                                  # 32nd coeff is 0
    adjoin = pol_adjoin_root(aux, BASE)
    return [c + r for c, r in zip(constr, adjoin)]


def _submod_constr_poly(cc, lv, nv, filt, output, modulus, quot):
    quot = list(quot)
    sign = quot[N_LIMBS]
    cc.constraint(filt * sign * (sign - 1))
    for i in range(N_LIMBS):
        quot[i] = quot[i] - sign * 0xFFFF
    quot[N_LIMBS] = filt * 0
    for d in quot[N_LIMBS:]:
        cc.constraint(filt * d)
    return _modular_constr_poly(cc, lv, nv, filt, output, modulus, quot)


def _eval_divmod_helper(cc, lv, nv, filt, num_cols, den_cols, quo_cols,
                        rem_cols):
    cc.constraint_last_row(filt)
    num = [lv[i] for i in num_cols]
    den = [lv[i] for i in den_cols]
    zero = filt * 0
    quo = [lv[i] for i in quo_cols] + [zero] * N_LIMBS
    rem = [lv[i] for i in rem_cols]
    constr = _modular_constr_poly(cc, lv, nv, filt, rem, den, quo)
    for i in range(2 * N_LIMBS):
        c = constr[i] - num[i] if i < N_LIMBS else constr[i]
        cc.constraint_transition(filt * c)


def _eval_byte(cc, lv):
    is_byte = lv[IS_BYTE]
    idx = [lv[i] for i in INPUT_REGISTER_0]
    val = [lv[i] for i in INPUT_REGISTER_1]
    out = [lv[i] for i in OUTPUT_REGISTER]
    decomp = [lv[i] for i in AUX_INPUT_REGISTER_0[:6]]
    tree = [lv[i] for i in AUX_INPUT_REGISTER_1]

    idx0_lo5 = None
    for i in range(5):
        bit = decomp[i]
        cc.constraint(is_byte * (bit * bit - bit))
        t = bit * (1 << i)
        idx0_lo5 = t if idx0_lo5 is None else idx0_lo5 + t
    cc.constraint(is_byte * (idx[0] - (idx0_lo5 + decomp[5] * 32)))

    bit = decomp[4]
    for i in range(8):
        limb = bit * val[i] + (1 - bit) * val[i + 8]
        cc.constraint(is_byte * (tree[i] - limb))
    bit = decomp[3]
    for i in range(4):
        limb = bit * tree[i] + (1 - bit) * tree[i + 4]
        cc.constraint(is_byte * (tree[i + 8] - limb))
    bit = decomp[2]
    for i in range(2):
        limb = bit * tree[i + 8] + (1 - bit) * tree[i + 10]
        cc.constraint(is_byte * (tree[i + 12] - limb))
    bit = decomp[1]
    limb = bit * tree[12] + (1 - bit) * tree[13]
    cc.constraint(is_byte * (tree[14] - limb))

    lo_byte = lv[BYTE_LAST_LIMB_LO]
    hi_byte = lv[BYTE_LAST_LIMB_HI]
    cc.constraint(is_byte * (lo_byte + (hi_byte * 256 - limb) * 256))
    bit = decomp[0]
    t = bit * lo_byte + (1 - bit) * hi_byte * 256
    cc.constraint(is_byte * (tree[15] * 256 - t))
    expected_out_byte = tree[15]

    hi_limb_sum = decomp[5]
    for x in idx[1:]:
        hi_limb_sum = hi_limb_sum + x
    idx_is_large = lv[BYTE_IDX_IS_LARGE]
    cc.constraint(is_byte * (idx_is_large * idx_is_large - idx_is_large))
    cc.constraint(is_byte * hi_limb_sum * (idx_is_large - 1))
    hi_inv = lv[BYTE_IDX_HI_LIMB_SUM_INV[0]] \
        + lv[BYTE_IDX_HI_LIMB_SUM_INV[1]] * (1 << 16) \
        + lv[BYTE_IDX_HI_LIMB_SUM_INV[2]] * (1 << 32) \
        + lv[BYTE_IDX_HI_LIMB_SUM_INV[3]] * ((1 << 48) % P)
    cc.constraint(is_byte * (hi_limb_sum * hi_inv - idx_is_large))
    cc.constraint(is_byte * (out[0] - (1 - idx_is_large)
                             * expected_out_byte))
    for i in range(1, N_LIMBS):
        cc.constraint(is_byte * out[i])


class ArithmeticStark(Stark):
    name = "arithmetic"
    num_columns = NUM_COLUMNS

    def __init__(self, range_max: int = RANGE_MAX):
        self.range_max = range_max

    def eval(self, frame, cc):
        lv = frame.local
        nv = frame.next

        # flags boolean, at most one active
        for f in OP_FLAGS:
            cc.constraint(lv[f] * lv[f] - lv[f])
        all_flags = lv[OP_FLAGS[0]]
        for f in OP_FLAGS[1:]:
            all_flags = all_flags + lv[f]
        cc.constraint(all_flags * all_flags - all_flags)
        # OPCODE_COL is zero unless range-check
        cc.constraint((1 - lv[IS_RANGE_CHECK]) * lv[OPCODE_COL])

        # range counter: starts 0, increments by 0/1, ends at RANGE_MAX-1
        rc1 = lv[RANGE_COUNTER]
        rc2 = nv[RANGE_COUNTER]
        cc.constraint_first_row(rc1)
        incr = rc2 - rc1
        cc.constraint_transition(incr * incr - incr)
        cc.constraint_last_row(rc1 - (self.range_max - 1))

        in0 = [lv[i] for i in INPUT_REGISTER_0]
        in1 = [lv[i] for i in INPUT_REGISTER_1]
        in2 = [lv[i] for i in INPUT_REGISTER_2]
        out = [lv[i] for i in OUTPUT_REGISTER]
        aux0 = [lv[i] for i in AUX_INPUT_REGISTER_0]

        # MUL and SHL
        _eval_mul(cc, lv, lv[IS_MUL], in0, in1)
        _eval_mul(cc, lv, lv[IS_SHL], in1, in2)
        # ADD/SUB/LT/GT
        _eval_addcy(cc, lv[IS_ADD], in0, in1, out, aux0, False)
        _eval_addcy(cc, lv[IS_SUB], in1, out, in0, aux0, False)
        _eval_addcy(cc, lv[IS_LT], in1, aux0, in0, out, False)
        _eval_addcy(cc, lv[IS_GT], in0, aux0, in1, out, False)
        # DIV / MOD / SHR
        _eval_divmod_helper(cc, lv, nv, lv[IS_DIV], INPUT_REGISTER_0,
                            INPUT_REGISTER_1, OUTPUT_REGISTER,
                            AUX_INPUT_REGISTER_0)
        _eval_divmod_helper(cc, lv, nv, lv[IS_MOD], INPUT_REGISTER_0,
                            INPUT_REGISTER_1, AUX_INPUT_REGISTER_0,
                            OUTPUT_REGISTER)
        _eval_divmod_helper(cc, lv, nv, lv[IS_SHR], INPUT_REGISTER_1,
                            INPUT_REGISTER_2, OUTPUT_REGISTER,
                            AUX_INPUT_REGISTER_0)
        # modular family
        bn254_filter = lv[IS_ADDFP254] + lv[IS_MULFP254] + lv[IS_SUBFP254]
        filt = lv[IS_ADDMOD] + lv[IS_SUBMOD] + lv[IS_MULMOD] + bn254_filter
        cc.constraint_last_row(filt)
        bn_limbs = _to_limbs(BN_BASE)
        for mi, bi in zip(in2, bn_limbs):
            cc.constraint_transition(bn254_filter * (mi - bi))
        quo_input = [lv[i] for i in MODULAR_QUO_INPUT]
        add_filter = lv[IS_ADDMOD] + lv[IS_ADDFP254]
        sub_filter = lv[IS_SUBMOD] + lv[IS_SUBFP254]
        mul_filter = lv[IS_MULMOD] + lv[IS_MULFP254]
        addmul_filter = add_filter + mul_filter

        sub_constr = _submod_constr_poly(cc, lv, nv, sub_filter, out, in2,
                                         quo_input)
        mod_constr = _modular_constr_poly(cc, lv, nv, addmul_filter, out,
                                          in2, quo_input)
        add_input = [x + y for x, y in zip(in0, in1)]
        sub_input = [x - y for x, y in zip(in0, in1)]
        mul_input = pol_mul_wide(in0, in1)
        for inp, f, constr in ((add_input, add_filter, mod_constr),
                               (sub_input, sub_filter, sub_constr),
                               (mul_input, mul_filter, mod_constr)):
            for i in range(2 * N_LIMBS):
                c = constr[i] - inp[i] if i < len(inp) else constr[i]
                cc.constraint_transition(f * c)
        # BYTE
        _eval_byte(cc, lv)

    def lookups(self):
        return [Lookup(looking_columns=tuple(SHARED_COLS),
                       table_column=RANGE_COUNTER,
                       frequencies_column=RC_FREQUENCIES)]

    def requires_ctls(self):
        return True
