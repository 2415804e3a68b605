"""ctypes bindings for the native host library (native/libzkhost.so).

Builds on demand with `make -C native`; every entry point has a
pure-python twin, so the package works without a toolchain — callers use
`keccak256` / `gl_suffix_sum` from here and get the fast path when
available (the reference keeps these host hot loops native too; witness
generation is pure host work, SURVEY.md §2.4)."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_DIR, "libzkhost.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    def _stale():
        if not os.path.exists(_LIB_PATH):
            return True
        so = os.path.getmtime(_LIB_PATH)
        return any(
            os.path.getmtime(os.path.join(_DIR, f)) > so
            for f in os.listdir(_DIR)
            if f.endswith((".cpp", ".h")))

    if _stale():
        try:
            subprocess.run(["make", "-C", _DIR], check=True,
                           capture_output=True, timeout=300)
        except Exception:
            if not os.path.exists(_LIB_PATH):
                _lib = False
                return _lib
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.keccak256.argtypes = [ctypes.c_char_p, ctypes.c_uint64,
                                  ctypes.c_char_p]
        lib.keccak_f1600.argtypes = [
            np.ctypeslib.ndpointer(np.uint64, flags="C")]
        lib.gl_suffix_sum.argtypes = [
            np.ctypeslib.ndpointer(np.uint64, flags="C"),
            np.ctypeslib.ndpointer(np.uint64, flags="C"),
            ctypes.c_uint64]
        lib.gl_batch_inv.argtypes = [
            np.ctypeslib.ndpointer(np.uint64, flags="C"),
            np.ctypeslib.ndpointer(np.uint64, flags="C"),
            ctypes.c_uint64]
        lib.gl_vec_mul.argtypes = lib.gl_vec_add.argtypes = [
            np.ctypeslib.ndpointer(np.uint64, flags="C"),
            np.ctypeslib.ndpointer(np.uint64, flags="C"),
            np.ctypeslib.ndpointer(np.uint64, flags="C"),
            ctypes.c_uint64]
        u64p = np.ctypeslib.ndpointer(np.uint64, flags="C")
        lib.poseidon_permute_many.argtypes = [
            u64p, u64p, u64p, ctypes.c_uint64, ctypes.c_uint64,
            u64p, ctypes.c_uint64]
        lib.poseidon_hash_leaves.argtypes = [
            u64p, u64p, u64p, ctypes.c_uint64, ctypes.c_uint64,
            u64p, u64p, ctypes.c_uint64, u64p]
        lib.poseidon_witness_batch.argtypes = [
            u64p, u64p, u64p, ctypes.c_uint64, ctypes.c_uint64,
            u64p, ctypes.c_uint64, u64p, u64p, u64p, u64p]
        # tape core (recursion/vm.py NativeTape)
        h = ctypes.c_void_p
        i64, u64 = ctypes.c_int64, ctypes.c_uint64
        lib.tape_new.restype = h
        lib.tape_new.argtypes = [u64, u64p, u64, u64p, u64p, u64, u64]
        lib.tape_free.argtypes = [h]
        for f in ("tape_load", "tape_const"):
            getattr(lib, f).restype = i64
            getattr(lib, f).argtypes = [h, u64]
        lib.tape_arith.restype = i64
        lib.tape_arith.argtypes = [h, i64, i64, i64, u64, u64, u64]
        lib.tape_sel.restype = i64
        lib.tape_sel.argtypes = [h, i64, i64, i64]
        lib.tape_assert_eq.restype = i64
        lib.tape_assert_eq.argtypes = [h, i64, i64]
        lib.tape_pose.restype = i64
        lib.tape_pose.argtypes = [h, ctypes.POINTER(i64)]
        lib.tape_bind_public.restype = i64
        lib.tape_bind_public.argtypes = [h, i64, u64]
        lib.tape_value.restype = u64
        lib.tape_value.argtypes = [h, i64]
        for f in ("tape_n_rows", "tape_n_alloc", "tape_n_pose"):
            getattr(lib, f).restype = u64
            getattr(lib, f).argtypes = [h]
        lib.tape_get_publics.restype = u64
        lib.tape_get_publics.argtypes = [h, u64p]
        lib.tape_export_trace.argtypes = [h, u64, u64, u64p, u64]
        lib.tape_count_pose.restype = u64
        lib.tape_count_pose.argtypes = [h, u64, u64]
        lib.tape_export_pose.argtypes = [h, u64, u64, u64p]
        lib.tape_live_at.restype = u64
        lib.tape_live_at.argtypes = [h, i64, ctypes.c_void_p,
                                     ctypes.c_void_p]
        lib.tape_count_ops.restype = u64
        lib.tape_count_ops.argtypes = [h, u64, u64]
        lib.tape_export_ops.argtypes = [h, u64, u64, u64p]
        lib.tape_ram_size.restype = u64
        lib.tape_ram_size.argtypes = [h, u64, u64, u64p, u64, u64]
        lib.tape_ram_fill.restype = u64
        lib.tape_ram_fill.argtypes = [h, u64, u64, u64p, u64, u64,
                                      u64p, u64, u64p, u64]
        _lib = lib
    except Exception:
        _lib = False
    return _lib


def available() -> bool:
    return bool(_load())


def lib_handle():
    """The raw ctypes library (None when unavailable) — for callers that
    hold a native-side handle (recursion/vm.py NativeTape)."""
    lib = _load()
    return lib if lib else None


def keccak256(data: bytes) -> bytes:
    lib = _load()
    if not lib:
        from .tables.keccak_sponge import keccak256 as py_keccak256
        return py_keccak256(data)
    out = ctypes.create_string_buffer(32)
    lib.keccak256(data, len(data), out)
    return out.raw


def keccak_f_lanes(lanes) -> list[int] | None:
    """Native keccak-f[1600] over 25 u64 lanes (lane(x,y) = lanes[x+5y]);
    None when the native lib is unavailable."""
    lib = _load()
    if not lib:
        return None
    buf = np.asarray(lanes, dtype=np.uint64)
    assert buf.shape == (25,)
    buf = np.ascontiguousarray(buf)
    lib.keccak_f1600(buf)
    return [int(x) for x in buf]


def gl_suffix_sum(a: np.ndarray) -> np.ndarray:
    lib = _load()
    a = np.ascontiguousarray(a, dtype=np.uint64)
    if not lib:
        from .field import host
        out = np.empty_like(a)
        acc = 0
        for i in range(len(a) - 1, -1, -1):
            acc = host.fadd(acc, int(a[i]))
            out[i] = acc
        return out
    out = np.empty_like(a)
    lib.gl_suffix_sum(a, out, len(a))
    return out


def gl_batch_inv(a: np.ndarray) -> np.ndarray:
    """Elementwise field inverse (zeros map to zero) via the Montgomery
    batch trick; exact python fallback."""
    lib = _load()
    a = np.ascontiguousarray(a, dtype=np.uint64)
    out = np.empty_like(a)
    if not lib:
        from .field import host
        for i, v in enumerate(a):
            out[i] = host.finv(int(v)) if v else 0
        return out
    lib.gl_batch_inv(a, out, len(a))
    return out


def _poseidon_tables(params):
    """Flat (rc, circ, diag, half_full, n_partial) uint64 views of a
    PoseidonParams, cached per params object."""
    key = id(params)
    hit = _POSEIDON_TABLES.get(key)
    if hit is not None:
        return hit
    rc = np.array(params.round_constants, dtype=np.uint64)
    circ = np.array(params.mds_circ, dtype=np.uint64)
    diag = np.array(params.mds_diag, dtype=np.uint64)
    out = (rc, circ, diag, params.half_full_rounds, params.n_partial_rounds)
    _POSEIDON_TABLES[key] = out
    return out


_POSEIDON_TABLES: dict = {}


def poseidon_permute_many(states: np.ndarray, params) -> np.ndarray:
    """Batch Poseidon permutation over (n, 12) uint64 states (in place on
    a copy; returns the permuted array). None if the library is absent or
    the instance shape isn't width-12/x^7."""
    lib = _load()
    if not lib or params.width != 12 or params.sbox_exp != 7:
        return None
    rc, circ, diag, hf, npart = _poseidon_tables(params)
    states = np.ascontiguousarray(states, dtype=np.uint64)
    lib.poseidon_permute_many(rc, circ, diag, hf, npart, states,
                              states.shape[0])
    return states


def poseidon_hash_leaves(elems: np.ndarray, offsets: np.ndarray,
                         params) -> np.ndarray:
    """Digest (4 elements each) of n leaves given as a flat element stream
    with CSR-style offsets (len n+1); hash_or_noop semantics per leaf."""
    lib = _load()
    if not lib or params.width != 12 or params.sbox_exp != 7:
        return None
    rc, circ, diag, hf, npart = _poseidon_tables(params)
    elems = np.ascontiguousarray(elems, dtype=np.uint64)
    offsets = np.ascontiguousarray(offsets, dtype=np.uint64)
    n = len(offsets) - 1
    out = np.empty(4 * n, dtype=np.uint64)
    lib.poseidon_hash_leaves(rc, circ, diag, hf, npart, elems, offsets,
                             n, out)
    return out.reshape(n, 4)


def poseidon_witness_batch(states: np.ndarray, params):
    """Per-permutation AIR witness: (round_states (n, n_rounds*12),
    cubes_full (n, 2*half_full*12), cubes_partial (n, n_partial),
    pinv (n, 4)). None when the library is absent."""
    lib = _load()
    if not lib or params.width != 12 or params.sbox_exp != 7:
        return None
    rc, circ, diag, hf, npart = _poseidon_tables(params)
    states = np.ascontiguousarray(states, dtype=np.uint64)
    n = states.shape[0]
    n_rounds = 2 * hf + npart
    rs = np.empty((n, n_rounds * 12), dtype=np.uint64)
    cf = np.empty((n, 2 * hf * 12), dtype=np.uint64)
    cp = np.empty((n, npart), dtype=np.uint64)
    pinv = np.empty((n, 4), dtype=np.uint64)
    lib.poseidon_witness_batch(rc, circ, diag, hf, npart, states, n,
                               rs, cf, cp, pinv)
    return rs, cf, cp, pinv


def gl_vec_mul(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    lib = _load()
    a = np.ascontiguousarray(a, dtype=np.uint64)
    b = np.ascontiguousarray(b, dtype=np.uint64)
    if not lib:
        from .field import np_field
        return np_field.mul(a, b)
    out = np.empty_like(a)
    lib.gl_vec_mul(a, b, out, len(a))
    return out
