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
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            _lib = False
            return _lib
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.keccak256.argtypes = [ctypes.c_char_p, ctypes.c_uint64,
                                  ctypes.c_char_p]
        lib.gl_suffix_sum.argtypes = [
            np.ctypeslib.ndpointer(np.uint64, flags="C"),
            np.ctypeslib.ndpointer(np.uint64, flags="C"),
            ctypes.c_uint64]
        lib.gl_vec_mul.argtypes = lib.gl_vec_add.argtypes = [
            np.ctypeslib.ndpointer(np.uint64, flags="C"),
            np.ctypeslib.ndpointer(np.uint64, flags="C"),
            np.ctypeslib.ndpointer(np.uint64, flags="C"),
            ctypes.c_uint64]
        _lib = lib
    except Exception:
        _lib = False
    return _lib


def available() -> bool:
    return bool(_load())


def keccak256(data: bytes) -> bytes:
    lib = _load()
    if not lib:
        from .tables.keccak_sponge import keccak256 as py_keccak256
        return py_keccak256(data)
    out = ctypes.create_string_buffer(32)
    lib.keccak256(data, len(data), out)
    return out.raw


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
