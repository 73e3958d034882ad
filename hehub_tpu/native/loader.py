"""ctypes loader for the C++ host runtime (csrc/hehub_native.cpp).

Builds the shared library on first use with g++ -O3 (cached next to csrc/).
Every entry point has a pure-Python fallback in utils/hostmath.py /
core/basecnv.py; `available()` gates usage.
"""

from __future__ import annotations

import ctypes
import functools
import os
import pathlib
import subprocess
import sys

import numpy as np

_ROOT = pathlib.Path(__file__).resolve().parents[2]
_SRC = _ROOT / "csrc" / "hehub_native.cpp"
_SO = _ROOT / "csrc" / "libhehub_native.so"


@functools.lru_cache(maxsize=1)
def _lib():
    try:
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            subprocess.run(
                [
                    "g++",
                    "-O3",
                    "-march=native",
                    "-shared",
                    "-fPIC",
                    "-std=c++17",
                    str(_SRC),
                    "-o",
                    str(_SO),
                ],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(str(_SO))
    except Exception as e:  # no toolchain / load failure -> fallbacks
        print(f"[hehub_tpu.native] build/load failed ({e}); using Python paths",
              file=sys.stderr)
        return None
    u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
    u64p = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.hh_is_prime_u64.argtypes = [ctypes.c_uint64]
    lib.hh_is_prime_u64.restype = ctypes.c_int
    lib.hh_decompose_i64.argtypes = [
        i64p, ctypes.c_longlong, u64p, ctypes.c_int, u32p]
    lib.hh_decompose_i64.restype = None
    lib.hh_gen_ntt_primes.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_uint64, u64p]
    lib.hh_gen_ntt_primes.restype = ctypes.c_int
    lib.hh_compose_mod.argtypes = [
        u32p, u64p, ctypes.c_int, ctypes.c_longlong, ctypes.c_uint64, u32p]
    lib.hh_compose_double.argtypes = [
        u32p, u64p, ctypes.c_int, ctypes.c_longlong, f64p]
    lib.hh_ntt_fwd.argtypes = [u32p, ctypes.c_longlong, ctypes.c_uint64, u32p]
    lib.hh_ntt_inv.argtypes = [
        u32p, ctypes.c_longlong, ctypes.c_uint64, u32p, ctypes.c_uint64]
    return lib


def available() -> bool:
    return _lib() is not None


def compose_mod(residues: np.ndarray, moduli, new_mod: int) -> np.ndarray:
    """Exact signed k->1 base conversion of strict residues [L, n] to new_mod."""
    lib = _lib()
    res = np.ascontiguousarray(residues, np.uint32)
    L, n = res.shape
    out = np.empty(n, np.uint32)
    lib.hh_compose_mod(
        res, np.asarray(moduli, np.uint64), L, n, np.uint64(new_mod), out
    )
    return out


def compose_double(residues: np.ndarray, moduli) -> np.ndarray:
    """Centered CRT-composed values as float64 [n]."""
    lib = _lib()
    res = np.ascontiguousarray(residues, np.uint32)
    L, n = res.shape
    out = np.empty(n, np.float64)
    lib.hh_compose_double(res, np.asarray(moduli, np.uint64), L, n, out)
    return out


def decompose_i64(coeffs: np.ndarray, moduli) -> np.ndarray:
    """Signed int64 coefficients [..., n] -> strict residues [..., L, n]."""
    lib = _lib()
    flat = np.ascontiguousarray(coeffs, dtype=np.int64).reshape(-1)
    mods = np.asarray(list(moduli), np.uint64)
    out = np.empty((len(mods), flat.size), np.uint32)
    lib.hh_decompose_i64(flat, flat.size, mods, len(mods), out)
    return np.moveaxis(out.reshape(len(mods), *coeffs.shape), 0, -2)


def is_prime(n: int) -> bool:
    return bool(_lib().hh_is_prime_u64(np.uint64(n)))


def ntt_fwd(data: np.ndarray, q: int, tw: np.ndarray) -> np.ndarray:
    out = np.ascontiguousarray(data, np.uint32).copy()
    _lib().hh_ntt_fwd(out, out.shape[-1], np.uint64(q), np.ascontiguousarray(tw))
    return out


def ntt_inv(data: np.ndarray, q: int, tw_inv: np.ndarray, n_inv: int) -> np.ndarray:
    out = np.ascontiguousarray(data, np.uint32).copy()
    _lib().hh_ntt_inv(
        out, out.shape[-1], np.uint64(q), np.ascontiguousarray(tw_inv),
        np.uint64(n_inv),
    )
    return out
