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
                    # no FMA contraction: hh_mixed_radix must round exactly
                    # like the numpy fallback (bitwise-equal contract)
                    "-ffp-contract=off",
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
    lib.hh_digitize.argtypes = [
        f64p, ctypes.c_longlong, ctypes.c_longlong, u32p, u32p]
    lib.hh_digitize.restype = ctypes.c_int
    lib.hh_mixed_radix.argtypes = [
        u32p, ctypes.c_longlong, ctypes.c_int, ctypes.c_longlong, u64p,
        ctypes.c_int, f64p, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int)]
    lib.hh_mixed_radix.restype = None
    lib.hh_encode_pre.argtypes = [
        f64p, i64p, ctypes.c_longlong, ctypes.c_longlong, f64p]
    lib.hh_encode_pre.restype = None
    lib.hh_encode_post.argtypes = [
        f64p, f64p, ctypes.c_double, ctypes.c_longlong, ctypes.c_longlong,
        u32p, u32p]
    lib.hh_encode_post.restype = ctypes.c_int
    lib.hh_decode_pre.argtypes = [
        f64p, f64p, ctypes.c_double, ctypes.c_longlong, ctypes.c_longlong,
        f64p]
    lib.hh_decode_pre.restype = None
    lib.hh_decode_post.argtypes = [
        f64p, i64p, ctypes.c_longlong, ctypes.c_longlong, ctypes.c_longlong,
        f64p]
    lib.hh_decode_post.restype = None
    return lib


def _as_f64(a: np.ndarray) -> np.ndarray:
    """Interleaved-double view of a C-contiguous complex128 array."""
    return np.ascontiguousarray(a, np.complex128).view(np.float64)


def encode_pre(data: np.ndarray, invj: np.ndarray) -> np.ndarray:
    """Slot order -> DFT bin order with odd-slot conjugation folded:
    one gather pass instead of copy + conj + fancy-index."""
    c = np.ascontiguousarray(data, np.complex128)
    half = c.shape[-1]
    rows = c.size // half
    out = np.empty(c.shape, np.complex128)
    _lib().hh_encode_pre(
        c.view(np.float64).reshape(rows, 2 * half),
        np.ascontiguousarray(invj, np.int64), rows, half,
        out.view(np.float64).reshape(rows, 2 * half),
    )
    return out


def encode_post(u: np.ndarray, tw: np.ndarray, scale: float):
    """FFT output -> (digits, neg): twist, scale, rint, and the base-2^22
    split fused into one pass (replaces 4 numpy passes + digitize)."""
    c = np.ascontiguousarray(u, np.complex128)
    half = c.shape[-1]
    rows = c.size // half
    n = 2 * half
    digits = np.empty((*c.shape[:-1], 3, n), np.uint32)
    neg = np.empty((*c.shape[:-1], n), np.uint32)
    if _lib().hh_encode_post(
        c.view(np.float64).reshape(rows, 2 * half), _as_f64(tw),
        float(scale), rows, half,
        digits.reshape(rows, 3, n), neg.reshape(rows, n),
    ):
        raise ValueError(
            "encoded coefficients exceed 2^62; lower the scaling factor"
        )
    return digits, neg


def decode_pre(coeffs: np.ndarray, tw: np.ndarray, scale: float) -> np.ndarray:
    """Real coefficients [..., n] -> twisted complex [..., n/2] ready for
    the iFFT: complex build + 1/scale + twist in one pass."""
    c = np.ascontiguousarray(coeffs, np.float64)
    n = c.shape[-1]
    half = n // 2
    rows = c.size // n
    out = np.empty((*c.shape[:-1], half), np.complex128)
    _lib().hh_decode_pre(
        c.reshape(rows, n), _as_f64(tw), float(scale), rows, half,
        out.view(np.float64).reshape(rows, 2 * half),
    )
    return out


def decode_post(vals: np.ndarray, j: np.ndarray, count: int) -> np.ndarray:
    """iFFT output -> first `count` slots (gather + odd-position conj)."""
    c = np.ascontiguousarray(vals, np.complex128)
    half = c.shape[-1]
    rows = c.size // half
    out = np.empty((*c.shape[:-1], count), np.complex128)
    _lib().hh_decode_post(
        c.view(np.float64).reshape(rows, 2 * half),
        np.ascontiguousarray(j, np.int64), rows, half, count,
        out.view(np.float64).reshape(rows, 2 * count),
    )
    return out


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


def digitize(coeffs: np.ndarray):
    """Single-pass rint + base-2^22 digit split of float64 coefficients
    [..., n]: returns (digits u32 [..., 3, n], neg u32 [..., n]). Raises on
    |rint(x)| >= 2^62, matching the numpy path (basecnv.digitize_signed)."""
    lib = _lib()
    c = np.ascontiguousarray(coeffs, np.float64)
    n = c.shape[-1]
    rows = c.size // n
    digits = np.empty((*c.shape[:-1], 3, n), np.uint32)
    neg = np.empty(c.shape, np.uint32)
    if lib.hh_digitize(c.reshape(rows, n), rows, n,
                       digits.reshape(rows, 3, n), neg.reshape(rows, n)):
        raise ValueError(
            "encoded coefficients exceed 2^62; lower the scaling factor"
        )
    return digits, neg


def mixed_radix(digits: np.ndarray, mods, split_top: bool = False):
    """Balanced-digit carry pass: Garner digits [..., K, n] -> centered
    float64 values [..., n]. split_top=True additionally returns the
    balanced top-digit row as int64 (the decode overflow sentinel) — but
    only materializes it when some sentinel digit is nonzero (None means
    'all zero', saving the array round trip in the common case)."""
    lib = _lib()
    d = np.ascontiguousarray(digits, np.uint32)
    K, n = d.shape[-2], d.shape[-1]
    rows = d.size // (K * n)
    out = np.empty((*d.shape[:-2], n), np.float64)
    mods_arr = np.asarray(list(mods), np.uint64)
    if split_top:
        top = np.empty((*d.shape[:-2], n), np.int64)
        nz = ctypes.c_int(0)
        lib.hh_mixed_radix(
            d.reshape(rows, K, n), rows, K, n, mods_arr, 1,
            out.reshape(rows, n),
            top.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ctypes.byref(nz),
        )
        return out, (top if nz.value else None)
    lib.hh_mixed_radix(
        d.reshape(rows, K, n), rows, K, n, mods_arr, 0, out.reshape(rows, n),
        None, None,
    )
    return out


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
