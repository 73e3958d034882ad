"""Double-float (df64) arithmetic and a df64 complex FFT for the TPU.

TPU VPUs have no float64; this module represents each double as an
UNEVALUATED SUM of two float32s (hi, lo) with |lo| <= ulp(hi)/2 — the
classic double-double construction (Dekker 1971) at float32 base
precision, giving ~48 mantissa bits. All building blocks are error-free
transforms (TwoSum / Dekker split / TwoProd) built only from IEEE f32
add/mul. The TPU backend (XLA:TPU and Pallas/Mosaic) lowers these
faithfully; XLA:CPU does NOT inside broadcast-bearing fusions (it
reassociates/mis-rounds the add chains — see two_sum's caveat), which is
one of the reasons the codec is TPU-gated in hehub_tpu/config.py.
Compilers may also contract mul+add chains into FMAs, which changes
residuals at ulp level (and tightens them), so df64 results are
precision-reproducible, not bit-reproducible, across backends and
schedules.

Purpose: run the CKKS encode/decode slot FFT **on device** (the last host
stage of the pipeline — /root/reference/src/fhe/ckks/basics.cpp:156-366
does everything on the CPU). The transform sizes are n/2 <= 16384 and the
values are bounded by scale*max|z| (DFT with 1/m normalization), so ~48
bits comfortably covers the headline scales; models/ckks.py gates on the
coefficient bound and falls back to the float64 host pipeline above it.

Complex df64 values are 4-tuples (re_hi, re_lo, im_hi, im_lo) of f32
arrays. The FFT is an in-order DIT chain over a static stage unroll
(compiler-friendly: static shapes, no data-dependent control flow); the
caller folds the required bit-reversal into its input gather.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax.numpy as jnp
import numpy as np

_SPLIT = np.float32(4097.0)  # 2^12 + 1: Dekker split constant for f32


# ---------------------------------------------------------------------------
# error-free transforms (f32)
# ---------------------------------------------------------------------------


def two_sum(a, b):
    """Knuth TwoSum: a + b = s + e exactly (6 flops, branch-free).

    CAVEAT (CPU backend only): XLA:CPU's codegen for broadcast-bearing
    fusions reassociates/mis-rounds f32 add chains, so EFT identities are
    NOT faithful there when any fused operand is a (non-degenerate)
    broadcast — measured ~2^-24 relative degradation; neither
    optimization_barrier on the inputs nor --xla_cpu_enable_fast_math=
    false/--xla_allow_excess_precision=false suppresses it. The TPU
    backend (XLA:TPU and Pallas/Mosaic) honors the ops as written; the
    df64 codec is TPU-gated (hehub_tpu/config.py) for exactly this
    reason, and CPU tests of batched broadcast paths assert the f32
    floor (tests/test_df64.py::test_pallas_fft_matches_xla)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def quick_two_sum(a, b):
    """Fast TwoSum; requires |a| >= |b| (or a == 0). See two_sum's CPU
    caveat."""
    s = a + b
    e = b - (s - a)
    return s, e


def _split(a):
    """Dekker split: a = hi + lo with hi, lo each 12-bit mantissas."""
    t = _SPLIT * a
    hi = t - (t - a)
    return hi, a - hi


def two_prod(a, b):
    """a * b = p + e exactly (no FMA dependency: Dekker's algorithm)."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


# ---------------------------------------------------------------------------
# df64 scalar ops — operands/results are (hi, lo) f32 pairs
# ---------------------------------------------------------------------------


def add_dd(x: Tuple, y: Tuple) -> Tuple:
    """Accurate double-double add (QD library's ieee_add)."""
    sh, se = two_sum(x[0], y[0])
    th, te = two_sum(x[1], y[1])
    se = se + th
    sh, se = quick_two_sum(sh, se)
    se = se + te
    return quick_two_sum(sh, se)


def neg_dd(x: Tuple) -> Tuple:
    return (-x[0], -x[1])


def sub_dd(x: Tuple, y: Tuple) -> Tuple:
    return add_dd(x, neg_dd(y))


def mul_dd(x: Tuple, y: Tuple) -> Tuple:
    p, e = two_prod(x[0], y[0])
    e = e + (x[0] * y[1] + x[1] * y[0])
    return quick_two_sum(p, e)


def mul_pow2(x: Tuple, c) -> Tuple:
    """Multiply by a power of two (exact)."""
    return (x[0] * c, x[1] * c)


# ---------------------------------------------------------------------------
# complex df64 — 4-tuples (re_hi, re_lo, im_hi, im_lo)
# ---------------------------------------------------------------------------


def cadd(x, y):
    r = add_dd((x[0], x[1]), (y[0], y[1]))
    i = add_dd((x[2], x[3]), (y[2], y[3]))
    return (*r, *i)


def csub(x, y):
    r = sub_dd((x[0], x[1]), (y[0], y[1]))
    i = sub_dd((x[2], x[3]), (y[2], y[3]))
    return (*r, *i)


def cmul(x, y):
    xr, xi = (x[0], x[1]), (x[2], x[3])
    yr, yi = (y[0], y[1]), (y[2], y[3])
    r = sub_dd(mul_dd(xr, yr), mul_dd(xi, yi))
    i = add_dd(mul_dd(xr, yi), mul_dd(xi, yr))
    return (*r, *i)


def conj4(x):
    return (x[0], x[1], -x[2], -x[3])


# ---------------------------------------------------------------------------
# host <-> df64 conversions
# ---------------------------------------------------------------------------


def from_f64(a: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Split float64 host values into an exact (hi, lo) f32 pair
    (exact whenever |a| < 2^127 and a has <= 48 significant bits;
    otherwise correctly rounded to the df64 format)."""
    hi = np.asarray(a, np.float64).astype(np.float32)
    lo = (np.asarray(a, np.float64) - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


def to_f64(hi, lo) -> np.ndarray:
    return np.asarray(hi, np.float64) + np.asarray(lo, np.float64)


def cfrom_c128(a: np.ndarray):
    """complex128 -> 4 f32 planes (re_hi, re_lo, im_hi, im_lo)."""
    rh, rl = from_f64(a.real)
    ih, il = from_f64(a.imag)
    return rh, rl, ih, il


def cto_c128(rh, rl, ih, il) -> np.ndarray:
    return to_f64(rh, rl) + 1j * to_f64(ih, il)


def from_int32(a):
    """Exact df64 of int32 values (|a| < 2^31): hi = f32 rounding, lo = the
    exact remainder (an integer < 2^8, exactly representable)."""
    hi = a.astype(jnp.float32)
    lo = (a - hi.astype(jnp.int32)).astype(jnp.float32)
    return hi, lo


def balanced_digits(vh, vl):
    """Round a df64 value to the nearest integer and emit three BALANCED
    base-2^22 digit planes (int32, |d_i| < 2^22):
    round(v) = d0 + d1*2^22 + d2*2^44. Requires |v| < 2^45 (the caller's
    encode gate). Digits are consumed by basecnv.decompose_balanced.

    Top-down extraction: each d_i is the f32 rounding of the remainder's
    leading part; the subtractions d_i * 2^{22 i} are exact in f32 (small
    integer times power of two) so the running remainder stays an exact
    df64 of v - (digits so far). The final rounding can differ from the
    true nearest integer by 1 ulp near .5 boundaries — absorbed by the
    encoding's inherent rounding noise."""
    d2 = jnp.round(vh * jnp.float32(2.0**-44))
    z = jnp.float32(0.0)
    rh, rl = add_dd((vh, vl), (d2 * jnp.float32(-(2.0**44)), z))
    d1 = jnp.round(rh * jnp.float32(2.0**-22))
    rh, rl = add_dd((rh, rl), (d1 * jnp.float32(-(2.0**22)), z))
    d0 = jnp.round(rh + rl)
    return (
        d0.astype(jnp.int32), d1.astype(jnp.int32), d2.astype(jnp.int32)
    )


# ---------------------------------------------------------------------------
# FFT
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def bitrev_perm(m: int) -> np.ndarray:
    """Bit-reversal permutation of [0, m)."""
    logm = m.bit_length() - 1
    idx = np.arange(m)
    out = np.zeros(m, np.int64)
    for _ in range(logm):
        out = (out << 1) | (idx & 1)
        idx >>= 1
    return out


@functools.lru_cache(maxsize=None)
def fft_tables(m: int):
    """Per-stage df64 twiddles for the forward DFT (e^{-2πi jk/m}).
    Stage s (spans t = 2^s) uses w_j = e^{-iπ j / t}, j < t."""
    logm = m.bit_length() - 1
    tables = []
    for s in range(logm):
        t = 1 << s
        w = np.exp(-1j * np.pi * np.arange(t) / t)
        tables.append(cfrom_c128(w))
    return tuple(tables)


def fft(x4, m: int):
    """In-order DIT FFT over the last axis: input must be pre-permuted to
    bit-reversed order (callers fold `bitrev_perm` into their input
    gather); output is the natural-order forward DFT. x4: complex df64
    4-tuple of [..., m] f32 arrays.

    On TPU this dispatches to the fused Pallas kernel
    (ops/pallas/fft_pallas.py, bitwise-equal); the XLA stage chain below
    is the portable fallback."""
    from hehub_tpu import config as _cfg

    if m >= 256 and _cfg.pallas_enabled():
        from hehub_tpu.ops.pallas import fft_pallas

        return fft_pallas.fft(x4, m)
    return fft_xla(x4, m)


def fft_xla(x4, m: int):
    """The unfused XLA stage-chain FFT (see `fft`)."""
    tables = fft_tables(m)
    logm = m.bit_length() - 1
    for s in range(logm):
        t = 1 << s
        blocks = m >> (s + 1)
        wr, wl, wi, wil = (jnp.asarray(p) for p in tables[s])
        a = []
        b = []
        for p in x4:
            v = p.reshape(*p.shape[:-1], blocks, 2, t)
            a.append(v[..., 0, :])
            b.append(v[..., 1, :])
        bw = cmul(tuple(b), (wr, wl, wi, wil))
        lo = cadd(tuple(a), bw)
        hi = csub(tuple(a), bw)
        x4 = tuple(
            jnp.stack([l, h], axis=-2).reshape(*l.shape[:-2], m)
            for l, h in zip(lo, hi)
        )
    return x4
