"""CKKS: approximate-complex SIMD homomorphic encryption
(≙ /root/reference/src/fhe/ckks/ckks.h:40-313, basics.cpp, arith.cpp,
rescaling.cpp), TPU-native.

Encoding: the host does ONLY the float64 twisted FFT (exact slot placement
in Galois-exponent order so SIMD slots align with rotation keys,
≙ basics.cpp:156-258) plus an exact base-2^22 digit split of the rounded
coefficients; the O(L·n) residue decomposition runs on device where it fuses
into the encrypt NTT. Decoding mirrors it: a device Garner mixed-radix
conversion over the magnitude-bound limb prefix, a small D2H of the digits,
and a float64 evaluation + slot FFT on the host. Both paths are batched and
handle arbitrary coefficient magnitudes (|c| < 2^62) — the reference's
UBInt big-coefficient paths (basics.cpp:226-254, 274-356) without bignums
and without leaving the device for the per-limb work.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hehub_tpu.core import basecnv, galois, rns
from hehub_tpu.native import loader
from hehub_tpu.core.context import CkksParams, Context, make_context
from hehub_tpu.core.rns import COEFF, NTT, RnsPoly
from hehub_tpu.ops import modarith as ma
from hehub_tpu.rlwe import keys as keys_mod
from hehub_tpu.rlwe import rgsw as rgsw_mod
from hehub_tpu.rlwe import rlwe as rlwe_mod

SCALE_EPS = 2.0**-40


class CkksPt(NamedTuple):
    poly: RnsPoly
    scaling_factor: float


class CkksCt(NamedTuple):
    c0: RnsPoly
    c1: RnsPoly
    scaling_factor: float

    @property
    def limb_ids(self):
        return self.c0.limb_ids

    @property
    def level(self):
        return self.c0.limb_count


class CkksQuadCt(NamedTuple):
    """3-component ciphertext before relinearization (≙ CkksQuadraticCt,
    ckks.h:88-95)."""

    c0: RnsPoly
    c1: RnsPoly
    c2: RnsPoly
    scaling_factor: float


def _check_scale(a, b):
    if abs(a.scaling_factor - b.scaling_factor) > SCALE_EPS * max(
        a.scaling_factor, 1.0
    ):
        raise ValueError(
            f"scaling factors mismatch: {a.scaling_factor} vs {b.scaling_factor}"
        )


# ---------------------------------------------------------------------------
# Encoding (host, float64-exact)  ≙ simd_encode_cc / simd_decode_cc
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _slot_positions(n: int) -> np.ndarray:
    """Position of slot i in the odd-exponent evaluation vector: slot i lives
    at exponent 3^i mod 2n (Galois generator order), position (e-1)/2."""
    slots = n // 2
    e = 1
    pos = np.empty(slots, dtype=np.int64)
    for i in range(slots):
        pos[i] = (e - 1) // 2
        e = e * 3 % (2 * n)
    return pos


@functools.lru_cache(maxsize=None)
def _twist(n: int) -> np.ndarray:
    return np.exp(1j * np.pi * np.arange(n) / n)


try:  # scipy's pocketfft is ~1.5x numpy's on these shapes, and its
    # workers= threads across batched rows (bootstrap plans encode many
    # diagonals in one call; single transforms are unaffected)
    from scipy.fft import fft as _sfft, ifft as _sifft

    def _fft(a, axis=-1):
        return _sfft(a, axis=axis, workers=-1)

    def _ifft(a, axis=-1):
        return _sifft(a, axis=axis, workers=-1)

except ImportError:  # pragma: no cover
    _fft, _ifft = np.fft.fft, np.fft.ifft


@functools.lru_cache(maxsize=None)
def _half_transform_tables(n: int):
    """Tables for the HALF-SIZE encode/decode transform.

    In R[X]/(X^n+1), X^{n/2} is a square root of −1, so p = A + B·X^{n/2}
    with real A,B of length n/2 is ONE complex vector u = a + i·b. Slot i
    evaluates p at ζ^{3^i}; conjugating the odd slots moves every
    evaluation point to an exponent ≡ 1 (mod 4) — the points become
    exactly the roots of X^{n/2} = i, i.e. ζ·ω^j with ω the primitive
    (n/2)-th root, visited in the order j_i = ((−3)^i mod 2n − 1)/4. The
    whole encode is therefore ONE n/2-point FFT (plus a permutation and a
    twist), not the textbook n-point transform — half the host flops of
    even the conjugate-pair folding, with decode exactly symmetric.

    Returns (invj, j, tw_enc, tw_dec): invj scatters slot order -> DFT bin
    order (vals = y[invj]), j gathers it back; tw_enc = ζ^{-k}/(n/2) folds
    the twist and the fft normalization for encode, tw_dec = (n/2)·ζ^{k}
    the inverse pair for decode."""
    half = n // 2
    j = np.empty(half, np.int64)
    t = 1
    for i in range(half):
        j[i] = (t - 1) // 4
        t = t * (2 * n - 3) % (2 * n)
    invj = np.empty(half, np.int64)
    invj[j] = np.arange(half)
    tw_enc = np.exp(-1j * np.pi * np.arange(half) / n) / half
    tw_dec = half * np.exp(1j * np.pi * np.arange(half) / n)
    return invj, j, tw_enc, tw_dec


def _coeffs_from_slots(data: np.ndarray, n: int) -> np.ndarray:
    """Complex slot values [..., k] -> real negacyclic coefficients
    [..., n] (float64). Batched over leading dims (vectorized FFT).
    One n/2-point FFT via the X^{n/2} = √−1 identity
    (_half_transform_tables)."""
    half = n // 2
    if data.shape[-1] < half:
        padded = np.zeros((*data.shape[:-1], half), dtype=np.complex128)
        padded[..., : data.shape[-1]] = data
        data = padded
    invj, _, tw_enc, _ = _half_transform_tables(n)
    y = data.copy()
    np.conjugate(y[..., 1::2], out=y[..., 1::2])
    u = _fft(y[..., invj], axis=-1) * tw_enc
    return np.concatenate([u.real, u.imag], axis=-1)


def _slots_to_read(coeffs: np.ndarray, n: int, count: int) -> np.ndarray:
    """Real negacyclic coefficients [..., n] -> first `count` complex
    slots: the exact inverse of _coeffs_from_slots (one n/2-point iFFT)."""
    half = n // 2
    _, j, _, tw_dec = _half_transform_tables(n)
    u = coeffs[..., :half] + 1j * coeffs[..., half:]
    vals = _ifft(u * tw_dec, axis=-1)
    y = vals[..., j[:count]]
    np.conjugate(y[..., 1::2], out=y[..., 1::2])
    return y


def _digitize(coeffs: np.ndarray):
    """Exact base-2^22 digit split of integer-valued float64 coefficients
    (rint and the float64->int64 conversion are exact for |c| < 2^62).
    Returns (digits uint32 [..., 3, n], neg uint32 [..., n]).

    Uses the single-pass C++ kernel when the native runtime is built
    (~5x the multi-pass numpy chain at n=16384); both paths are exact and
    bitwise identical (llrint under round-to-nearest-even == np.rint)."""
    if loader.available():
        return loader.digitize(np.ascontiguousarray(coeffs))
    x = np.rint(coeffs)
    if np.abs(x).max(initial=0.0) >= float(1 << 62):
        raise ValueError(
            "encoded coefficients exceed 2^62; lower the scaling factor"
        )
    return basecnv.digitize_signed(x.astype(np.int64))


def _encode_host(data: np.ndarray, n: int, scale: float):
    """Host half of encode: slot FFT + twist + scale + digit split ->
    (digits, neg). With the native runtime, everything around the FFT is
    two fused C++ passes (gather+conj in; twist+rint+split out); the numpy
    fallback is the equivalent multi-pass chain."""
    half = n // 2
    if data.shape[-1] < half:
        padded = np.zeros((*data.shape[:-1], half), dtype=np.complex128)
        padded[..., : data.shape[-1]] = data
        data = padded
    if loader.available():
        invj, _, tw_enc, _ = _half_transform_tables(n)
        u = _fft(loader.encode_pre(data, invj), axis=-1)
        return loader.encode_post(u, tw_enc, scale)
    return _digitize(_coeffs_from_slots(data, n) * scale)


def _decode_host(coeffs: np.ndarray, n: int, scale: float, count: int):
    """Host half of decode: 1/scale + twist + slot iFFT -> complex slots
    (the exact inverse of _encode_host's transform)."""
    if loader.available():
        _, j, _, tw_dec = _half_transform_tables(n)
        vals = _ifft(loader.decode_pre(coeffs, tw_dec, scale), axis=-1)
        return loader.decode_post(vals, j, count)
    return _slots_to_read(coeffs / scale, n, count)


# device residue decomposition of digitized coefficients (shared core op)
decompose_digits = basecnv.decompose_digits


# ---------------------------------------------------------------------------
# df64 ON-DEVICE encode/decode (ops/df64.py) — the host pipeline above is
# the float64 fallback for out-of-range magnitudes / non-TPU backends
# ---------------------------------------------------------------------------

# precision gate: the df64 FFT carries ~48 mantissa bits, and the encode
# digit extraction needs |coeff| = scale*max|z| to round consistently, so
# coefficients are capped at 2^43 (headline scales pass; 2^48+ scales take
# the host path). Decode is relative-error only; its gate is the f32
# overflow bound of the Garner weights (K <= 3 limbs, ∏q <= 2^90).
_DF64_COEFF_BOUND = 2.0**43


def _trace_clean() -> bool:
    """True when NOT under an active JAX trace. The df64 fast paths build
    jitted closures whose table constants (`jnp.asarray(...)`) would be
    lifted into the ambient trace and lru-cached — leaking tracers into
    later traces (seen as UnexpectedTracerError in the r4-era bootstrap
    plan encodes). Circuits that encode plan constants while tracing get
    the pure-host pipeline instead."""
    try:
        from jax._src import core as _jcore

        return bool(_jcore.trace_state_clean())
    except Exception:
        return True


@functools.lru_cache(maxsize=None)
def _df64_enc_tables(n: int):
    from hehub_tpu.ops import df64

    half = n // 2
    invj, _, tw_enc, _ = _half_transform_tables(n)
    perm = invj[df64.bitrev_perm(half)]  # slot order -> DIT input order
    sign = np.where(perm % 2 == 1, -1.0, 1.0).astype(np.float32)
    return perm, sign, df64.cfrom_c128(tw_enc)


@functools.lru_cache(maxsize=None)
def _df64_dec_tables(n: int, count: int):
    from hehub_tpu.ops import df64

    half = n // 2
    _, j, _, tw_dec = _half_transform_tables(n)
    br = df64.bitrev_perm(half)
    # ifft(x) = conj(fft(conj(x)))/m: fold conj + 1/m into the twist table,
    # pre-permuted to the FFT's bit-reversed input order
    t_br = df64.cfrom_c128(np.conjugate(tw_dec)[br] / half)
    out_g = j[:count]
    # output = conj(fft result) with odd slots re-conjugated: the imag part
    # flips sign at even slot indices only
    odd_sign = np.where(np.arange(count) % 2 == 1, 1.0, -1.0).astype(
        np.float32
    )
    return br, t_br, out_g, odd_sign


@functools.lru_cache(maxsize=None)
def _encode_device_jit(ctx: Context, ids: Tuple[int, ...]):
    """slots (4 f32 planes, [..., n/2]) + df64 scale -> residue data
    [..., L, n]: gather/conj, df64 FFT, twist*scale, balanced digit
    extraction, residue decomposition — ONE fused device program replacing
    the host FFT+digitize of _encode_host."""
    from hehub_tpu.ops import df64

    n = ctx.params.dimension
    half = n // 2
    perm, sign, tw = _df64_enc_tables(n)
    perm_j = jnp.asarray(perm)
    sign_j = jnp.asarray(sign)
    tw_j = tuple(jnp.asarray(t) for t in tw)

    def f(s4, scale_hi, scale_lo):
        x4 = tuple(p[..., perm_j] for p in s4)
        x4 = (x4[0], x4[1], x4[2] * sign_j, x4[3] * sign_j)
        u = df64.fft(x4, half)
        u = df64.cmul(u, tw_j)
        sc = (scale_hi, scale_lo)
        re = df64.mul_dd((u[0], u[1]), sc)
        im = df64.mul_dd((u[2], u[3]), sc)
        vh = jnp.concatenate([re[0], im[0]], axis=-1)
        vl = jnp.concatenate([re[1], im[1]], axis=-1)
        d0, d1, d2 = df64.balanced_digits(vh, vl)
        digits = jnp.stack([d0, d1, d2], axis=-2)
        return basecnv.decompose_balanced(ctx, digits, ids).data

    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def _decode_device_jit(
    ctx: Context, ids: Tuple[int, ...], k: int, count: int, probe: bool
):
    """Residue data -> (4 f32 slot planes [..., count], overflow flag):
    device Garner digits, balanced carry pass, df64 value eval, inverse
    FFT, slot gather — the device mirror of decode's host half. With
    probe=True the k-th digit row is the overflow sentinel (decode
    re-runs on the host over the full chain if it fires)."""
    from hehub_tpu.ops import df64

    n = ctx.params.dimension
    half = n // 2
    br, t_br, out_g, odd_sign = _df64_dec_tables(n, count)
    br_j = jnp.asarray(br)
    t_br_j = tuple(jnp.asarray(t) for t in t_br)
    out_j = jnp.asarray(out_g)
    odd_j = jnp.asarray(odd_sign)
    mods = [int(m) for m in ctx.moduli_of(ids)]
    kp = k + 1 if probe else k
    ws = []
    w = 1
    for jx in range(k):
        ws.append(tuple(jnp.asarray(p) for p in df64.from_f64(float(w))))
        w *= mods[jx]

    def f(data, inv_scale_hi, inv_scale_lo):
        digs = basecnv.to_mixed_radix(ctx, data, ids, kp)
        d = digs.astype(jnp.int32)
        carry = jnp.zeros_like(d[..., 0, :])
        vh = jnp.zeros(d.shape[:-2] + d.shape[-1:], jnp.float32)
        vl = jnp.zeros_like(vh)
        top = None
        for jx in range(kp):
            q = mods[jx]
            dj = d[..., jx, :] + carry
            c = (dj > q // 2).astype(jnp.int32)
            bal = dj - c * q
            carry = c
            if jx == k:
                top = bal
            else:
                term = df64.mul_dd(df64.from_int32(bal), ws[jx])
                vh, vl = df64.add_dd((vh, vl), term)
        sc = (inv_scale_hi, inv_scale_lo)
        ur = df64.mul_dd((vh[..., :half], vl[..., :half]), sc)
        ui = df64.mul_dd((vh[..., half:], vl[..., half:]), sc)
        u4 = (
            ur[0][..., br_j], ur[1][..., br_j],
            -ui[0][..., br_j], -ui[1][..., br_j],
        )
        v = df64.fft(df64.cmul(u4, t_br_j), half)
        rh, rl = v[0][..., out_j], v[1][..., out_j]
        ih, il = v[2][..., out_j] * odd_j, v[3][..., out_j] * odd_j
        flag = (
            jnp.any(top != 0) if top is not None
            else jnp.zeros((), jnp.bool_)
        )
        return rh, rl, ih, il, flag

    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def _decompose_jit(ctx: Context, ids: Tuple[int, ...]):
    return jax.jit(lambda d, s: decompose_digits(ctx, d, s, ids).data)


def encode(
    data, params: CkksParams, scaling_factor: Optional[float] = None, level: int = 0
) -> CkksPt:
    """SIMD-encode up to n/2 complex numbers (≙ ckks::simd_encode,
    basics.cpp:156-272). `level`=0 means all limbs; level=k drops the last k.

    `data` may carry leading batch dims ([..., slots]): the FFT, the digit
    split, and the device decomposition all vectorize, yielding a batched
    plaintext [..., L, n]. Arbitrary coefficient magnitudes (< 2^62) are
    supported — scaling factors up to ~2^55 with slot values up to ~2^10."""
    from hehub_tpu import config as _cfg

    ctx = make_context(params)
    n = params.dimension
    scale = scaling_factor or params.initial_scaling_factor
    data = np.atleast_1d(np.asarray(data, dtype=np.complex128))
    if data.shape[-1] > n // 2:
        raise ValueError(f"can encode at most {n//2} slots")
    ids = tuple(range(len(params.moduli) - level))
    max_abs = float(np.abs(data).max(initial=0.0))
    batch = int(np.prod(data.shape[:-1], dtype=np.int64))
    if (
        _cfg.df64_encode_selected(batch)
        and scale * max(max_abs, 1.0) <= _DF64_COEFF_BOUND
        and _trace_clean()
    ):
        from hehub_tpu.ops import df64

        half = n // 2
        if data.shape[-1] < half:
            padded = np.zeros((*data.shape[:-1], half), np.complex128)
            padded[..., : data.shape[-1]] = data
            data = padded
        s4 = df64.cfrom_c128(data)
        sh, sl = df64.from_f64(float(scale))
        resid = _encode_device_jit(ctx, ids)(s4, sh, sl)
        return CkksPt(RnsPoly(resid, COEFF, ids), float(scale))
    digits, neg = _encode_host(data, n, scale)
    resid = _decompose_jit(ctx, ids)(digits, neg)
    return CkksPt(RnsPoly(resid, COEFF, ids), float(scale))


def encode_scalar(
    value, params: CkksParams, scaling_factor: Optional[float] = None,
    level: int = 0,
) -> CkksPt:
    """Encode ONE number replicated into every slot (≙ ckks::encode(double),
    ckks.h:123-144: the reference's scalar sugar). Use with decode_scalar,
    which averages the slots back — slot-noise averages down by √(n/2)."""
    n = params.dimension
    return encode(np.full(n // 2, complex(value)), params, scaling_factor,
                  level)


def decode_scalar(
    pt: CkksPt, params: CkksParams, limbs: Optional[int] = None,
) -> complex:
    """Average all slots back to one number (≙ ckks::decode<T>,
    ckks.h:167-170): the inverse of encode_scalar."""
    return complex(np.mean(decode(pt, params, limbs=limbs), axis=-1))


def decode_limb_count(
    scale: float,
    limbs: Tuple[int, ...],
    moduli,
    max_magnitude: float = 2.0**8,
) -> int:
    """Smallest K with ∏_{j<K} q_j comfortably above the coefficient
    magnitude: 2·scale·max|z|·noise-slack (slack 2^12).

    Contract: correct only when every decoded slot satisfies
    |z| ≤ `max_magnitude` (default 2^8). `decode` verifies the bound at
    runtime via a sentinel limb and transparently re-decodes over the full
    chain on overflow, so callers of `decode` need not pre-know |z|; pass a
    larger `max_magnitude` here only to avoid that second pass."""
    import math

    need = math.log2(max(scale, 1.0)) + math.log2(max(max_magnitude, 1.0)) \
        + 13.0
    acc = 0.0
    for k, q in enumerate(moduli):
        acc += math.log2(q)
        if acc >= need:
            return k + 1
    return len(moduli)


@functools.lru_cache(maxsize=None)
def _garner_jit(ctx: Context, ids: Tuple[int, ...], k: int):
    return jax.jit(lambda d: basecnv.to_mixed_radix(ctx, d, ids, k))


def decode(
    pt: CkksPt,
    params: CkksParams,
    count: Optional[int] = None,
    limbs: Optional[int] = None,
) -> np.ndarray:
    """(≙ ckks::simd_decode, basics.cpp:274-366), batched, any magnitude.

    Device: Garner mixed-radix digits over the first K limbs (K bound by the
    scaling factor, or `limbs`). Host: balanced-digit carry pass + float64
    evaluation + slot FFT. Exact to float64 precision for any coefficient
    with |c| < (∏_{j<K} q_j)/2 — except on the df64 fast path (batched
    decodes with scale ≤ 2^43 on TPU, config.df64_decode_selected), whose
    on-device double-float32 FFT carries ~48-bit relative precision."""
    ctx = make_context(params)
    n = params.dimension
    count = count or n // 2
    poly = pt.poly
    if poly.form != COEFF:
        raise ValueError("decode expects coeff form")
    mods = ctx.moduli_of(poly.limb_ids)
    K = limbs or decode_limb_count(pt.scaling_factor, poly.limb_ids, mods)
    K = min(K, len(mods))
    # one extra limb as an overflow sentinel: a value that fits in K limbs
    # has balanced digit K exactly zero; a nonzero sentinel means the
    # magnitude heuristic underestimated |z| and the K-limb value would
    # silently alias mod ∏q (ADVICE r2) — re-decode over the full chain.
    probe = limbs is None and K < len(mods)
    from hehub_tpu import config as _cfg

    # df64 device path: K <= 3 keeps the Garner weights inside the f32
    # product range (∏q <= 2^90; the Dekker split's 4097x stays < 2^127).
    # Precision: the df64 pipeline carries ~48 mantissa bits (relative), so
    # — mirroring encode's gate — it only engages when the scaling factor is
    # within the coefficient bound; high-precision 2^48+ scales take the
    # exact float64 host path below.
    batch = int(np.prod(poly.data.shape[:-2], dtype=np.int64))
    if (
        _cfg.df64_decode_selected(batch)
        and K <= 3
        and pt.scaling_factor <= _DF64_COEFF_BOUND
        and _trace_clean()
    ):
        from hehub_tpu.ops import df64

        ih_, il_ = df64.from_f64(1.0 / pt.scaling_factor)
        out = _decode_device_jit(ctx, poly.limb_ids, K, count, probe)(
            poly.data, ih_, il_
        )
        rh, rl, ih, il, flag = (np.asarray(x) for x in out)
        if not (probe and bool(flag)):
            return df64.cto_c128(rh, rl, ih, il)
        # sentinel fired: fall through to the host full-chain decode
        digits = np.asarray(
            _garner_jit(ctx, poly.limb_ids, len(mods))(poly.data)
        )
        coeffs = _mixed_radix_to_float(digits, mods)
        return _decode_host(coeffs, n, pt.scaling_factor, count)
    if probe:
        digits = np.asarray(_garner_jit(ctx, poly.limb_ids, K + 1)(poly.data))
        coeffs, top = _mixed_radix_to_float(digits, mods[: K + 1],
                                            split_top=True)
        if top is not None and np.any(top):
            digits = np.asarray(
                _garner_jit(ctx, poly.limb_ids, len(mods))(poly.data)
            )
            coeffs = _mixed_radix_to_float(digits, mods)
    else:
        digits = np.asarray(_garner_jit(ctx, poly.limb_ids, K)(poly.data))
        coeffs = _mixed_radix_to_float(digits, mods[:K])
    return _decode_host(coeffs, n, pt.scaling_factor, count)


def _mixed_radix_to_float(digits: np.ndarray, mods, split_top: bool = False):
    """Centered float64 value of Garner digits [..., K, n]: a balanced-digit
    carry pass (so small |x| keeps high digits exactly zero — no float64
    cancellation), then Σ ŷ_j·∏_{m<j} q_m.

    split_top=True: the last digit row is treated as an overflow sentinel —
    it is excluded from the value and the pair (value, balanced top digits)
    is returned (top all-zero — or None from the C++ path — iff the value
    fits in the first K−1 limbs). The single-pass C++ kernel is used when
    built; results are bitwise identical to this numpy fallback."""
    if loader.available():
        return loader.mixed_radix(digits, mods, split_top)
    K = digits.shape[-2]
    d = digits.astype(np.int64)
    carry = np.zeros(d.shape[:-2] + d.shape[-1:], np.int64)
    out = np.zeros(d.shape[:-2] + d.shape[-1:], np.float64)
    top = None
    weight = 1.0
    for j in range(K):
        q = int(mods[j])
        dj = d[..., j, :] + carry
        carry = (dj > q // 2).astype(np.int64)
        bal = dj - carry * q
        if split_top and j == K - 1:
            top = bal
        else:
            out += bal.astype(np.float64) * weight
            weight *= float(q)
    # a final carry out of the top digit is the mod-∏q wrap: drop it
    return (out, top) if split_top else out


# ---------------------------------------------------------------------------
# Encrypt / decrypt
# ---------------------------------------------------------------------------


def encrypt(ctx: Context, pt: CkksPt, sk: rlwe_mod.RlweSk, key, **dbg) -> CkksCt:
    """(≙ ckks::encrypt, ckks.h:180-184 -> encrypt_core)."""
    ct = rlwe_mod.encrypt_core(ctx, pt.poly, sk, key, **dbg)
    return CkksCt(ct.c0, ct.c1, pt.scaling_factor)


def decrypt(ctx: Context, ct: CkksCt, sk: rlwe_mod.RlweSk) -> CkksPt:
    pt = rlwe_mod.decrypt_core(ctx, rlwe_mod.RlweCt(ct.c0, ct.c1), sk)
    return CkksPt(pt, ct.scaling_factor)


# ---------------------------------------------------------------------------
# Homomorphic arithmetic (≙ ckks/arith.cpp)
# ---------------------------------------------------------------------------


def add(ctx, ct1: CkksCt, ct2: CkksCt) -> CkksCt:
    _check_scale(ct1, ct2)
    return CkksCt(
        rns.add(ctx, ct1.c0, ct2.c0), rns.add(ctx, ct1.c1, ct2.c1), ct1.scaling_factor
    )


def sub(ctx, ct1: CkksCt, ct2: CkksCt) -> CkksCt:
    _check_scale(ct1, ct2)
    return CkksCt(
        rns.sub(ctx, ct1.c0, ct2.c0), rns.sub(ctx, ct1.c1, ct2.c1), ct1.scaling_factor
    )


def _pt_ntt(ctx, pt: CkksPt) -> RnsPoly:
    return rns.to_ntt(ctx, pt.poly) if pt.poly.form == COEFF else pt.poly


def add_plain(ctx, ct: CkksCt, pt: CkksPt) -> CkksCt:
    _check_scale(ct, pt)
    out = rlwe_mod.add_plain_core(ctx, rlwe_mod.RlweCt(ct.c0, ct.c1), _pt_ntt(ctx, pt))
    return CkksCt(out.c0, out.c1, ct.scaling_factor)


def sub_plain(ctx, ct: CkksCt, pt: CkksPt) -> CkksCt:
    _check_scale(ct, pt)
    out = rlwe_mod.sub_plain_core(ctx, rlwe_mod.RlweCt(ct.c0, ct.c1), _pt_ntt(ctx, pt))
    return CkksCt(out.c0, out.c1, ct.scaling_factor)


def mult_plain(ctx, ct: CkksCt, pt: CkksPt) -> CkksCt:
    out = rlwe_mod.mult_plain_core(
        ctx, rlwe_mod.RlweCt(ct.c0, ct.c1), _pt_ntt(ctx, pt)
    )
    return CkksCt(out.c0, out.c1, ct.scaling_factor * pt.scaling_factor)


def mult_low_level(ctx, ct1: CkksCt, ct2: CkksCt) -> CkksQuadCt:
    """Tensor product to 3 components (≙ arith.cpp:55-62). ct2 is pre-scaled
    to the Montgomery domain once, then the 4 cross products are single
    mont_muls."""
    ids = ct1.limb_ids
    q = ctx.rows("q", ids)
    two_q = ctx.rows("two_q", ids)
    neg_qinv = ctx.rows("neg_qinv", ids)
    r, r_sh = ctx.rows("r_mod_q", ids), ctx.rows("r_shoup", ids)
    b0 = ma.shoup_mul_lazy(ct2.c0.data, r, r_sh, q)
    b1 = ma.shoup_mul_lazy(ct2.c1.data, r, r_sh, q)
    a0, a1 = ct1.c0.data, ct1.c1.data
    p0 = ma.mont_mul_lazy(a0, b0, q, neg_qinv)
    p1 = ma.add_lazy(
        ma.mont_mul_lazy(a0, b1, q, neg_qinv),
        ma.mont_mul_lazy(a1, b0, q, neg_qinv),
        two_q,
    )
    p2 = ma.mont_mul_lazy(a1, b1, q, neg_qinv)
    mk = lambda d: RnsPoly(d, NTT, ids)
    return CkksQuadCt(
        mk(p0), mk(p1), mk(p2), ct1.scaling_factor * ct2.scaling_factor
    )


def relinearize(ctx, quad: CkksQuadCt, rlk: rgsw_mod.RgswCt) -> CkksCt:
    """ext_prod on c2 + special-prime rescale + add (≙ arith.cpp:64-73).
    With multiple special primes the P-division iterates over them."""
    level = quad.c2.limb_count
    rlk_l = rlk.at_level(level, ctx.num_special)
    d0, d1 = rgsw_mod.ext_prod(ctx, quad.c2, rlk_l)
    for _ in range(ctx.num_special):
        d0, d1 = basecnv.div_last_rounded_pair(ctx, d0, d1)
    return CkksCt(
        rns.add(ctx, d0, quad.c0), rns.add(ctx, d1, quad.c1), quad.scaling_factor
    )


def mult(ctx, ct1: CkksCt, ct2: CkksCt, rlk: rgsw_mod.RgswCt) -> CkksCt:
    """(≙ ckks::mult, ckks.h:270-274 — the north-star op)."""
    return relinearize(ctx, mult_low_level(ctx, ct1, ct2), rlk)


def rescale(ctx, ct: CkksCt, dropping_primes: int = 1) -> CkksCt:
    """Drop trailing ciphertext primes with exact rounding, dividing the
    scaling factor (≙ rescale_inplace, rescaling.cpp:14-91; multi-prime drop
    implemented by iteration — the reference leaves it "under development")."""
    c0, c1, scale = ct.c0, ct.c1, ct.scaling_factor
    for _ in range(dropping_primes):
        q_last = ctx.mod_list[c0.limb_ids[-1]]
        c0, c1 = basecnv.div_last_rounded_pair(ctx, c0, c1)
        scale /= q_last
    return CkksCt(c0, c1, scale)


def rescale_auto(ctx, ct: CkksCt, min_scale: Optional[float] = None) -> CkksCt:
    """Drop as many trailing primes as the scaling factor warrants, keeping
    it >= `min_scale` (default: the params' initial scaling factor).

    With 30-bit limbs a large scale (e.g. 2^48) is not a product of limb
    moduli, so the scale drifts within [min_scale, min_scale·q) — the
    flexible-scale discipline; adds still engineer exact equality through
    compensating plaintext scales."""
    if min_scale is None:
        min_scale = ctx.params.initial_scaling_factor
    scale = ct.scaling_factor
    drops = 0
    level = ct.c0.limb_count
    while drops < level - 1:
        q_last = ctx.mod_list[ct.c0.limb_ids[level - 1 - drops]]
        if scale / q_last < min_scale:
            break
        scale /= q_last
        drops += 1
    return rescale(ctx, ct, drops) if drops else ct


def rescale_to(ctx, ct: CkksCt, target: float) -> CkksCt:
    """Drop however many trailing primes brings the scaling factor CLOSEST
    to `target` in log distance (unlike rescale_auto's floor semantics,
    which can stall a full limb high — fatal downstream when a plaintext
    scale is computed as target/scale and ends up tiny)."""
    import math

    level = ct.c0.limb_count
    s = ct.scaling_factor
    best_k, best_d = 0, abs(math.log2(s / target))
    cur = s
    for k in range(1, level):
        cur /= ctx.mod_list[ct.c0.limb_ids[level - k]]
        d = abs(math.log2(cur / target))
        if d < best_d:
            best_k, best_d = k, d
        elif cur < target:
            break
    return rescale(ctx, ct, best_k) if best_k else ct


def mod_drop(ctx, ct: CkksCt, count: int = 1) -> CkksCt:
    """Drop limbs WITHOUT dividing (level alignment helper)."""
    return CkksCt(
        RnsPoly(ct.c0.data[..., :-count, :], ct.c0.form, ct.c0.limb_ids[:-count]),
        RnsPoly(ct.c1.data[..., :-count, :], ct.c1.form, ct.c1.limb_ids[:-count]),
        ct.scaling_factor,
    )


def _key_switch_permuted(ctx, perm_c1: RnsPoly, ksk: rgsw_mod.RgswCt):
    level = perm_c1.limb_count
    k = ksk.at_level(level, ctx.num_special)
    d0, d1 = rgsw_mod.ext_prod(ctx, perm_c1, k)
    for _ in range(ctx.num_special):
        d0, d1 = basecnv.div_last_rounded_pair(ctx, d0, d1)
    return d0, d1


def conjugate(ctx, ct: CkksCt, ck: rgsw_mod.RgswCt) -> CkksCt:
    """(≙ ckks::conjugate, arith.cpp:75-83)."""
    i0, i1 = galois.involution(ct.c0), galois.involution(ct.c1)
    d0, d1 = _key_switch_permuted(ctx, i1, ck)
    return CkksCt(rns.add(ctx, d0, i0), d1, ct.scaling_factor)


def rotate(ctx, ct: CkksCt, rk: rgsw_mod.RgswCt, step: int) -> CkksCt:
    """Slot rotation: Galois gather + key switch (≙ ckks::rotate,
    arith.cpp:85-93)."""
    r0, r1 = galois.cycle(ct.c0, step), galois.cycle(ct.c1, step)
    d0, d1 = _key_switch_permuted(ctx, r1, rk)
    return CkksCt(rns.add(ctx, d0, r0), d1, ct.scaling_factor)


def rotate_accumulate(
    ctx,
    terms: Sequence[Tuple[CkksCt, int]],
    rot_keys: Dict[int, rgsw_mod.RgswCt],
) -> CkksCt:
    """Σ_g rotate(ct_g, step_g) with ONE special-prime division.

    Each nonzero-step term is key-switched into the extended (special-
    prime) basis and the q·P→q rounding divisions are applied once to the
    accumulated sum instead of once per rotation — the division is linear
    up to rounding, and summing first replaces G rounding errors of ≤1/2
    with one (no referent in the reference, whose rotate always divides,
    rgsw.cpp:121-156). Step-0 terms are added directly after the division.
    All terms must share limbs and scaling factor. Used for the giant
    steps of BSGS linear transforms (circuits/bootstrap.apply_lt_plan)."""
    if not terms:
        raise ValueError("rotate_accumulate needs at least one term")
    level = terms[0][0].c0.limb_count
    scale = terms[0][0].scaling_factor
    ext0 = ext1 = None  # accumulated key-switch halves, extended basis
    base0 = base1 = None  # step-0 terms + rotated c0 parts, base limbs
    for ct, step in terms:
        if abs(ct.scaling_factor - scale) > 1e-6 * scale:
            raise ValueError("rotate_accumulate terms must share the scale")
        if step % ct.c1.dimension == 0:
            base0 = ct.c0 if base0 is None else rns.add(ctx, base0, ct.c0)
            base1 = ct.c1 if base1 is None else rns.add(ctx, base1, ct.c1)
            continue
        r0 = galois.cycle(ct.c0, step)
        r1 = galois.cycle(ct.c1, step)
        k = rot_keys[step].at_level(level, ctx.num_special)
        d = rgsw_mod.ext_prod(ctx, r1, k)  # extended basis, pre-division
        ext0 = d.c0 if ext0 is None else rns.add(ctx, ext0, d.c0)
        ext1 = d.c1 if ext1 is None else rns.add(ctx, ext1, d.c1)
        base0 = r0 if base0 is None else rns.add(ctx, base0, r0)
    if ext0 is None:
        return CkksCt(base0, base1, scale)
    for _ in range(ctx.num_special):
        ext0, ext1 = basecnv.div_last_rounded_pair(ctx, ext0, ext1)
    c0 = ext0 if base0 is None else rns.add(ctx, ext0, base0)
    c1 = ext1 if base1 is None else rns.add(ctx, ext1, base1)
    return CkksCt(c0, c1, scale)


def hoisted_rotations(
    ctx,
    ct: CkksCt,
    rot_keys: Dict[int, rgsw_mod.RgswCt],
    steps: Sequence[int],
) -> Dict[int, CkksCt]:
    """Many rotations of ONE ciphertext sharing a single key-switch digit
    decomposition ("hoisting" — no referent in the reference, whose rotate
    recomputes the l·(l+s) digit NTTs per call, rgsw.cpp:91-119).

    Galois automorphisms act on NTT values as pure gathers and RNS digit
    decomposition is linear, so gather(digits(c1)) is a valid digit vector
    for cycle(c1): congruent to it mod each q_g with the same magnitude
    bound (the residue representative differs — q_g−x vs q_j−x at negated
    coefficients — so results are not bitwise identical to rotate(), but
    carry identical noise). Cost: ONE decomposition (l INTT + l·(l+s) NTT)
    plus, per step, a gather + Montgomery contraction + special division —
    the per-rotation transform count drops from l·(l+s)+l to the division's
    alone. Used by the BSGS baby steps in bootstrap/linear transforms."""
    out: Dict[int, CkksCt] = {}
    steps = [s for s in steps]
    if not steps:
        return out
    level = ct.c1.limb_count
    n = ct.c1.dimension
    k0 = rot_keys[steps[0]].at_level(level, ctx.num_special)
    digits = rgsw_mod.ks_digits(ctx, ct.c1, k0)  # [..., D, L_ext, n]
    for st in steps:
        idx = jnp.asarray(galois.cycle_indices(n, st % n))
        d_perm = jnp.take(digits, idx, axis=-1)
        k = rot_keys[st].at_level(level, ctx.num_special)
        d0, d1 = rgsw_mod.ks_contract(ctx, d_perm, k)
        for _ in range(ctx.num_special):
            d0, d1 = basecnv.div_last_rounded_pair(ctx, d0, d1)
        r0 = galois.cycle(ct.c0, st)
        out[st] = CkksCt(rns.add(ctx, d0, r0), d1, ct.scaling_factor)
    return out
