"""CKKS: approximate-complex SIMD homomorphic encryption
(≙ /root/reference/src/fhe/ckks/ckks.h:40-313, basics.cpp, arith.cpp,
rescaling.cpp), TPU-native.

Encoding runs on the host in float64 via a twisted length-n FFT (exact slot
placement in Galois-exponent order so SIMD slots align with rotation keys,
≙ basics.cpp:156-258); everything from encrypt onward is jit-traceable device
code over uint32 RNS tensors with leading batch dims.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hehub_tpu.core import basecnv, galois, rns
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


def _coeffs_from_slots(data: np.ndarray, n: int) -> np.ndarray:
    """Complex slot values [..., k] -> real negacyclic coefficients
    [..., n] (float64). Batched over leading dims (vectorized FFT)."""
    pos = _slot_positions(n)[: data.shape[-1]]
    ev = np.zeros((*data.shape[:-1], n), dtype=np.complex128)
    ev[..., pos] = data
    ev[..., n - 1 - pos] = np.conj(data)
    b = np.fft.fft(ev, axis=-1) / n
    return (b * np.conj(_twist(n))).real


def _slots_to_read(coeffs: np.ndarray, n: int, count: int) -> np.ndarray:
    ev = n * np.fft.ifft(coeffs * _twist(n), axis=-1)
    pos = _slot_positions(n)[:count]
    return ev[..., pos]


def encode(
    data, params: CkksParams, scaling_factor: Optional[float] = None, level: int = 0
) -> CkksPt:
    """SIMD-encode up to n/2 complex numbers (≙ ckks::simd_encode,
    basics.cpp:156-272). `level`=0 means all limbs; level=k drops the last k.

    `data` may carry leading batch dims ([..., slots]): the FFT and residue
    decomposition vectorize, yielding a batched plaintext [..., L, n]."""
    ctx = make_context(params)
    n = params.dimension
    scale = scaling_factor or params.initial_scaling_factor
    data = np.atleast_1d(np.asarray(data, dtype=np.complex128))
    if data.shape[-1] > n // 2:
        raise ValueError(f"can encode at most {n//2} slots")
    coeffs = _coeffs_from_slots(data, n) * scale
    ids = tuple(range(len(params.moduli) - level))
    mods = ctx.moduli_of(ids)
    if np.abs(coeffs).max(initial=0.0) < 2**52:
        ints = np.rint(coeffs).astype(np.int64)
        from hehub_tpu.native import loader

        if loader.available():
            resid = loader.decompose_i64(ints, mods)
        else:
            qs = np.asarray(mods, np.int64).reshape(
                (len(mods),) + (1,) * ints.ndim
            )
            resid = np.moveaxis(ints[None] % qs, 0, -2).astype(np.uint32)
    else:  # big-coefficient path, exact via Python ints (≙ basics.cpp:226-254)
        if coeffs.ndim != 1:
            raise ValueError("big-coefficient encode supports 1-D data only")
        ints = [int(round(c)) for c in coeffs]
        resid = hm_decompose(ints, mods)
    return CkksPt(RnsPoly(jnp.asarray(resid), COEFF, ids), float(scale))


def hm_decompose(ints, mods):
    from hehub_tpu.utils import hostmath as hm

    return hm.decompose_rns(ints, list(mods))


def decode(pt: CkksPt, params: CkksParams, count: Optional[int] = None) -> np.ndarray:
    """(≙ ckks::simd_decode, basics.cpp:274-366). Host-exact CRT compose when
    coefficients exceed one limb."""
    ctx = make_context(params)
    n = params.dimension
    count = count or n // 2
    poly = pt.poly
    if poly.form != COEFF:
        raise ValueError("decode expects coeff form")
    resid = np.asarray(poly.data)  # [..., L, n]
    mods = ctx.moduli_of(poly.limb_ids)
    resid = resid % np.asarray(mods, np.uint32)[:, None]
    # small-coefficient fast path: all limbs agree as signed values
    q0 = mods[0]
    r0 = resid[..., 0, :]
    signed0 = np.where(r0 < q0 // 2, r0.astype(np.int64),
                       r0.astype(np.int64) - q0)
    agree = all(
        np.array_equal(signed0 % q, resid[..., k, :])
        for k, q in enumerate(mods)
    )
    if agree:
        coeffs = signed0.astype(np.float64)
    else:
        if resid.ndim != 2:
            raise ValueError("big-coefficient decode supports 1 ciphertext")
        from hehub_tpu.native import loader

        if loader.available():
            coeffs = loader.compose_double(resid, list(mods))
        else:
            ints = basecnv.compose_to_int(resid, mods)
            coeffs = np.asarray([float(x) for x in ints])
    coeffs /= pt.scaling_factor
    return _slots_to_read(coeffs, n, count)


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
        d0 = basecnv.div_last_rounded(ctx, d0)
        d1 = basecnv.div_last_rounded(ctx, d1)
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
        c0 = basecnv.div_last_rounded(ctx, c0)
        c1 = basecnv.div_last_rounded(ctx, c1)
        scale /= q_last
    return CkksCt(c0, c1, scale)


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
        d0 = basecnv.div_last_rounded(ctx, d0)
        d1 = basecnv.div_last_rounded(ctx, d1)
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
