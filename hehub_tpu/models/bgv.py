"""BGV: exact-arithmetic SIMD homomorphic encryption over Z_t
(≙ /root/reference/src/fhe/bgv/bgv.h:55-167, basics.cpp, arith.cpp,
mod_switch.cpp), TPU-native.

Includes end-to-end ct-ct multiply + relinearize — the path the reference
declares but never exercises (its test is commented out,
tests/bgv_t.cpp:193-226)."""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from hehub_tpu.core import basecnv, rns
from hehub_tpu.core.context import BgvParams, Context
from hehub_tpu.core.rns import COEFF, NTT, RnsPoly
from hehub_tpu.ops import modarith as ma
from hehub_tpu.ops import ntt as nttmod
from hehub_tpu.rlwe import rgsw as rgsw_mod
from hehub_tpu.rlwe import rlwe as rlwe_mod


class BgvPt(NamedTuple):
    """Coeff-form polynomial mod t, data uint32 [..., n] strict."""

    data: jnp.ndarray
    plain_modulus: int


class BgvCt(NamedTuple):
    c0: RnsPoly
    c1: RnsPoly
    plain_modulus: int

    @property
    def limb_ids(self):
        return self.c0.limb_ids


class BgvQuadCt(NamedTuple):
    c0: RnsPoly
    c1: RnsPoly
    c2: RnsPoly
    plain_modulus: int


def _check_t(a, b):
    if a.plain_modulus != b.plain_modulus:
        raise ValueError("plain moduli mismatch")


# ---------------------------------------------------------------------------
# SIMD packing (≙ bgv::simd_encode/simd_decode, basics.cpp:11-61)
# ---------------------------------------------------------------------------


def simd_encode(ctx: Context, data) -> BgvPt:
    """Pack Z_t slots via the single-prime inverse NTT mod t."""
    t = ctx.params.plain_modulus
    n = ctx.params.dimension
    data = np.asarray(data, dtype=np.uint64)
    if (data >= t).any():
        raise ValueError(f"data must be Z_t elements, t={t}")
    if data.shape[-1] > n:
        raise ValueError(f"cannot encode {data.shape[-1]} data into {n} slots")
    vals = np.zeros((*data.shape[:-1], n), dtype=np.uint32)
    vals[..., : data.shape[-1]] = data
    coeffs = nttmod.intt_single(ctx.plain_tables, jnp.asarray(vals))
    coeffs = ma.reduce_strict(coeffs, np.uint32(t))
    return BgvPt(coeffs, t)


def simd_decode(ctx: Context, pt: BgvPt, count: Optional[int] = None) -> np.ndarray:
    t = pt.plain_modulus
    vals = nttmod.ntt_single(ctx.plain_tables, pt.data)
    vals = np.asarray(ma.reduce_strict(vals, np.uint32(t)))
    return vals[..., : count or vals.shape[-1]]


# ---------------------------------------------------------------------------
# Encrypt / decrypt (≙ bgv/basics.cpp:63-117)
# ---------------------------------------------------------------------------


def encrypt(ctx: Context, pt: BgvPt, sk: rlwe_mod.RlweSk, key, **dbg) -> BgvCt:
    """Noise lifted by t; plaintext signed-lifted into the ct modulus chain."""
    t = pt.plain_modulus
    ids = tuple(range(len(ctx.params.moduli)))
    batch = pt.data.shape[:-1]
    c0, c1 = rlwe_mod.rlwe_sample(
        ctx, sk, key, ids, batch_shape=batch, noise_scale=t, **dbg
    )
    lifted = basecnv.lift_signed_single(ctx, pt.data, t, ids)
    c0 = rns.add(ctx, c0, rns.to_ntt(ctx, lifted))
    return BgvCt(c0, c1, t)


def decrypt(ctx: Context, ct: BgvCt, sk: rlwe_mod.RlweSk) -> BgvPt:
    """Host-exact decryption: RLWE decrypt core, then exact k->1 signed base
    conversion to t via CRT compose (≙ bgv::decrypt, basics.cpp:108-117)."""
    poly = rlwe_mod.decrypt_core(ctx, rlwe_mod.RlweCt(ct.c0, ct.c1), sk)
    resid = np.asarray(poly.data)
    mods = ctx.moduli_of(poly.limb_ids)
    t = ct.plain_modulus
    flat = resid.reshape(-1, len(mods), resid.shape[-1])
    outs = [
        basecnv.convert_to_single_host(flat[b], mods, t) for b in range(flat.shape[0])
    ]
    data = np.stack(outs).reshape(*resid.shape[:-2], resid.shape[-1])
    return BgvPt(data.astype(np.uint32), t)


def decrypt_device(ctx: Context, ct: BgvCt, sk: rlwe_mod.RlweSk) -> BgvPt:
    """Jit-friendly decryption fast path: valid while the decryption noise
    |m + t*e| stays below q_0/2, in which case every limb agrees and limb 0's
    signed residue mod t is exact (the small-coeff fast path of
    rns_transform.cpp:47-84, kept on device)."""
    poly = rlwe_mod.decrypt_core(ctx, rlwe_mod.RlweCt(ct.c0, ct.c1), sk)
    q0 = ctx.mod_list[poly.limb_ids[0]]
    t = ct.plain_modulus
    v = poly.data[..., 0, :]
    signed_mod_t = jnp.where(v < np.uint32(q0 // 2), v % np.uint32(t),
                             (v + np.uint32(t - q0 % t)) % np.uint32(t))
    return BgvPt(signed_mod_t.astype(jnp.uint32), t)


# ---------------------------------------------------------------------------
# Homomorphic ops (≙ bgv/arith.cpp)
# ---------------------------------------------------------------------------


def _pt_under_ct(ctx, pt: BgvPt, ids) -> RnsPoly:
    lifted = basecnv.lift_signed_single(ctx, pt.data, pt.plain_modulus, ids)
    return rns.to_ntt(ctx, lifted)


def add(ctx, a: BgvCt, b: BgvCt) -> BgvCt:
    _check_t(a, b)
    return BgvCt(rns.add(ctx, a.c0, b.c0), rns.add(ctx, a.c1, b.c1), a.plain_modulus)


def sub(ctx, a: BgvCt, b: BgvCt) -> BgvCt:
    _check_t(a, b)
    return BgvCt(rns.sub(ctx, a.c0, b.c0), rns.sub(ctx, a.c1, b.c1), a.plain_modulus)


def add_plain(ctx, ct: BgvCt, pt: BgvPt) -> BgvCt:
    _check_t(ct, pt)
    p = _pt_under_ct(ctx, pt, ct.limb_ids)
    return BgvCt(rns.add(ctx, ct.c0, p), ct.c1, ct.plain_modulus)


def sub_plain(ctx, ct: BgvCt, pt: BgvPt) -> BgvCt:
    _check_t(ct, pt)
    p = _pt_under_ct(ctx, pt, ct.limb_ids)
    return BgvCt(rns.sub(ctx, ct.c0, p), ct.c1, ct.plain_modulus)


def mult_plain(ctx, ct: BgvCt, pt: BgvPt) -> BgvCt:
    _check_t(ct, pt)
    p = _pt_under_ct(ctx, pt, ct.limb_ids)
    return BgvCt(
        rns.mul(ctx, ct.c0, p), rns.mul(ctx, ct.c1, p), ct.plain_modulus
    )


def mult_low_level(ctx, ct1: BgvCt, ct2: BgvCt) -> BgvQuadCt:
    """Tensor product to 3 components (≙ arith.cpp:59-69)."""
    _check_t(ct1, ct2)
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
    return BgvQuadCt(mk(p0), mk(p1), mk(p2), ct1.plain_modulus)


def relinearize(ctx, quad: BgvQuadCt, rlk: rgsw_mod.RgswCt) -> BgvCt:
    """ext_prod on c2 + BGV-correct special-prime drop + add
    (≙ arith.cpp:71-79). `rlk` must be generated with noise_scale=t
    (BGV keys carry t-multiple noise)."""
    t = quad.plain_modulus
    level = quad.c2.limb_count
    rlk_l = rlk.at_level(level, ctx.num_special)
    d0, d1 = rgsw_mod.ext_prod(ctx, quad.c2, rlk_l)
    # the key-switched value is already special-prime-scaled: divide without
    # the (p mod t) plaintext-scale restore (see basecnv.div_last_rounded)
    for _ in range(ctx.num_special):
        d0 = basecnv.div_last_rounded(
            ctx, d0, plain_modulus=t, restore_plain_scale=False)
        d1 = basecnv.div_last_rounded(
            ctx, d1, plain_modulus=t, restore_plain_scale=False)
    return BgvCt(rns.add(ctx, d0, quad.c0), rns.add(ctx, d1, quad.c1), t)


def mult(ctx, ct1: BgvCt, ct2: BgvCt, rlk: rgsw_mod.RgswCt) -> BgvCt:
    """End-to-end ct-ct multiply (the op the reference never wires up)."""
    return relinearize(ctx, mult_low_level(ctx, ct1, ct2), rlk)


def mod_switch(ctx, ct: BgvCt, dropping_primes: int = 1) -> BgvCt:
    """Drop trailing primes, dividing while preserving the value mod t
    (≙ mod_switch_inplace, mod_switch.cpp:80-90; multi-prime by iteration)."""
    c0, c1, t = ct.c0, ct.c1, ct.plain_modulus
    for _ in range(dropping_primes):
        c0 = basecnv.div_last_rounded(ctx, c0, plain_modulus=t)
        c1 = basecnv.div_last_rounded(ctx, c1, plain_modulus=t)
    return BgvCt(c0, c1, t)
