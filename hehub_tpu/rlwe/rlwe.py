"""RLWE primitives (≙ /root/reference/src/fhe/primitives/rlwe.h:23-120,
rlwe.cpp:31-101), TPU-native.

A ciphertext is a pair of RnsPoly in NTT (value) form; a secret key is a
ternary polynomial stored BOTH as host-side ternary coefficients (exact
keygen material) and as strict-reduced NTT residues with Shoup companions,
so that every c1*s product in encrypt/decrypt is a 6-multiply Shoup mulmod
baked against key constants.

Debug "no-noise" modes replace the reference's HEHUB_DEBUG_RLWE_ZERO_C1/E
compile options (src/fhe/CMakeLists.txt:21-28) with runtime booleans.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import numpy as np

from hehub_tpu.core import rns, sampling
from hehub_tpu.core.context import Context
from hehub_tpu.core.rns import NTT, RnsPoly
from hehub_tpu.ops import modarith as ma


class RlweCt(NamedTuple):
    """(c0, c1), both NTT form (≙ RlweCt, rlwe.h:27)."""

    c0: RnsPoly
    c1: RnsPoly

    @property
    def limb_ids(self):
        return self.c0.limb_ids


@dataclasses.dataclass(frozen=True, eq=False)
class RlweSk:
    """Ternary secret key. `coeffs`: host int8 [n]; `ntt`/`ntt_sh`: host
    uint32 [M, n] strict NTT residues + Shoup companions over all context
    limbs (≙ RlweSk, rlwe.h:34-48, stored in NTT form rlwe.cpp:31-32)."""

    coeffs: np.ndarray
    ntt: np.ndarray
    ntt_sh: np.ndarray

    def rows(self, limb_ids: Tuple[int, ...]):
        idx = np.asarray(limb_ids, dtype=np.int64)
        return self.ntt[idx], self.ntt_sh[idx]


def keygen(ctx: Context, key, hamming_weight: Optional[int] = None) -> RlweSk:
    """Sample a ternary secret and precompute its NTT/Shoup tables.

    `hamming_weight`: sample a SPARSE ternary secret with exactly that many
    nonzero (±1) coefficients — the standard choice for CKKS bootstrapping,
    where it bounds the mod-raise overflow polynomial I(X) by ~(h+1)/2."""
    n = ctx.params.dimension
    all_ids = tuple(range(len(ctx.mod_list)))
    if hamming_weight is None:
        tern = np.asarray(
            jax.random.randint(key, (n,), -1, 2, dtype=np.int32), np.int8
        )
    else:
        h = int(hamming_weight)
        if not 0 < h <= n:
            raise ValueError(f"hamming weight {h} out of range (0, {n}]")
        k_pos, k_sign = jax.random.split(key)
        pos = np.asarray(jax.random.permutation(k_pos, n))[:h]
        signs = np.asarray(
            jax.random.randint(k_sign, (h,), 0, 2, dtype=np.int32)
        ) * 2 - 1
        tern = np.zeros(n, np.int8)
        tern[pos] = signs.astype(np.int8)
    qs = np.asarray([ctx.mod_list[i] for i in all_ids], np.uint32)[:, None]
    resid = (tern.astype(np.int64)[None, :] % qs.astype(np.int64)).astype(np.uint32)
    poly = RnsPoly(resid, rns.COEFF, all_ids)
    sk_ntt = np.asarray(rns.reduce_strict(ctx, rns.to_ntt(ctx, poly)).data)
    sh = ((sk_ntt.astype(np.uint64) << np.uint64(32)) // qs.astype(np.uint64)).astype(
        np.uint32
    )
    sk_ntt.setflags(write=False)
    sh.setflags(write=False)
    return RlweSk(coeffs=tern, ntt=sk_ntt, ntt_sh=sh)


def mul_by_sk(ctx: Context, poly: RnsPoly, sk: RlweSk) -> RnsPoly:
    """poly * sk on NTT values via key-constant Shoup multiply."""
    if poly.form != NTT:
        raise ValueError("expected NTT form")
    w, w_sh = sk.rows(poly.limb_ids)
    out = ma.shoup_mul_lazy(poly.data, w, w_sh, ctx.rows("q", poly.limb_ids))
    return poly.with_data(out)


def rlwe_sample(
    ctx: Context,
    sk: RlweSk,
    key,
    limb_ids: Tuple[int, ...],
    batch_shape=(),
    noise_scale: Optional[int] = None,
    debug_zero_c1: bool = False,
    debug_zero_e: bool = False,
) -> RlweCt:
    """Fresh encryption of zero: (c0, c1) = (e - c1*s, c1)
    (≙ get_rlwe_sample, rlwe.cpp:34-53). `noise_scale` multiplies both halves
    by a constant — the BGV noise lift (≙ get_rlwe_sample_lift_noise,
    bgv/basics.cpp:63-78)."""
    k1, k2 = jax.random.split(key)
    if debug_zero_c1:
        c1 = sampling.zero_poly(ctx, limb_ids, batch_shape)
    else:
        c1 = sampling.uniform_poly(ctx, k1, limb_ids, batch_shape, form=NTT)
    if debug_zero_e:
        e = sampling.zero_poly(ctx, limb_ids, batch_shape)
    else:
        e = sampling.gaussian_poly(ctx, k2, limb_ids, batch_shape)
    c0 = rns.sub(ctx, e, mul_by_sk(ctx, c1, sk))
    if noise_scale is not None and noise_scale != 1:
        c0 = rns.mul_scalar(ctx, c0, noise_scale)
        c1 = rns.mul_scalar(ctx, c1, noise_scale)
    return RlweCt(c0, c1)


def encrypt_core(ctx: Context, pt: RnsPoly, sk: RlweSk, key, **dbg) -> RlweCt:
    """Encrypt a coeff-form plaintext (≙ encrypt_core, rlwe.cpp:55-71)."""
    if pt.form != rns.COEFF:
        raise ValueError("plaintext must be in coeff form")
    pt_ntt = rns.to_ntt(ctx, pt)
    c0, c1 = rlwe_sample(ctx, sk, key, pt.limb_ids, pt.batch_shape, **dbg)
    return RlweCt(rns.add(ctx, c0, pt_ntt), c1)


def decrypt_core(ctx: Context, ct: RlweCt, sk: RlweSk) -> RnsPoly:
    """pt = c0 + c1*s, back to coeff form, strict
    (≙ decrypt_core, rlwe.cpp:73-81)."""
    pt = rns.add(ctx, ct.c0, mul_by_sk(ctx, ct.c1, sk))
    return rns.reduce_strict(ctx, rns.to_coeff(ctx, pt))


# -- ciphertext-level linear ops (≙ rlwe.cpp:83-101) -------------------------


def add(ctx, a: RlweCt, b: RlweCt) -> RlweCt:
    return RlweCt(rns.add(ctx, a.c0, b.c0), rns.add(ctx, a.c1, b.c1))


def sub(ctx, a: RlweCt, b: RlweCt) -> RlweCt:
    return RlweCt(rns.sub(ctx, a.c0, b.c0), rns.sub(ctx, a.c1, b.c1))


def add_plain_core(ctx, ct: RlweCt, pt_ntt: RnsPoly) -> RlweCt:
    return RlweCt(rns.add(ctx, ct.c0, pt_ntt), ct.c1)


def sub_plain_core(ctx, ct: RlweCt, pt_ntt: RnsPoly) -> RlweCt:
    return RlweCt(rns.sub(ctx, ct.c0, pt_ntt), ct.c1)


def mult_plain_core(ctx, ct: RlweCt, pt_ntt: RnsPoly) -> RlweCt:
    return RlweCt(rns.mul(ctx, ct.c0, pt_ntt), rns.mul(ctx, ct.c1, pt_ntt))
