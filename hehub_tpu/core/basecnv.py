"""RNS base manipulation: signed single-limb lifts and the exact
divide-by-last-limb-with-rounding kernel shared by CKKS rescaling, BGV
modulus switching, and the special-prime drop after key switching
(≙ /root/reference/src/fhe/common/rns_transform.cpp:11-37,
src/fhe/ckks/rescaling.cpp:14-78, src/fhe/bgv/mod_switch.cpp:13-78 —
the reference encapsulation TODO at rescaling.cpp:46 realized).

These are exact integer algorithms; all steps below are elementwise with
per-limb host constants, so the whole kernel fuses into one XLA computation
per ciphertext half.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from hehub_tpu.core import rns
from hehub_tpu.core.context import Context
from hehub_tpu.core.rns import COEFF, NTT, RnsPoly
from hehub_tpu.ops import modarith as ma
from hehub_tpu.ops import ntt as nttmod
from hehub_tpu.utils import hostmath as hm

U32 = jnp.uint32


def lift_signed_single(
    ctx: Context, coeffs, src_mod: int, dst_ids: Tuple[int, ...]
) -> RnsPoly:
    """Signed lift of strict residues mod t (t < 2^29 <= q_j) into the limbs
    `dst_ids`: values >= t/2 are treated as negative
    (≙ rns_base_transform_from_single, rns_transform.cpp:11-37).
    coeffs: [..., n] uint32 in [0, t)."""
    t = int(src_mod)
    q = ctx.rows("q", dst_ids)  # [L, 1]
    if t >= int(q.min()):
        raise ValueError("signed single lift requires t < every target modulus")
    x = coeffs[..., None, :]
    half_t = U32(t // 2)
    lifted = jnp.where(x < half_t, x, x + q - U32(t))
    return RnsPoly(lifted.astype(U32), COEFF, dst_ids)


def div_last_rounded(
    ctx: Context,
    poly: RnsPoly,
    plain_modulus: Optional[int] = None,
    restore_plain_scale: bool = True,
) -> RnsPoly:
    """Exactly divide an NTT-form polynomial by its last RNS limb q_last with
    rounding, dropping that limb.

    plain_modulus=None: CKKS/raw flavor — out ≡ round(x / q_last) mod q_j
    (≙ rescale_by_one_prime_inplace, rescaling.cpp:14-78).

    plain_modulus=t: BGV flavor — divides by q_last while preserving the
    value mod t via the t^{-1} mod q_last correction, then (for a standalone
    modulus switch) restores the plaintext scale with (q_last mod t)
    (≙ mod_drop_one_prime_inplace, mod_switch.cpp:13-78).

    restore_plain_scale=False: for the special-prime drop inside BGV
    relinearization the key-switched value is already q_last-scaled
    (u ≡ p·d2·s² + t·E), so dividing by p alone yields d2·s² mod t exactly —
    applying the reference's unconditional (q_last mod t) factor there breaks
    the plaintext, which is consistent with the reference never activating
    its ct-ct mult test (tests/bgv_t.cpp:193-226).
    """
    if poly.form != NTT:
        raise ValueError("div_last_rounded expects NTT form")
    if poly.limb_count < 2:
        raise ValueError("cannot drop the only limb")
    ids = poly.limb_ids
    last_id = ids[-1]
    rem_ids = ids[:-1]
    q_last = ctx.mod_list[last_id]
    rem_mods = ctx.moduli_of(rem_ids)

    # 1. last limb back to coefficients, strict
    last = nttmod.intt(ctx, poly.data[..., -1:, :], (last_id,))
    v = ma.reduce_strict(last, np.uint32(q_last))
    if plain_modulus is not None:
        inv_t = hm.modinv(plain_modulus % q_last, q_last)
        v = ma.shoup_mul_lazy(
            v, np.uint32(inv_t), np.uint32(hm.shoup(inv_t, q_last)), np.uint32(q_last)
        )
        v = ma.reduce_strict(v, np.uint32(q_last))

    # 2. centered remainder under each remaining limb: [0, 2 q_j)
    q = ctx.rows("q", rem_ids)
    corr = np.asarray(
        [(qj - q_last % qj) % qj for qj in rem_mods], dtype=np.uint32
    )[:, None]
    if q_last < 2 * min(int(m) for m in rem_mods):
        # uniform-width chains: v < q_last < 2 q_j, one subtract suffices
        r = v - jnp.where(v >= q, q, U32(0))  # strict mod q_j
    else:
        # mixed-width chains (create_ckks_params_from_bit_lengths): q_last
        # may dwarf a remaining limb — take v mod q_j via a Shoup multiply
        # by 1 (valid for ANY uint32 input), then strict
        w1, w1_sh = hm.shoup_pair_arrays([1] * len(rem_ids), rem_mods)
        r = ma.reduce_strict(
            ma.shoup_mul_lazy(v, w1[:, None], w1_sh[:, None], q), q
        )
    r = r + jnp.where(v >= U32(q_last // 2), corr, U32(0))

    # 3. back to NTT under the remaining limbs
    r_ntt = nttmod.ntt(ctx, r, rem_ids)
    if plain_modulus is not None:
        w, w_sh = hm.shoup_pair_arrays([plain_modulus] * len(rem_ids), rem_mods)
        r_ntt = ma.shoup_mul_lazy(r_ntt, w[:, None], w_sh[:, None], q)

    # 4. (x - r) * q_last^{-1} [* (q_last mod t)] per limb
    x = poly.data[..., :-1, :]
    diff = ma.sub_lazy(x, r_ntt, ctx.rows("two_q", rem_ids))
    scal = [hm.modinv(q_last % qj, qj) for qj in rem_mods]
    if plain_modulus is not None and restore_plain_scale:
        scal = [s * (q_last % plain_modulus) % qj for s, qj in zip(scal, rem_mods)]
    w, w_sh = hm.shoup_pair_arrays(scal, rem_mods)
    out = ma.shoup_mul_lazy(diff, w[:, None], w_sh[:, None], q)
    return RnsPoly(out, NTT, rem_ids)


# ---------------------------------------------------------------------------
# General k -> m base conversion (device-side)
# ---------------------------------------------------------------------------


def base_convert(
    ctx: Context,
    poly: RnsPoly,
    dst_ids: Tuple[int, ...],
    signed: bool = True,
) -> RnsPoly:
    """General k->m RNS base conversion — the case the reference left
    "under development" (≙ rns_base_transform, rns_transform.cpp:107-125),
    implemented for real as a device-side fast base conversion.

    Input: coeff-form poly over src limbs; output: coeff-form lazy residues
    over `dst_ids` of the same integer x = CRT(residues) ∈ [0, Q), taken
    signed (centered lift, matching the reference's to-single semantics,
    rns_transform.cpp:47-84) or unsigned.

    Math: with y_i = x_i · (Q/q_i)^{-1} mod q_i (strict),
        x = Σ_i y_i · Q/q_i − v·Q,   v = floor(Σ_i y_i / q_i) < k,
    and the signed lift subtracts one further Q when frac(Σ y_i/q_i) =
    x/Q ≥ 1/2. So mod p_j:
        out_j = Σ_i y_i · (Q/q_i mod p_j) − round_or_floor(Σ y_i/q_i) · (Q mod p_j).

    v is computed EXACTLY enough in 0.32 fixed point with uint32 adds and a
    carry chain (per-term error ≤ 2·2⁻³², total ≤ 2k·2⁻³²) — no float64, no
    data-dependent host work, everything fuses under jit. Coefficients whose
    distance from a multiple of Q/2 is below k·2⁻³¹·Q could round the wrong
    way; FHE coefficients are noise-laden so this never occurs in practice
    (the same regime as BEHZ/HPS approximate conversion).
    """
    if poly.form != COEFF:
        raise ValueError("base_convert expects coeff form")
    if not dst_ids:
        raise ValueError("base_convert needs at least one destination limb")
    src_ids = poly.limb_ids
    src_mods = ctx.moduli_of(src_ids)
    dst_mods = ctx.moduli_of(dst_ids)
    k = len(src_mods)
    Q = 1
    for q in src_mods:
        Q *= int(q)

    # 1. y_i = x_i * qhat_inv_i mod q_i, strict
    qhat_inv = [hm.modinv((Q // q) % q, q) for q in src_mods]
    w, w_sh = hm.shoup_pair_arrays(qhat_inv, src_mods)
    q_src = ctx.rows("q", src_ids)
    y = ma.shoup_mul_lazy(poly.data, w[:, None], w_sh[:, None], q_src)
    y = ma.reduce_strict(y, q_src)  # [..., k, n], strict

    # 2. v = floor/round(Σ y_i/q_i) via 0.32 fixed point: z_i ≈ y_i·2^32/q_i
    c = [(1 << 64) // q for q in src_mods]
    c_hi = np.asarray([ci >> 32 for ci in c], np.uint32)[:, None]  # = floor(2^32/q)
    c_lo = np.asarray([ci & 0xFFFFFFFF for ci in c], np.uint32)[:, None]
    z = y * c_hi + ma.mul_hi(y, jnp.broadcast_to(c_lo, y.shape))  # [..., k, n]
    lo = jnp.zeros(z.shape[:-2] + z.shape[-1:], U32)
    carries = jnp.zeros_like(lo)
    for i in range(k):
        lo_new = lo + z[..., i, :]
        carries = carries + (lo_new < z[..., i, :]).astype(U32)
        lo = lo_new
    v = carries + (lo >= U32(1 << 31)).astype(U32) if signed else carries

    # 3. out_j = Σ_i y_i·(Q/q_i mod p_j) − v·(Q mod p_j), all lazy in [0, 2p_j)
    outs = []
    for j, p in zip(dst_ids, dst_mods):
        p = int(p)
        q_j = ctx.rows("q", (j,))
        two_p = ctx.rows("two_q", (j,))
        qhat_mod = [(Q // q) % p for q in src_mods]
        wj, wj_sh = hm.shoup_pair_arrays(qhat_mod, [p] * k)
        terms = ma.shoup_mul_lazy(y, wj[:, None], wj_sh[:, None], q_j)
        acc = ma.reduce_add_lazy(terms, -2, two_p[0])
        corr = ma.shoup_mul_lazy(
            v, np.uint32(Q % p), np.uint32(hm.shoup(Q % p, p)), q_j[0]
        )
        outs.append(ma.sub_lazy(acc, corr, two_p[0]))
    data = jnp.stack(outs, axis=-2)
    return RnsPoly(data, COEFF, tuple(dst_ids))


# ---------------------------------------------------------------------------
# Digit-form integers: the host<->device interchange format for values wider
# than one limb (CKKS big-coefficient encode, BGV general plaintext moduli)
# ---------------------------------------------------------------------------

DIGIT_BITS = 22
NUM_DIGITS = 3  # 3 x 22-bit digits cover |value| < 2^62


def digitize_signed(ix: np.ndarray):
    """Exact base-2^22 digit split of int64 values, |ix| < 2^62. Returns
    (digits uint32 [..., 3, n], neg uint32 [..., n]) — the interchange
    format consumed by decompose_digits on device."""
    ix = np.asarray(ix, np.int64)
    if np.abs(ix).max(initial=0) >= (1 << 62):
        raise ValueError("digitize_signed requires |values| < 2^62")
    neg = (ix < 0).astype(np.uint32)
    ax = np.abs(ix).astype(np.uint64)
    mask = np.uint64((1 << DIGIT_BITS) - 1)
    digits = np.empty((*ix.shape[:-1], NUM_DIGITS, ix.shape[-1]), np.uint32)
    for i in range(NUM_DIGITS):
        digits[..., i, :] = (
            (ax >> np.uint64(DIGIT_BITS * i)) & mask
        ).astype(np.uint32)
    return digits, neg


def decompose_digits(ctx: Context, digits, neg, ids: Tuple[int, ...]) -> RnsPoly:
    """Device residue decomposition of digitized signed integers: lazy
    residues r_j = ±(d0 + d1·2^22 + d2·2^44) mod q_j. Jit-traceable; fuses
    into whatever consumes it (the encrypt NTT, a plaintext lift). Replaces
    the reference's host per-limb loops (ckks/basics.cpp:210-254 and the
    1->k signed lift rns_transform.cpp:11-37 for wide values)."""
    mods = ctx.moduli_of(ids)
    q = ctx.rows("q", ids)
    two_q = ctx.rows("two_q", ids)
    r = digits[..., 0, None, :].astype(jnp.uint32)  # [..., 1, n] < 2^22
    for i in range(1, NUM_DIGITS):
        c = [(1 << (DIGIT_BITS * i)) % m for m in mods]
        w, w_sh = hm.shoup_pair_arrays(c, mods)
        term = ma.shoup_mul_lazy(
            digits[..., i, None, :].astype(jnp.uint32), w[:, None],
            w_sh[:, None], q,
        )
        r = ma.add_lazy(r, term, two_q)
    r = jnp.where(neg[..., None, :] != 0, ma.neg_lazy(r, two_q), r)
    return RnsPoly(r.astype(jnp.uint32), COEFF, ids)


def decompose_balanced(ctx: Context, digits, ids: Tuple[int, ...]) -> RnsPoly:
    """Device residue decomposition of BALANCED base-2^22 digits: residues
    r_j = (d0 + d1·2^22 + d2·2^44) mod q_j with each d_i a signed int32 in
    (-2^22, 2^22) — the natural output of the df64 on-device digit
    extraction (ops/df64.py), where remainders round to balanced digits.

    Bias trick: with C = 2^22, Σ (d_i + C)·2^{22i} = value + OFF where
    OFF = C·(1 + 2^22 + 2^44); each biased digit is in [1, 2^23) (a valid
    lazy input) and the constant OFF folds into one per-limb subtraction.

    digits: int32 [..., 3, n]. Same output contract as decompose_digits."""
    mods = ctx.moduli_of(ids)
    q = ctx.rows("q", ids)
    two_q = ctx.rows("two_q", ids)
    C = 1 << DIGIT_BITS
    biased = (digits + jnp.int32(C)).astype(jnp.uint32)
    r = biased[..., 0, None, :]  # [..., 1, n] < 2^23
    off = C * (1 + (1 << DIGIT_BITS) + (1 << (2 * DIGIT_BITS)))
    for i in range(1, NUM_DIGITS):
        c = [(1 << (DIGIT_BITS * i)) % m for m in mods]
        w, w_sh = hm.shoup_pair_arrays(c, mods)
        term = ma.shoup_mul_lazy(
            biased[..., i, None, :], w[:, None], w_sh[:, None], q
        )
        r = ma.add_lazy(r, term, two_q)
    # subtract OFF mod q_j: add its negation as a strict per-limb constant
    neg_off = np.asarray(
        [(-off) % int(m) for m in mods], np.uint32
    )[:, None]
    r = ma.add_lazy(r, neg_off, two_q)
    return RnsPoly(r.astype(jnp.uint32), COEFF, ids)


def div_last_rounded_pair(
    ctx: Context,
    a: RnsPoly,
    b: RnsPoly,
    plain_modulus: Optional[int] = None,
    restore_plain_scale: bool = True,
) -> Tuple[RnsPoly, RnsPoly]:
    """div_last_rounded on both ciphertext halves in ONE stacked call: the
    INTT/NTT kernels see 2x the rows (better block utilization, half the
    launches)."""
    if a.limb_ids != b.limb_ids or a.form != b.form:
        raise ValueError("pair must share limbs and form")
    stacked = RnsPoly(
        jnp.stack([a.data, b.data], axis=0), a.form, a.limb_ids
    )
    out = div_last_rounded(ctx, stacked, plain_modulus, restore_plain_scale)
    return (
        RnsPoly(out.data[0], out.form, out.limb_ids),
        RnsPoly(out.data[1], out.form, out.limb_ids),
    )


def to_mixed_radix(ctx: Context, data, limb_ids: Tuple[int, ...], k: int):
    """Device Garner conversion: strict residues of x under the first k limbs
    -> mixed-radix digits [..., k, n] with x = Σ_j y_j · ∏_{m<j} q_m (mod ∏q).

    This is the device half of big-coefficient CKKS decode (the role of the
    reference's CRTComposer, bigint.cpp:330-405, without bignums): the host
    only evaluates the k digits in float64. O(k²) fused elementwise passes.

    `data`: [..., L, n] uint32 lazy with L >= k.
    """
    ids = limb_ids[:k]
    mods = [int(m) for m in ctx.moduli_of(ids)]
    x = ma.reduce_strict(data[..., :k, :], ctx.rows("q", ids))
    ys = [x[..., 0, :]]
    for i in range(1, k):
        qi = mods[i]
        two_qi = np.uint32(2 * qi)
        # acc = (y_0 + y_1·Q_1 + ... + y_{i-1}·Q_{i-1}) mod q_i, lazy.
        if mods[0] < 2 * qi:
            # uniform-width chains: y_0 < q_0 < 2·q_i, a valid lazy input
            acc = ys[0]
        else:
            # mixed-width chains (create_ckks_params_from_bit_lengths):
            # y_0 < q_0 may exceed 2·q_i — route the j=0 term through the
            # same Shoup multiply (by the constant 1) as the others:
            # shoup_mul_lazy accepts ANY uint32 input, lands in [0, 2·q_i)
            acc = ma.shoup_mul_lazy(
                ys[0], np.uint32(1), np.uint32(hm.shoup(1, qi)), np.uint32(qi)
            )
        for j in range(1, i):
            w = 1
            for m in mods[:j]:
                w = w * m % qi
            term = ma.shoup_mul_lazy(
                ys[j], np.uint32(w), np.uint32(hm.shoup(w, qi)), np.uint32(qi)
            )
            acc = ma.add_lazy(acc, term, two_qi)
        diff = ma.sub_lazy(x[..., i, :], acc, two_qi)
        w_inv = 1
        for m in mods[:i]:
            w_inv = w_inv * m % qi
        w_inv = hm.modinv(w_inv, qi)
        y_i = ma.shoup_mul_lazy(
            diff, np.uint32(w_inv), np.uint32(hm.shoup(w_inv, qi)), np.uint32(qi)
        )
        ys.append(ma.reduce_strict(y_i, np.uint32(qi)))
    return jnp.stack(ys, axis=-2)


# ---------------------------------------------------------------------------
# Host-side exact compose/convert (the k->1 and oracle paths)
# ---------------------------------------------------------------------------


def compose_to_int(coeffs: np.ndarray, moduli) -> list:
    """Host CRT compose of strict residues [L, n] -> centered Python ints."""
    vals = hm.crt_compose([np.asarray(c) for c in coeffs], list(moduli))
    Q = 1
    for m in moduli:
        Q *= int(m)
    return [hm.to_signed(x, Q) for x in vals]


def convert_to_single_host(coeffs: np.ndarray, moduli, new_modulus: int) -> np.ndarray:
    """Host-exact k->1 base conversion with signed lift
    (≙ rns_base_transform_to_single, rns_transform.cpp:39-105 — the CRT
    fallback done exactly, at the host boundary where it belongs).
    Uses the C++ runtime when available; Python bigints otherwise."""
    from hehub_tpu.native import loader

    if loader.available():
        return loader.compose_mod(np.asarray(coeffs), list(moduli), new_modulus)
    ints = compose_to_int(coeffs, moduli)
    return np.asarray([x % new_modulus for x in ints], dtype=np.uint32)
