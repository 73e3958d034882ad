"""CKKS bootstrapping — the circuit the reference planned but never started
(/root/reference/src/circuits/ckks_boot.h — 0 bytes).

Pipeline (Cheon-Han-Kim-Kim-Song style):
  1. mod_raise: reinterpret an exhausted ciphertext (1 limb, modulus q0) over
     the full RNS basis; it then decrypts to t(X) = m(X) + q0·I(X) with small
     integer polynomial I (|I| bounded by the secret's Hamming weight).
  2. coeff_to_slot: homomorphic linear maps taking the n coefficients of t
     into slot space as TWO real-slot ciphertexts (r_j = t_j,
     im_j = t_{j+n/2}) — four BSGS plaintext-matrix products plus one
     conjugation, with the matrices derived NUMERICALLY from this
     framework's own encoding layout. The halves cannot stay packed as
     r + i·im because the next stage is nonlinear.
  3. eval_mod: approximate u ↦ (u mod q0)/q0 on each half via a
     Chebyshev-basis sine approximation, sin(2πu)/(2π), evaluated by BSGS
     recurrences with every T_k rebased to scale Δ.
  4. slot_to_coeff: the inverse linear map, returning a fresh ciphertext of
     m at a usable level.

All matrices act in slot space; scale management uses the compensating-
plaintext-scale discipline from circuits/poly_eval.py.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Sequence, Tuple

import numpy as np

from hehub_tpu.circuits import poly_eval as pe
from hehub_tpu.core import rns
from hehub_tpu.core.context import CkksParams, Context
from hehub_tpu.models import ckks
from hehub_tpu.rlwe import rgsw as rgsw_mod


# ---------------------------------------------------------------------------
# Numeric derivation of the C2S / S2C matrices for our encoding layout
# ---------------------------------------------------------------------------


def _decode_matrix(n: int) -> np.ndarray:
    """W [n/2, n] with slots(c) = W·c for coefficient vectors c (scale 1) —
    computed from the same twist/ifft/slot-placement the encoder uses
    (models/ckks.py _slots_to_read), so it is layout-exact by construction."""
    from hehub_tpu.models.ckks import _slots_to_read

    W = np.empty((n // 2, n), dtype=np.complex128)
    for k in range(n):
        e = np.zeros(n)
        e[k] = 1.0
        W[:, k] = _slots_to_read(e, n, n // 2)
    return W


@functools.lru_cache(maxsize=None)
def _c2s_s2c_matrices(n: int):
    """(E, F, G, H, C1, C2) with
       coeff→slot (two REAL-slot outputs, since EvalMod's sine is not
       separable over packed complex slots):
           r  = E·s + F·conj(s)   slots r_j  = t_j
           im = G·s + H·conj(s)   slots im_j = t_{j+n/2}
       slot→coeff:
           s' = C1·r + C2·im      (s' = W·t for t = [r; im])
    where s = current slots = W·t."""
    s_cnt = n // 2
    W = _decode_matrix(n)
    M = np.vstack([W, np.conj(W)])  # [n, n]
    Minv = np.linalg.inv(M)
    P_re = np.zeros((s_cnt, n))
    P_re[:, :s_cnt] = np.eye(s_cnt)
    P_im = np.zeros((s_cnt, n))
    P_im[:, s_cnt:] = np.eye(s_cnt)
    EF = P_re @ Minv
    GH = P_im @ Minv
    E, F = EF[:, :s_cnt], EF[:, s_cnt:]
    G, H = GH[:, :s_cnt], GH[:, s_cnt:]
    C1 = W[:, :s_cnt]
    C2 = W[:, s_cnt:]
    return E, F, G, H, C1, C2


# ---------------------------------------------------------------------------
# BSGS slot-space linear transform
# ---------------------------------------------------------------------------


def _bsgs_split(s: int) -> Tuple[int, int]:
    b = 1 << max((s.bit_length() - 1) // 2, 0)
    g = (s + b - 1) // b
    return b, g


def linear_transform_steps(slot_count: int) -> List[int]:
    """Rotation steps required by linear_transform (negative steps are taken
    mod slot_count)."""
    B, G = _bsgs_split(slot_count)
    steps = [(-b) % slot_count for b in range(1, B)]
    steps += [(-g * B) % slot_count for g in range(1, G)]
    return sorted(set(steps))


def linear_transform(
    ctx: Context,
    params: CkksParams,
    M: np.ndarray,
    ct: ckks.CkksCt,
    rot_keys: Dict[int, rgsw_mod.RgswCt],
    target_scale: float = None,
) -> ckks.CkksCt:
    """Homomorphic z ↦ M·z on slots by the BSGS diagonal method.

    M: [s, s] complex plaintext matrix. Uses B+G−2 rotations instead of s−1
    (B·G ≥ s). Consumes one level (the diagonal mult_plain + closing
    rescale); output scale = (target_scale or Δ·q_drop)/q_drop.
    """
    s = params.dimension // 2
    if M.shape != (s, s):
        raise ValueError(f"matrix must be [{s},{s}]")
    B, G = _bsgs_split(s)
    lvl = ct.c0.limb_count
    q_drop = ctx.mod_list[lvl - 1]
    target = target_scale or params.initial_scaling_factor * q_drop
    pt_scale = target / ct.scaling_factor
    level_tag = len(params.moduli) - lvl

    # baby rotations z_b = rot(z, -b): slot j holds z[(j+b) mod s]
    babies = {0: ct}
    for b in range(1, B):
        step = (-b) % s
        babies[b] = ckks.rotate(ctx, ct, rot_keys[step], step)

    idx = np.arange(s)
    acc = None
    for g in range(G):
        inner = None
        for b in range(B):
            k = g * B + b
            if k >= s:
                break
            # diag_k[j] = M[j, (j+k) mod s], pre-rotated by +gB so the final
            # giant rotation lands it in place
            diag = M[idx, (idx + k) % s]
            if not np.any(diag):
                continue
            diag_rot = np.roll(diag, (g * B) % s)
            pt = ckks.encode(diag_rot, params, scaling_factor=pt_scale,
                             level=level_tag)
            term = ckks.mult_plain(ctx, babies[b], pt)
            inner = term if inner is None else ckks.add(ctx, inner, term)
        if inner is None:
            continue
        if g:
            step = (-g * B) % s
            inner = ckks.rotate(ctx, inner, rot_keys[step], step)
        acc = inner if acc is None else ckks.add(ctx, acc, inner)
    return ckks.rescale(ctx, acc)


# ---------------------------------------------------------------------------
# Pipeline stages
# ---------------------------------------------------------------------------


def mod_raise(ctx: Context, ct: ckks.CkksCt) -> ckks.CkksCt:
    """Reinterpret a 1-limb ciphertext over the full modulus chain: each
    coefficient x ∈ [0, q0) is lifted signed into every limb. The result
    decrypts to t = m + q0·I. Scaling factor becomes q0 so slots read t/q0."""
    import jax.numpy as jnp

    if ct.c0.limb_count != 1:
        raise ValueError("mod_raise expects a ciphertext at the last level")
    q0 = ctx.mod_list[ct.c0.limb_ids[0]]
    dst_ids = tuple(range(len(ctx.params.moduli)))
    q = ctx.rows("q", dst_ids)

    def lift(poly):
        x = rns.reduce_strict(
            ctx, rns.to_coeff(ctx, poly) if poly.form == rns.NTT else poly
        ).data  # [..., 1, n] strict mod q0
        half = np.uint32(q0 // 2)
        # x < q0 < 2*q_j for 30-bit primes, so x mod q_j is a single select,
        # and the negative branch x − q0 + q_j is nonnegative since q_j > q0/2
        lo = x - jnp.where(x >= q, q, np.uint32(0))
        hi = x + q - np.uint32(q0)
        lifted = jnp.where(x < half, lo, hi)
        return rns.to_ntt(ctx, rns.RnsPoly(lifted.astype(jnp.uint32), rns.COEFF, dst_ids))

    return ckks.CkksCt(lift(ct.c0), lift(ct.c1), float(q0))


def coeff_to_slot(
    ctx: Context,
    params: CkksParams,
    ct: ckks.CkksCt,
    rot_keys: Dict[int, rgsw_mod.RgswCt],
    conj_key: rgsw_mod.RgswCt,
) -> Tuple[ckks.CkksCt, ckks.CkksCt]:
    """Two REAL-slot outputs: (r, im) with r_j = t_j/scale and
    im_j = t_{j+n/2}/scale (4 matrix products + 1 conjugation, 1 level).
    EvalMod's sine approximation needs real arguments, so the coefficient
    halves cannot stay packed as r + i·im through the nonlinear stage."""
    E, F, G, H, _, _ = _c2s_s2c_matrices(params.dimension)
    ct_conj = ckks.conjugate(ctx, ct, conj_key)
    lvl = ct.c0.limb_count
    q_drop = ctx.mod_list[lvl - 1]
    target = params.initial_scaling_factor * q_drop
    lt = lambda M, c: linear_transform(ctx, params, M, c, rot_keys,
                                       target_scale=target)
    r = ckks.add(ctx, lt(E, ct), lt(F, ct_conj))
    im = ckks.add(ctx, lt(G, ct), lt(H, ct_conj))
    return r, im


def slot_to_coeff(
    ctx: Context,
    params: CkksParams,
    ct_re: ckks.CkksCt,
    ct_im: ckks.CkksCt,
    rot_keys: Dict[int, rgsw_mod.RgswCt],
) -> ckks.CkksCt:
    """Inverse packing from the two real-slot halves back to coefficients."""
    _, _, _, _, C1, C2 = _c2s_s2c_matrices(params.dimension)
    lvl = min(ct_re.c0.limb_count, ct_im.c0.limb_count)
    q_drop = ctx.mod_list[lvl - 1]
    target = params.initial_scaling_factor * q_drop
    from hehub_tpu.circuits import poly_eval as _pe

    ct_re = _pe.align_level(ctx, ct_re, lvl)
    ct_im = _pe.align_level(ctx, ct_im, lvl)
    tc = linear_transform(ctx, params, C1, ct_re, rot_keys, target_scale=target)
    td = linear_transform(ctx, params, C2, ct_im, rot_keys, target_scale=target)
    return ckks.add(ctx, tc, td)


def bootstrap_rotation_steps(params: CkksParams) -> List[int]:
    return linear_transform_steps(params.dimension // 2)


# ---------------------------------------------------------------------------
# EvalMod: Chebyshev sine approximation
# ---------------------------------------------------------------------------


def chebyshev_coeffs(fn, a: float, b: float, degree: int) -> np.ndarray:
    """Chebyshev interpolation coefficients of fn on [a, b] (numpy fit at
    Chebyshev nodes)."""
    k = np.arange(degree + 1)
    nodes = np.cos((2 * k + 1) * np.pi / (2 * (degree + 1)))
    x = 0.5 * (b - a) * nodes + 0.5 * (b + a)
    y = fn(x)
    c = np.polynomial.chebyshev.chebfit(nodes, y, degree)
    return c


def cheb_eval(
    ctx: Context,
    params: CkksParams,
    ct: ckks.CkksCt,
    coeffs: Sequence[float],
    rlk: rgsw_mod.RgswCt,
    interval: Tuple[float, float] = (-1.0, 1.0),
) -> ckks.CkksCt:
    """Evaluate Σ c_k·T_k(y) with y = affine(x) mapped onto [-1,1], building
    the Chebyshev basis by T_{2k} = 2T_k²−1 / T_{k+j} = 2T_kT_j − T_{k−j}
    with exact compensated-scale adds."""
    a, b = interval
    d = len(coeffs) - 1
    if d < 1:
        raise ValueError("need degree >= 1")
    # y = (2x − (a+b)) / (b − a): one plaintext mult + add, one level
    alpha = 2.0 / (b - a)
    beta = -(a + b) / (b - a)
    y = pe.poly_eval(ctx, params, ct, [beta, alpha], rlk)

    delta = params.initial_scaling_factor
    # invariant: every cached T_k sits at EXACTLY scale Δ — each product is
    # rebased back to Δ (1 extra level per recursion step), which keeps the
    # compensating scales ≥ 1 at any depth instead of collapsing as (Δ/q)^k
    T: Dict[int, ckks.CkksCt] = {1: y}

    def norm(c: ckks.CkksCt) -> ckks.CkksCt:
        if abs(c.scaling_factor / delta - 1.0) < 1e-12:
            return c
        return pe.rebase_scale(ctx, params, c, target=delta)

    def two_t_mult(i: int, j: int) -> ckks.CkksCt:
        prod = pe.mult_aligned(ctx, T[i], T[j], rlk)
        return norm(ckks.add(ctx, prod, prod))  # 2·T_i·T_j at scale Δ

    def sub_const(c: ckks.CkksCt, value: float) -> ckks.CkksCt:
        pt = ckks.encode(
            np.full(params.dimension // 2, value), params,
            scaling_factor=c.scaling_factor,
            level=len(params.moduli) - c.c0.limb_count,
        )
        return ckks.sub_plain(ctx, c, pt)

    def get_T(k: int) -> ckks.CkksCt:
        if k in T:
            return T[k]
        half = k // 2
        if k % 2 == 0:
            tk = sub_const(two_t_mult(half, half), 1.0)  # 2T_h² − 1
        else:
            get_T(half + 1)
            get_T(half)
            prod2 = two_t_mult(half + 1, half)  # at Δ
            t1 = pe.align_level(ctx, T[1], prod2.c0.limb_count)
            tk = ckks.sub(ctx, prod2, t1)  # scales match exactly (both Δ)
        T[k] = tk
        return tk

    for k in range(2, d + 1):
        get_T(k)

    # compensated sum: all terms at scale Δ, dropped to the minimum level
    lvl = min(t.c0.limb_count for t in T.values())
    q_drop = ctx.mod_list[lvl - 1]
    target = delta * q_drop
    acc = None
    for k in range(1, d + 1):
        if coeffs[k] == 0.0:
            continue
        t_k = pe.align_level(ctx, T[k], lvl)
        pt = ckks.encode(
            np.full(params.dimension // 2, coeffs[k]), params,
            scaling_factor=target / t_k.scaling_factor,
            level=len(params.moduli) - lvl,
        )
        term = ckks.mult_plain(ctx, t_k, pt)
        acc = term if acc is None else ckks.add(ctx, acc, term)
    if coeffs[0] != 0.0:
        pt0 = ckks.encode(
            np.full(params.dimension // 2, coeffs[0]), params,
            scaling_factor=target, level=len(params.moduli) - lvl,
        )
        acc = ckks.add_plain(ctx, acc, pt0)
    return ckks.rescale(ctx, acc)


def eval_mod(
    ctx: Context,
    params: CkksParams,
    ct: ckks.CkksCt,
    rlk: rgsw_mod.RgswCt,
    k_bound: int,
    degree: int = 31,
) -> ckks.CkksCt:
    """u ↦ (u mod 1) on slots for u = m/q0 + I, |I| ≤ k_bound, |m/q0| small:
    approximates sin(2πu)/(2π) on [−k_bound−½, k_bound+½]."""
    r = k_bound + 0.5
    c = chebyshev_coeffs(lambda x: np.sin(2 * np.pi * x) / (2 * np.pi),
                         -r, r, degree)
    return cheb_eval(ctx, params, ct, c, rlk, interval=(-r, r))


# ---------------------------------------------------------------------------
# Full pipeline
# ---------------------------------------------------------------------------


def bootstrap(
    ctx: Context,
    params: CkksParams,
    ct: ckks.CkksCt,
    rlk: rgsw_mod.RgswCt,
    rot_keys: Dict[int, rgsw_mod.RgswCt],
    conj_key: rgsw_mod.RgswCt,
    k_bound: int,
    degree: int = 31,
) -> ckks.CkksCt:
    """Refresh an exhausted ciphertext: input at 1 limb, output at
    (levels − consumed) limbs encrypting the same message.

    The message scale Δ_in must satisfy Δ_in·|v| ≪ q0 (the sine
    approximation sees m/q0 as the fractional part)."""
    raised = mod_raise(ctx, ct)  # scale q0, value t/q0
    z_re, z_im = coeff_to_slot(ctx, params, raised, rot_keys, conj_key)
    w_re = eval_mod(ctx, params, z_re, rlk, k_bound, degree)
    w_im = eval_mod(ctx, params, z_im, rlk, k_bound, degree)
    out = slot_to_coeff(ctx, params, w_re, w_im, rot_keys)
    # The output's coefficients represent m/q0 at the working scale Δ_w, so
    # they equal m·(Δ_w/q0): the message v = m/Δ_in therefore sits at an
    # effective scaling factor Δ_w·Δ_in/q0.
    q0 = ctx.mod_list[ct.c0.limb_ids[0]]
    return ckks.CkksCt(
        out.c0, out.c1, out.scaling_factor * ct.scaling_factor / float(q0)
    )
