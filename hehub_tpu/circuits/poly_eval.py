"""Homomorphic polynomial evaluation and level/scale management for CKKS —
the circuits layer the reference planned but left as empty stubs
(/root/reference/src/circuits/fp_non_poly.h, cc_non_poly.h — 0 bytes each).

Scale discipline: with 30-bit primes and a 28-bit scaling factor, the scale
drifts after every rescale (Δ' = Δ²/q_last). Adding two terms therefore
requires *engineering* equal scales, not hoping for them. The standard trick
used here: plaintext coefficients are encoded at compensating scales
s_i = S_target / scale(x^i), so every term lands at exactly S_target and the
adds are exact. Multiplicative depth for degree d is ceil(log2 d).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from hehub_tpu.core.context import CkksParams, Context
from hehub_tpu.models import ckks
from hehub_tpu.rlwe import rgsw as rgsw_mod


def align_level(ctx: Context, ct: ckks.CkksCt, limb_count: int) -> ckks.CkksCt:
    """Drop limbs (without dividing) until ct has `limb_count` limbs."""
    extra = ct.c0.limb_count - limb_count
    if extra < 0:
        raise ValueError(f"cannot raise level: {ct.c0.limb_count} < {limb_count}")
    return ckks.mod_drop(ctx, ct, extra) if extra else ct


def mult_aligned(
    ctx: Context, a: ckks.CkksCt, b: ckks.CkksCt, rlk: rgsw_mod.RgswCt
) -> ckks.CkksCt:
    """ct-ct multiply with automatic level alignment + rescale."""
    lvl = min(a.c0.limb_count, b.c0.limb_count)
    prod = ckks.mult(ctx, align_level(ctx, a, lvl), align_level(ctx, b, lvl), rlk)
    return ckks.rescale(ctx, prod)


def power_basis(
    ctx: Context, ct: ckks.CkksCt, degree: int, rlk: rgsw_mod.RgswCt
) -> Dict[int, ckks.CkksCt]:
    """x^1..x^degree by binary decomposition: x^(2k) = (x^k)², x^(2k+1) =
    x^(2k)·x — depth ceil(log2 degree), each power rescaled once per mult."""
    if degree < 1:
        raise ValueError("degree must be >= 1")
    powers: Dict[int, ckks.CkksCt] = {1: ct}
    for i in range(2, degree + 1):
        if i in powers:
            continue
        half = i // 2
        powers[i] = (
            mult_aligned(ctx, powers[half], powers[half], rlk)
            if i % 2 == 0
            else mult_aligned(ctx, powers[i - 1], powers[1], rlk)
        )
    return powers


def poly_eval(
    ctx: Context,
    params: CkksParams,
    ct: ckks.CkksCt,
    coeffs: Sequence[float],
    rlk: rgsw_mod.RgswCt,
) -> ckks.CkksCt:
    """Evaluate p(x) = coeffs[0] + coeffs[1]·x + ... homomorphically.

    Every term c_i·x^i is brought to the level of the deepest power and to
    one common scale S = Δ·scale(x^d) via compensating plaintext scales, so
    the final adds are exact; one closing rescale returns scale S/q.
    """
    coeffs = list(coeffs)
    if len(coeffs) < 2:
        raise ValueError("need degree >= 1 (use add_plain for constants)")
    d = len(coeffs) - 1
    while d > 1 and coeffs[d] == 0.0:
        d -= 1
    powers = power_basis(ctx, ct, d, rlk)
    lvl = min(p.c0.limb_count for p in powers.values())
    # Anchor the output scale: the closing rescale divides by the dropped
    # modulus, so target = Δ·q_drop makes the result land at exactly Δ —
    # iterated polynomial maps (sign, minimax comps) keep full precision
    # instead of drifting toward scale ~1.
    q_drop = ctx.mod_list[lvl - 1]
    target = params.initial_scaling_factor * q_drop

    acc = None
    for i in range(1, d + 1):
        if coeffs[i] == 0.0:
            continue
        p_i = align_level(ctx, powers[i], lvl)
        s_i = target / p_i.scaling_factor
        pt = ckks.encode(
            np.full(params.dimension // 2, coeffs[i]),
            params,
            scaling_factor=s_i,
            level=len(params.moduli) - lvl,
        )
        term = ckks.mult_plain(ctx, p_i, pt)
        acc = term if acc is None else ckks.add(ctx, acc, term)
    if coeffs[0] != 0.0:
        pt0 = ckks.encode(
            np.full(params.dimension // 2, coeffs[0]),
            params,
            scaling_factor=target,
            level=len(params.moduli) - lvl,
        )
        acc = ckks.add_plain(ctx, acc, pt0)
    return ckks.rescale(ctx, acc)


def rebase_scale(
    ctx: Context, params: CkksParams, ct: ckks.CkksCt, target: float = None
) -> ckks.CkksCt:
    """Restore a drifted scaling factor to `target` (default Δ) exactly, at
    the cost of one level: multiply by the constant 1 encoded at the
    compensating scale target·q_drop/scale, then rescale."""
    target = target or params.initial_scaling_factor
    q_drop = ctx.mod_list[ct.c0.limb_ids[-1]]
    s = target * q_drop / ct.scaling_factor
    if s < 1.0:
        raise ValueError(
            f"cannot rebase: compensating scale {s} < 1 (scale already high)"
        )
    pt = ckks.encode(
        np.ones(params.dimension // 2),
        params,
        scaling_factor=s,
        level=len(params.moduli) - ct.c0.limb_count,
    )
    return ckks.rescale(ctx, ckks.mult_plain(ctx, ct, pt))


# ---------------------------------------------------------------------------
# Non-polynomial functions by polynomial iteration (the fp_non_poly /
# cc_non_poly plan, realized)
# ---------------------------------------------------------------------------


def inverse(
    ctx: Context,
    params: CkksParams,
    ct: ckks.CkksCt,
    rlk: rgsw_mod.RgswCt,
    iterations: int = 3,
    initial: float = 1.0,
) -> ckks.CkksCt:
    """1/x for x ∈ (0, 2) by Newton's iteration y ← y·(2 − x·y), starting
    from y₀ = `initial`. Depth: 1 level for the first (affine) step, then
    3 levels per iteration (two ct-ct mults + one scale rebase)."""
    two = np.full(params.dimension // 2, 2.0)
    y = None
    for _ in range(iterations):
        if y is None:
            # y1 = y0*(2 - x*y0): affine in x, one poly_eval of degree 1
            y = poly_eval(
                ctx, params, ct, [2.0 * initial, -initial * initial], rlk
            )
            continue
        lvl = min(ct.c0.limb_count, y.c0.limb_count)
        xy = mult_aligned(ctx, align_level(ctx, ct, lvl), y, rlk)
        pt2 = ckks.encode(
            two,
            params,
            scaling_factor=xy.scaling_factor,
            level=len(params.moduli) - xy.c0.limb_count,
        )
        t = ckks.sub_plain(ctx, xy, pt2)  # x·y − 2
        # y ← −y·(x·y − 2), then rebase the drifted scale back to Δ
        y = mult_aligned(ctx, y, t, rlk)
        y = ckks.CkksCt(
            ckks.rns.neg(ctx, y.c0), ckks.rns.neg(ctx, y.c1), y.scaling_factor
        )
        y = rebase_scale(ctx, params, y)
    return y


def sign(
    ctx: Context,
    params: CkksParams,
    ct: ckks.CkksCt,
    rlk: rgsw_mod.RgswCt,
    iterations: int = 2,
) -> ckks.CkksCt:
    """Smooth sign(x) for x ∈ [−1, 1] by iterating f(y) = 1.5·y − 0.5·y³
    (each pass sharpens toward ±1; depth 2 levels per iteration)."""
    y = ct
    for _ in range(iterations):
        y = poly_eval(ctx, params, y, [0.0, 1.5, 0.0, -0.5], rlk)
    return y
