"""Key-switching key generation: relinearization / conjugation / rotation
keys (≙ /root/reference/src/fhe/primitives/keys.h:19-83, keys.cpp:8-36).

A key-switching key from source key s' to key s is the RGSW encryption of s'
under s over the RNS base extended by the special prime(s) P = ∏ p_j, with
digit basis B_g — the hybrid/GHS approach. With digit grouping `alpha`
(limbs per digit), B_g is the integer ≡ P (mod every q_j of group g), ≡ 0
(mod the other q_j and mod P); only its residues over the extended base are
ever needed. alpha=1 reproduces the reference's per-limb basis (p mod q_i)·e_i
(keys.cpp:26-34). The source-key transforms (s², cycled s, conjugated s)
are pure host-side numpy on the key's NTT values, since keys are host
material.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from hehub_tpu.core import galois
from hehub_tpu.core.context import Context
from hehub_tpu.rlwe import rgsw as rgsw_mod
from hehub_tpu.rlwe import rlwe as rlwe_mod


def _ext_ids(ctx: Context) -> Tuple[int, ...]:
    if not ctx.special_indices:
        raise ValueError("context has no special modulus for key switching")
    return tuple(range(len(ctx.params.moduli))) + ctx.special_indices


def _basis_rows(ctx: Context, alpha: int) -> List[List[int]]:
    """Per-digit basis integers reduced mod every extended-base modulus:
    row g, column j holds B_g mod m_j."""
    mods = ctx.params.moduli
    l = len(mods)
    P = 1
    for p in ctx.params.special_mods:
        P *= int(p)
    ids_ext = _ext_ids(ctx)
    ext_mods = ctx.moduli_of(ids_ext)
    rows = []
    for g0 in range(0, l, alpha):
        grp = list(range(g0, min(g0 + alpha, l)))
        # B_g ≡ P mod q_j (j in group), 0 mod others and mod P; only the
        # residues matter, so rows carry P mod q_j on the group columns
        row = []
        for j, m in enumerate(ext_mods):
            if j in grp:
                row.append(P % int(m))
            else:
                row.append(0)
        rows.append(row)
    return rows


def ksk_gen(
    ctx: Context, src_ntt: np.ndarray, sk: rlwe_mod.RlweSk, key,
    alpha: int = 1, **dbg,
) -> rgsw_mod.RgswCt:
    """KSK(s' -> s): RGSW(s') under s (≙ RlweKsk ctor, keys.cpp:8-36).
    `src_ntt`: host uint32 [L_ext, n] strict NTT values of s' over all
    extended limbs. `alpha`: ciphertext limbs per decomposition digit."""
    ids_ext = _ext_ids(ctx)
    if alpha < 1 or 30 * alpha > 30 * ctx.num_special:
        raise ValueError(
            f"alpha={alpha} needs at least {alpha} special primes "
            f"(have {ctx.num_special})"
        )
    return rgsw_mod.rgsw_encrypt_rns(
        ctx, src_ntt, sk, key, ids_ext, _basis_rows(ctx, alpha), alpha, **dbg
    )


def _sk_sq_ntt(ctx: Context, sk: rlwe_mod.RlweSk) -> np.ndarray:
    qs = np.asarray(ctx.mod_list, np.uint64)[:, None]
    s = sk.ntt.astype(np.uint64)
    return (s * s % qs).astype(np.uint32)


def relin_key(
    ctx: Context, sk: rlwe_mod.RlweSk, key, alpha: int = 1, **dbg
) -> rgsw_mod.RgswCt:
    """KSK(s² -> s) (≙ get_relin_key, keys.h:42-44)."""
    return ksk_gen(ctx, _sk_sq_ntt(ctx, sk), sk, key, alpha=alpha, **dbg)


def conj_key(
    ctx: Context, sk: rlwe_mod.RlweSk, key, alpha: int = 1, **dbg
) -> rgsw_mod.RgswCt:
    """KSK(involution(s) -> s) (≙ get_conj_key, keys.h:54-56)."""
    src = sk.ntt[:, ::-1].copy()  # involution = value reversal in our layout
    return ksk_gen(ctx, src, sk, key, alpha=alpha, **dbg)


def rot_key(
    ctx: Context, sk: rlwe_mod.RlweSk, step: int, key, alpha: int = 1, **dbg
) -> rgsw_mod.RgswCt:
    """KSK(cycle(s, step) -> s) (≙ get_rot_key, keys.h:78-83)."""
    n = ctx.params.dimension
    idx = galois.cycle_indices(n, step % n)
    src = sk.ntt[:, idx].copy()
    return ksk_gen(ctx, src, sk, key, alpha=alpha, **dbg)
