"""Key-switching key generation: relinearization / conjugation / rotation
keys (≙ /root/reference/src/fhe/primitives/keys.h:19-83, keys.cpp:8-36).

A key-switching key from source key s' to key s is the RGSW encryption of s'
under s over the RNS base extended by the special prime p, with decomposition
basis (p mod q_i)·e_i — the hybrid/GHS approach. The source-key transforms
(s², cycled s, conjugated s) are pure host-side numpy on the key's NTT values,
since keys are host material.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from hehub_tpu.core import galois
from hehub_tpu.core.context import Context
from hehub_tpu.rlwe import rgsw as rgsw_mod
from hehub_tpu.rlwe import rlwe as rlwe_mod


def _ext_ids(ctx: Context) -> Tuple[int, ...]:
    if ctx.special_index is None:
        raise ValueError("context has no special modulus for key switching")
    return tuple(range(ctx.special_index)) + (ctx.special_index,)


def _basis(ctx: Context) -> Tuple[int, ...]:
    p = ctx.params.special_mod
    mods = ctx.params.moduli
    return tuple(p % q for q in mods)


def ksk_gen(
    ctx: Context, src_ntt: np.ndarray, sk: rlwe_mod.RlweSk, key, **dbg
) -> rgsw_mod.RgswCt:
    """KSK(s' -> s): RGSW(s') under s (≙ RlweKsk ctor, keys.cpp:8-36).
    `src_ntt`: host uint32 [L+1, n] strict NTT values of s' over all limbs."""
    ids_ext = _ext_ids(ctx)
    return rgsw_mod.rgsw_encrypt_rns(
        ctx, src_ntt, sk, key, ids_ext, _basis(ctx), **dbg
    )


def _sk_sq_ntt(ctx: Context, sk: rlwe_mod.RlweSk) -> np.ndarray:
    qs = np.asarray(ctx.mod_list, np.uint64)[:, None]
    s = sk.ntt.astype(np.uint64)
    return (s * s % qs).astype(np.uint32)


def relin_key(ctx: Context, sk: rlwe_mod.RlweSk, key, **dbg) -> rgsw_mod.RgswCt:
    """KSK(s² -> s) (≙ get_relin_key, keys.h:42-44)."""
    return ksk_gen(ctx, _sk_sq_ntt(ctx, sk), sk, key, **dbg)


def conj_key(ctx: Context, sk: rlwe_mod.RlweSk, key, **dbg) -> rgsw_mod.RgswCt:
    """KSK(involution(s) -> s) (≙ get_conj_key, keys.h:54-56)."""
    src = sk.ntt[:, ::-1].copy()  # involution = value reversal in our layout
    return ksk_gen(ctx, src, sk, key, **dbg)


def rot_key(
    ctx: Context, sk: rlwe_mod.RlweSk, step: int, key, **dbg
) -> rgsw_mod.RgswCt:
    """KSK(cycle(s, step) -> s) (≙ get_rot_key, keys.h:78-83)."""
    n = ctx.params.dimension
    idx = galois.cycle_indices(n, step % n)
    src = sk.ntt[:, idx].copy()
    return ksk_gen(ctx, src, sk, key, **dbg)
