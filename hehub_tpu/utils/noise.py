"""Noise / modulus-budget observability.

The reference only tracks scaling factors as ciphertext metadata (ckks.h:81,
bgv.h:32). Here the budget is queryable: given the secret key (a debug/ops
tool, like the reference's HEHUB_DEBUG modes), measure how much modulus
headroom a ciphertext has left before decryption wraps.
"""

from __future__ import annotations

import math
from typing import Tuple

import numpy as np

from hehub_tpu.core import basecnv
from hehub_tpu.core.context import Context
from hehub_tpu.rlwe import rlwe as rlwe_mod


def _decrypt_centered(ctx: Context, ct_pair, sk) -> Tuple[list, int]:
    poly = rlwe_mod.decrypt_core(ctx, rlwe_mod.RlweCt(*ct_pair), sk)
    resid = np.asarray(poly.data)
    mods = ctx.moduli_of(poly.limb_ids)
    flat = resid.reshape(-1, len(mods), resid.shape[-1])
    Q = math.prod(int(m) for m in mods)
    vals = []
    for b in range(flat.shape[0]):
        vals.extend(basecnv.compose_to_int(flat[b], mods))
    return vals, Q


def modulus_headroom_bits(ctx: Context, ct_pair, sk) -> float:
    """log2(Q/2) - log2(max |c0 + c1 s|): bits of room before wraparound.
    <= 0 means the ciphertext no longer decrypts correctly."""
    vals, Q = _decrypt_centered(ctx, ct_pair, sk)
    peak = max((abs(v) for v in vals), default=1)
    return math.log2(Q / 2) - math.log2(max(peak, 1))


def bgv_invariant_noise_bits(ctx: Context, ct, sk) -> float:
    """log2 |e| of the BGV invariant v = m + t*e (excludes the message)."""
    vals, Q = _decrypt_centered(ctx, (ct.c0, ct.c1), sk)
    t = ct.plain_modulus
    peak = 0
    for v in vals:
        m = v % t
        if m > t // 2:
            m -= t
        peak = max(peak, abs((v - m) // t))
    return math.log2(max(peak, 1))


def ckks_error_bits(ctx: Context, ct, sk, expected: np.ndarray, params) -> float:
    """log2 of the max slot error against the expected cleartext values."""
    from hehub_tpu.models import ckks

    got = ckks.decode(ckks.decrypt(ctx, ct, sk), params, count=len(expected))
    err = np.abs(got - np.asarray(expected)).max()
    return math.log2(max(err, 2.0**-60))
