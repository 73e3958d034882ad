"""Galois automorphisms as static gather permutations on NTT values
(≙ cycle/involution, /root/reference/src/fhe/common/permutation.cpp:28-75).

Our NTT stores the value of the polynomial at root ψ^(2*bitrev(j)+1) in slot
j (see ops/ntt.py). The automorphism σ_t: a(X) -> values move from exponent e
to exponent e*t mod 2n, where t = 3^step for slot rotations (Galois generator
3, ≙ GALOIS_GEN permutation.cpp:9) and t = -1 for conjugation.

In this layout conjugation (involution) is exactly index reversal
out[j] = in[n-1-j] — the same identity the reference's natural-order layout
enjoys (permutation.cpp:59-75) — and rotations are precomputed gathers.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from hehub_tpu.core.rns import NTT, RnsPoly


def _bitrev_vec(idx: np.ndarray, logn: int) -> np.ndarray:
    out = np.zeros_like(idx)
    for b in range(logn):
        out |= ((idx >> b) & 1) << (logn - 1 - b)
    return out


@functools.lru_cache(maxsize=None)
def cycle_indices(n: int, step: int) -> np.ndarray:
    """Gather indices g with out[j] = in[g[j]] for the rotation by `step`.

    Value at exponent e moves to exponent e * 3^step (mod 2n), matching the
    reference's root-index-factor convention (permutation.cpp:40-55)."""
    logn = n.bit_length() - 1
    t = pow(3, step, 2 * n)
    t_inv = pow(t, -1, 2 * n)
    j = np.arange(n, dtype=np.int64)
    e = 2 * _bitrev_vec(j, logn) + 1  # exponent of slot j
    src_e = (e * t_inv) % (2 * n)
    src = _bitrev_vec((src_e - 1) // 2, logn)
    return src.astype(np.int32)


def cycle(poly: RnsPoly, step: int) -> RnsPoly:
    """Slot rotation: O(n) permutation of NTT values (≙ permutation.cpp:28-57)."""
    if poly.form != NTT:
        raise ValueError("cycle expects NTT (value) form")
    n = poly.dimension
    idx = cycle_indices(n, step % n)
    return poly.with_data(jnp.take(poly.data, jnp.asarray(idx), axis=-1))


def involution(poly: RnsPoly) -> RnsPoly:
    """Conjugation: index reversal of NTT values (≙ permutation.cpp:59-75)."""
    if poly.form != NTT:
        raise ValueError("involution expects NTT (value) form")
    return poly.with_data(jnp.flip(poly.data, axis=-1))
