"""Batched lazy modular arithmetic over uint32 lanes — the TPU-native kernel
layer replacing the reference's 64-bit scalar kernels
(/root/reference/src/fhe/common/mod_arith.h:16-82, mod_arith.cpp:9-134).

Design (TPU-first, not a port):
  * All RNS limbs are 30-bit primes q in [2^29, 2^31); residues live in uint32
    vectors in the *lazy* range [0, 2q) — the same lazy convention the
    reference uses, but sized for the TPU's native 32-bit integer lanes
    instead of emulated 128-bit scalars.
  * 64-bit products are formed from 16-bit half-words (4 VPU multiplies), so
    every kernel here lowers to plain int32 VPU ops — valid both under jit on
    any backend and inside Pallas kernels.
  * Static operands (twiddles, keys, per-limb scalars) use Shoup
    multiplication: 2 low multiplies + 1 mulhi. Dynamic×dynamic products use
    Montgomery reduction with one operand pre-scaled by R = 2^32.

Shapes: all functions broadcast; per-limb constants are passed with shape
[..., L, 1] against data [..., L, n].
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32  # dtype
_MASK16 = np.uint32(0xFFFF)  # numpy scalar: safe inside Pallas kernels
_ZERO = np.uint32(0)


def mul_hi(a, b):
    """High 32 bits of the 64-bit product of two uint32 arrays."""
    a = a.astype(U32)
    b = b.astype(U32)
    ah, al = a >> 16, a & _MASK16
    bh, bl = b >> 16, b & _MASK16
    ll = al * bl
    lh = al * bh
    hl = ah * bl
    mid = (ll >> 16) + (lh & _MASK16) + (hl & _MASK16)
    return ah * bh + (lh >> 16) + (hl >> 16) + (mid >> 16)


def mul_wide(a, b):
    """(hi, lo) of the 64-bit product of two uint32 arrays."""
    return mul_hi(a, b), (a * b).astype(U32)


def add_lazy(a, b, two_q):
    """(a + b) keeping the lazy range: inputs [0, 2q) -> output [0, 2q)."""
    t = a + b
    return t - jnp.where(t >= two_q, two_q, _ZERO)


def sub_lazy(a, b, two_q):
    """(a - b) mod 2q-lazily: inputs [0, 2q) -> output [0, 2q)."""
    t = a + two_q - b
    return t - jnp.where(t >= two_q, two_q, _ZERO)


def neg_lazy(a, two_q):
    """(-a): input [0, 2q) -> output [0, 2q)."""
    t = two_q - a
    return t - jnp.where(t >= two_q, two_q, _ZERO)


def reduce_strict(a, q):
    """[0, 2q) -> [0, q). (≙ batched_reduce_strict, mod_arith.h:58-72)"""
    return a - jnp.where(a >= q, q, _ZERO)


def shoup_mul_lazy(x, w, w_shoup, q):
    """x * w mod q via Shoup's trick, for a *constant* w < q with
    w_shoup = floor(w * 2^32 / q).

    Valid for ANY uint32 x (not just lazy inputs); output in [0, 2q).
    This is the TPU analog of the Harvey lazy mulmod
    (/root/reference/src/fhe/common/mod_arith.h:74-78).
    """
    hi = mul_hi(x, w_shoup)
    return (x * w - hi * q).astype(U32)


def mont_mul_lazy(a, b, q, neg_qinv):
    """Montgomery product a * b * 2^-32 mod q.

    neg_qinv = (-q)^-1 mod 2^32. Inputs in [0, 2q) (requires 4q^2 < 2^32 * q,
    i.e. q < 2^30... actually 4q < 2^32, so q < 2^30 suffices for correctness
    with both operands lazy; with one operand strict any q < 2^31 works).
    Output in [0, 2q).
    """
    hi, lo = mul_wide(a, b)
    m = (lo * neg_qinv).astype(U32)
    mq_hi = mul_hi(m, q)
    carry = (lo != 0).astype(U32)
    return hi + mq_hi + carry


def mul_mod_lazy(a, b, q, neg_qinv, r_mod_q, r_shoup):
    """General dynamic×dynamic product a*b mod q, output [0, 2q).

    Implemented as montmul(a, b * R): one Shoup scale + one Montgomery
    multiply (≙ batched_mul_mod_hybrid_lazy, mod_arith.cpp:64-92, redesigned
    for 32-bit lanes).
    """
    b_mont = shoup_mul_lazy(b, r_mod_q, r_shoup, q)
    return mont_mul_lazy(a, b_mont, q, neg_qinv)


def reduce_add_lazy(x, axis: int, two_q):
    """Tree-sum along `axis` with lazy reduction after every pairwise add,
    keeping all partials in [0, 2q). O(log k) fused select chains."""
    import jax.numpy as jnp

    x = jnp.moveaxis(x, axis, 0)
    k = x.shape[0]
    while k > 1:
        half = k // 2
        s = add_lazy(x[:half], x[half : 2 * half], two_q)
        if k % 2:
            s = jnp.concatenate([s, x[2 * half : 2 * half + 1]], axis=0)
        x = s
        k = x.shape[0]
    return x[0]


def to_mont(a, q, neg_qinv, r2_mod_q):
    """a -> a * 2^32 mod q (Montgomery domain), via montmul(a, R^2)."""
    return mont_mul_lazy(a, r2_mod_q, q, neg_qinv)


def from_mont(a, q, neg_qinv):
    """a * 2^32 -> a mod q, via montmul(a, 1). Output [0, 2q)."""
    hi, lo = jnp.zeros_like(a), a.astype(U32)
    m = (lo * neg_qinv).astype(U32)
    mq_hi = mul_hi(m, q)
    carry = (lo != 0).astype(U32)
    return hi + mq_hi + carry
