"""Negacyclic NTT/INTT over uint32 RNS tensors — the TPU-native replacement
for the reference's scalar Harvey butterflies
(/root/reference/src/fhe/common/ntt.cpp:145-222).

Design (TPU-first):
  * No bit-reversal passes anywhere: forward is Cooley-Tukey DIT taking
    natural-order coefficients to bit-reversed-order values; inverse is
    Gentleman-Sande DIF taking bit-reversed values back to natural
    coefficients. Pointwise ops between them are order-agnostic, and the
    Galois/encoding layers are defined directly in this value order.
  * Stages are expressed as static reshapes + broadcasted Shoup multiplies on
    the last axes, so one call transforms an arbitrary batch of limbs
    [..., L, n] in a single fused XLA computation (the reference loops limb
    by limb, ntt.h:41-51).
  * Lazy arithmetic: inputs and outputs live in [0, 2q).

The n^-1 factor of the inverse transform is folded into the final stage's
twiddle/scalar (≙ the reference folding at ntt.cpp:210-222).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from hehub_tpu.ops import modarith as ma


def _tail_split(n: int) -> int:
    """Block size B: butterflies with gap < B run in a transposed layout so
    the vector (lane) axis never drops below 128 elements. One transpose in,
    one out — instead of log2(B) sub-lane relayout stages."""
    if n <= 256:
        return 1  # no tail; plain layout
    return 128


def _fwd_butterfly(lo, hi, w, w_sh, q, two_q):
    wh = ma.shoup_mul_lazy(hi, w, w_sh, q)
    return ma.add_lazy(lo, wh, two_q), ma.sub_lazy(lo, wh, two_q)


def ntt_fwd(data, tw, tw_sh, q, two_q):
    """Forward negacyclic NTT.

    data: [..., L, n] uint32, coefficients (natural order), lazy [0, 2q).
    tw/tw_sh: [L, n] twiddle tables (ψ^bitrev powers + Shoup companions).
    q/two_q: [L, 1].
    Returns values in bit-reversed order, lazy [0, 2q).

    Head stages (gap t >= B) run in natural layout [.., m, 2, t] (minor axis
    t wide); tail stages run transposed as [.., B, G] so the minor axis is
    G = n/B — one relayout instead of log2(B) sub-lane shuffles.
    """
    n = data.shape[-1]
    logn = n.bit_length() - 1
    lead = data.shape[:-1]  # includes L
    L = data.shape[-2]
    B = _tail_split(n)
    G = n // B
    q3, two_q3 = q[..., None], two_q[..., None]
    x = data
    s = 0
    while (n >> (s + 1)) >= B:  # head: gap t >= B
        m = 1 << s
        t = n >> (s + 1)
        w = tw[:, m : 2 * m][:, :, None]
        w_sh = tw_sh[:, m : 2 * m][:, :, None]
        x = x.reshape(*lead, m, 2, t)
        new_lo, new_hi = _fwd_butterfly(
            x[..., 0, :], x[..., 1, :], w, w_sh, q3, two_q3
        )
        x = jnp.stack([new_lo, new_hi], axis=-2).reshape(*lead, n)
        s += 1
    if s == logn:
        return x
    # tail: transpose to [.., B, G]; element [p, g] is original index g*B + p
    x = jnp.swapaxes(x.reshape(*lead, G, B), -1, -2)
    q4, two_q4 = q[..., None, None], two_q[..., None, None]
    for s in range(s, logn):
        t = n >> (s + 1)  # < B
        U = B // (2 * t)
        m_total = n // (2 * t)
        # block index of element g*B + p is g*U + (p >> log2(2t))
        w = np.asarray(tw[:, m_total : 2 * m_total]).reshape(L, G, U)
        w = w.swapaxes(-1, -2)[:, :, None, :]  # [L, U, 1, G]
        w_sh = np.asarray(tw_sh[:, m_total : 2 * m_total]).reshape(L, G, U)
        w_sh = w_sh.swapaxes(-1, -2)[:, :, None, :]
        x = x.reshape(*lead, U, 2, t, G)
        new_lo, new_hi = _fwd_butterfly(
            x[..., 0, :, :], x[..., 1, :, :], w, w_sh, q4, two_q4
        )
        x = jnp.stack([new_lo, new_hi], axis=-3).reshape(*lead, B, G)
    return jnp.swapaxes(x, -1, -2).reshape(*lead, n)


def ntt_inv(data, tw, tw_sh, q, two_q, tw_last, tw_last_sh, n_inv, n_inv_sh):
    """Inverse negacyclic NTT (bit-reversed values -> natural coefficients).

    tw_last/n_inv carry the folded n^-1 factor for the final stage.
    Output lazy [0, 2q). Mirror of ntt_fwd: small-gap stages first, in the
    transposed layout; large-gap stages in natural layout.
    """
    n = data.shape[-1]
    logn = n.bit_length() - 1
    lead = data.shape[:-1]
    L = data.shape[-2]
    B = _tail_split(n)
    G = n // B
    q3, two_q3 = q[..., None], two_q[..., None]
    x = data
    s = 0
    if B > 1:
        # small-gap stages (2t <= B) transposed: [.., B, G]
        x = jnp.swapaxes(x.reshape(*lead, G, B), -1, -2)
        q4, two_q4 = q[..., None, None], two_q[..., None, None]
        while 2 * (1 << s) <= B:
            t = 1 << s
            U = B // (2 * t)
            h_total = n // (2 * t)
            w = (
                np.asarray(tw[:, h_total : 2 * h_total])
                .reshape(L, G, U)
                .swapaxes(-1, -2)[:, :, None, :]
            )
            w_sh = (
                np.asarray(tw_sh[:, h_total : 2 * h_total])
                .reshape(L, G, U)
                .swapaxes(-1, -2)[:, :, None, :]
            )
            x = x.reshape(*lead, U, 2, t, G)
            lo, hi = x[..., 0, :, :], x[..., 1, :, :]
            new_lo = ma.add_lazy(lo, hi, two_q4)
            new_hi = ma.shoup_mul_lazy(lo + two_q4 - hi, w, w_sh, q4)
            x = jnp.stack([new_lo, new_hi], axis=-3).reshape(*lead, B, G)
            s += 1
        x = jnp.swapaxes(x, -1, -2).reshape(*lead, n)
    for s in range(s, logn):
        h = n >> (s + 1)  # number of blocks
        t = 1 << s  # gap
        last = h == 1
        x = x.reshape(*lead, h, 2, t)
        lo = x[..., 0, :]
        hi = x[..., 1, :]
        s_sum = lo + two_q3 - hi  # in [0, 4q), fine as Shoup input
        if last:
            w = tw_last[..., None]
            w_sh = tw_last_sh[..., None]
            new_lo = ma.shoup_mul_lazy(lo + hi, n_inv[..., None], n_inv_sh[..., None], q3)
        else:
            w = tw[:, h : 2 * h][:, :, None]
            w_sh = tw_sh[:, h : 2 * h][:, :, None]
            new_lo = ma.add_lazy(lo, hi, two_q3)
        new_hi = ma.shoup_mul_lazy(s_sum, w, w_sh, q3)
        x = jnp.stack([new_lo, new_hi], axis=-2).reshape(*lead, n)
    return x


# ---------------------------------------------------------------------------
# Context-level wrappers
# ---------------------------------------------------------------------------


def _pallas_ok(ctx, data) -> bool:
    from hehub_tpu import config

    # Measured on v5e (r3): the XLA stage chain beats the roll-based Pallas
    # kernel at every n <= 8192 (up to 7x at n=2048; re-confirmed r5 at
    # high row counts, scripts/probe_ntt_batch.py) and only loses at
    # n = 16384+ on bench-like shapes ([64, 7, 16384]: fwd 1.72 vs 2.70 us).
    # Below n=1024 the transposed tail's minor axis (n/128 < 8) also pads
    # too hard for Mosaic. The table-budget check keeps oversized
    # configurations off the kernel where embedded-constant size matters
    # (config.pallas_table_budget_mb).
    return (
        config.pallas_enabled()
        and data.shape[-1] >= 16384
        and config.pallas_tables_fit(data.shape[-2], data.shape[-1])
    )


def ntt(ctx, data, limb_ids: Tuple[int, ...]):
    """Forward NTT of [..., L, n] under the context limbs `limb_ids`."""
    if _pallas_ok(ctx, data):
        from hehub_tpu.ops.pallas import ntt_pallas

        return ntt_pallas.get_ntt(ctx, limb_ids, inverse=False)(data)
    return ntt_fwd(
        data,
        ctx.rows("tw_fwd", limb_ids),
        ctx.rows("tw_fwd_sh", limb_ids),
        ctx.rows("q", limb_ids),
        ctx.rows("two_q", limb_ids),
    )


def intt(ctx, data, limb_ids: Tuple[int, ...]):
    """Inverse NTT of [..., L, n] under the context limbs `limb_ids`."""
    if _pallas_ok(ctx, data):
        from hehub_tpu.ops.pallas import ntt_pallas

        return ntt_pallas.get_ntt(ctx, limb_ids, inverse=True)(data)
    return ntt_inv(
        data,
        ctx.rows("tw_inv", limb_ids),
        ctx.rows("tw_inv_sh", limb_ids),
        ctx.rows("q", limb_ids),
        ctx.rows("two_q", limb_ids),
        ctx.rows("tw_inv_last", limb_ids),
        ctx.rows("tw_inv_last_sh", limb_ids),
        ctx.rows("n_inv", limb_ids),
        ctx.rows("n_inv_sh", limb_ids),
    )


def ntt_single(tables, data):
    """Forward NTT under one ModulusTables (e.g. the BGV plain modulus).
    data: [..., n]."""
    out = ntt_fwd(
        data[..., None, :],
        tables.tw_fwd[None],
        tables.tw_fwd_sh[None],
        np.asarray([[tables.q]], np.uint32),
        np.asarray([[tables.two_q]], np.uint32),
    )
    return out[..., 0, :]


def intt_single(tables, data):
    out = ntt_inv(
        data[..., None, :],
        tables.tw_inv[None],
        tables.tw_inv_sh[None],
        np.asarray([[tables.q]], np.uint32),
        np.asarray([[tables.two_q]], np.uint32),
        np.asarray([[tables.tw_inv_last]], np.uint32),
        np.asarray([[tables.tw_inv_last_sh]], np.uint32),
        np.asarray([[tables.n_inv]], np.uint32),
        np.asarray([[tables.n_inv_sh]], np.uint32),
    )
    return out[..., 0, :]
