"""Fused negacyclic NTT/INTT as a single Pallas TPU kernel.

The XLA stage-chain implementation (ops/ntt.py) makes one HBM round trip per
butterfly stage (log2 n passes). This kernel keeps a block of polynomial rows
resident in VMEM for the whole transform — one HBM read, one write, the
memory-bound speed-of-light — with all butterflies on the VPU.

Layout: a row of length n is processed as [G, B] with B = 128 lanes. Stages
with gap >= B run in natural layout (minor-axis splits keep the lane axis a
multiple of B >= 128, the only minor-axis reshape Mosaic supports); stages
with gap < B run after one in-VMEM transpose to [B, G], where every further
reshape is a pure sublane split with the minor axis fixed at G.

Twiddles are host-expanded per element and per stage, in exactly the geometry
the kernel consumes: head stages as [L, S_head, n/2] rows (minor split only),
tail stages as [L, S_tail, B/2, G] blocks (sublane split only) — Mosaic never
sees a lane-axis relayout. Their grid block index depends only on the limb
axis, so Pallas DMAs them once per limb and reuses them across row blocks.

Same math and same value ordering as ops/ntt.py; outputs are bitwise equal
(tests/test_pallas.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hehub_tpu.ops import modarith as ma

B = 128  # lane width = tail split


def _tail_layout(w_slice: np.ndarray, G: int, U: int, t: int) -> np.ndarray:
    """[m_total] stage twiddles -> per-element [B/2, G] transposed layout."""
    wT = w_slice.reshape(G, U).T  # [U, G]
    return np.broadcast_to(wT[:, None, :], (U, t, G)).reshape(B // 2, G)


def _n_tail(n: int) -> int:
    """Number of tail (gap < B) stages."""
    return min(B.bit_length() - 1, n.bit_length() - 1)


@functools.lru_cache(maxsize=None)
def _expanded_tables(ctx, limb_ids: Tuple[int, ...], inverse: bool):
    """Per-element twiddles in kernel geometry, host numpy.

    Returns (head [L, S_head, n/2], head_sh, tail [L, S_tail, B/2, G],
    tail_sh). Stage axis order matches kernel traversal: forward = natural
    stage order (head s=0.., tail continuing); inverse = tail first.
    """
    n = ctx.params.dimension
    logn = n.bit_length() - 1
    G = n // B
    s_tail = _n_tail(n)
    s_head = logn - s_tail
    name = "tw_inv" if inverse else "tw_fwd"
    tw = np.asarray(ctx.rows(name, limb_ids), np.uint32).copy()
    tw_sh = np.asarray(ctx.rows(name + "_sh", limb_ids), np.uint32).copy()
    if inverse:
        # fold n^-1 into the last stage's single twiddle (index 1)
        tw[:, 1] = ctx.rows("tw_inv_last", limb_ids)[:, 0]
        tw_sh[:, 1] = ctx.rows("tw_inv_last_sh", limb_ids)[:, 0]
    L = len(limb_ids)
    head = np.empty((L, s_head, n // 2), np.uint32)
    head_sh = np.empty_like(head)
    tail = np.empty((L, s_tail, B // 2, G), np.uint32)
    tail_sh = np.empty_like(tail)
    for s in range(logn):
        t = (1 << s) if inverse else (n >> (s + 1))
        blocks = n // (2 * t)
        sl = slice(blocks, 2 * blocks)
        if t >= B:  # head stage: natural [blocks, t] layout
            hs = s - s_tail if inverse else s
            head[:, hs] = np.repeat(tw[:, sl], t, axis=1)
            head_sh[:, hs] = np.repeat(tw_sh[:, sl], t, axis=1)
        else:  # tail stage: transposed [B/2, G] layout
            ts = s if inverse else s - s_head
            U = B // (2 * t)
            for k in range(L):
                tail[k, ts] = _tail_layout(tw[k, sl], G, U, t)
                tail_sh[k, ts] = _tail_layout(tw_sh[k, sl], G, U, t)
    for a in (head, head_sh, tail, tail_sh):
        a.setflags(write=False)
    return head, head_sh, tail, tail_sh


def _butterfly_fwd(lo, hi, w, w_sh, q, two_q):
    wh = ma.shoup_mul_lazy(hi, w, w_sh, q)
    return ma.add_lazy(lo, wh, two_q), ma.sub_lazy(lo, wh, two_q)


def fwd_stage_chain(x, th_ref, th_sh_ref, tt_ref, tt_sh_ref, q, two_q,
                    n: int, bb: int):
    """The full forward butterfly chain on a VMEM-resident [bb, n] tile.

    Every stage is a SUBLANE split with the lane axis fixed at width B:
    head stages (gap t >= B) view the row as [G, B] — elements pairing at
    gap t differ only in the sublane coordinate g (t/B rows apart) — and
    tail stages run after one transpose to [B, G]. Lane-axis reshapes per
    stage (the naive natural-layout formulation) make Mosaic emit a full
    cross-lane relayout per stage and run ~3x slower.

    th_ref/tt_ref are the kernel REFS for the twiddle blocks ([1, s_head,
    n/2] and [1, s_tail, B/2, G]) — per-stage rows must be read straight
    from the ref (th_ref[0, s]); slicing a materialized value instead
    produces a layout Mosaic cannot shape-cast. Shared by the standalone
    NTT kernel and the fused external-product kernel."""
    logn = n.bit_length() - 1
    G = n // B
    s_tail = _n_tail(n)
    s_head = logn - s_tail
    x = x.reshape(bb, G, B)
    for s in range(s_head):  # head: gap t >= B, [G, B] view, split G
        m = 1 << s
        tb = n >> (s + 1 + B.bit_length() - 1)  # t/B rows per half-block
        w = th_ref[0, s].reshape(m, 1, tb, B)
        w_sh = th_sh_ref[0, s].reshape(m, 1, tb, B)
        xm = x.reshape(bb, m, 2, tb, B)
        t_lo, t_hi = _butterfly_fwd(
            xm[:, :, 0:1, :, :], xm[:, :, 1:2, :, :], w, w_sh, q, two_q
        )
        x = jnp.concatenate([t_lo, t_hi], axis=2).reshape(bb, G, B)
    x = jnp.swapaxes(x, -1, -2)  # [bb, B, G]
    for si in range(s_tail):  # tail: gap t < B, transposed layout
        t = n >> (s_head + si + 1)
        U = B // (2 * t)
        w = tt_ref[0, si].reshape(U, 1, t, G)
        w_sh = tt_sh_ref[0, si].reshape(U, 1, t, G)
        xm = x.reshape(bb, U, 2, t, G)
        t_lo, t_hi = _butterfly_fwd(
            xm[:, :, 0:1, :, :], xm[:, :, 1:2, :, :], w, w_sh, q, two_q
        )
        x = jnp.concatenate([t_lo, t_hi], axis=2).reshape(bb, B, G)
    x = jnp.swapaxes(x, -1, -2)
    return x.reshape(bb, n)


def _fwd_kernel(n, bb, th_ref, th_sh_ref, tt_ref, tt_sh_ref, scal_ref, x_ref, o_ref):
    q = scal_ref[0, 0, 0]
    two_q = scal_ref[0, 0, 1]
    o_ref[0] = fwd_stage_chain(
        x_ref[0], th_ref, th_sh_ref, tt_ref, tt_sh_ref, q, two_q, n, bb,
    )


def _inv_kernel(n, bb, th_ref, th_sh_ref, tt_ref, tt_sh_ref, scal_ref, x_ref, o_ref):
    logn = n.bit_length() - 1
    s_tail = _n_tail(n)
    G = n // B
    q = scal_ref[0, 0, 0]
    two_q = scal_ref[0, 0, 1]
    n_inv = scal_ref[0, 0, 2]
    n_inv_sh = scal_ref[0, 0, 3]
    x = x_ref[0].reshape(bb, G, B)
    x = jnp.swapaxes(x, -1, -2)  # [bb, B, G]: tail (small gaps) first
    for si in range(s_tail):
        t = 1 << si
        U = B // (2 * t)
        w = tt_ref[0, si].reshape(U, 1, t, G)
        w_sh = tt_sh_ref[0, si].reshape(U, 1, t, G)
        xm = x.reshape(bb, U, 2, t, G)
        lo, hi = xm[:, :, 0:1, :, :], xm[:, :, 1:2, :, :]
        t_lo = ma.add_lazy(lo, hi, two_q)
        t_hi = ma.shoup_mul_lazy(lo + two_q - hi, w, w_sh, q)
        x = jnp.concatenate([t_lo, t_hi], axis=2).reshape(bb, B, G)
    x = jnp.swapaxes(x, -1, -2).reshape(bb, n)
    # NOTE: the inverse head runs in the natural minor-split layout — the
    # [G, B] sublane view that speeds the FORWARD head up by 20% makes the
    # inverse 25% slower (measured; the inverse's small-gap-first traversal
    # hits Mosaic's adjacent-sublane interleave worst case).
    for s in range(s_tail, logn):  # head
        t = 1 << s
        h = n >> (s + 1)
        w = th_ref[0, s - s_tail].reshape(h, 1, t)
        w_sh = th_sh_ref[0, s - s_tail].reshape(h, 1, t)
        xm = x.reshape(bb, h, 2, t)
        lo, hi = xm[:, :, 0:1, :], xm[:, :, 1:2, :]
        diff = lo + two_q - hi
        if s == logn - 1:
            t_lo = ma.shoup_mul_lazy(lo + hi, n_inv, n_inv_sh, q)
        else:
            t_lo = ma.add_lazy(lo, hi, two_q)
        t_hi = ma.shoup_mul_lazy(diff, w, w_sh, q)
        x = jnp.concatenate([t_lo, t_hi], axis=2).reshape(bb, n)
    o_ref[0] = x


def make_ntt(ctx, limb_ids: Tuple[int, ...], inverse: bool, interpret: bool = False):
    """Returns fn(data [..., L, n]) -> same shape, running the fused kernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = ctx.params.dimension
    logn = n.bit_length() - 1
    L = len(limb_ids)
    assert n >= 2 * B, "pallas NTT requires n >= 256"
    G = n // B
    s_tail = _n_tail(n)
    s_head = logn - s_tail
    th, th_sh, tt, tt_sh = _expanded_tables(ctx, limb_ids, inverse)
    scal = np.zeros((L, 1, 8), np.uint32)
    scal[:, 0, 0] = ctx.rows("q", limb_ids)[:, 0]
    scal[:, 0, 1] = ctx.rows("two_q", limb_ids)[:, 0]
    scal[:, 0, 2] = ctx.rows("n_inv", limb_ids)[:, 0]
    scal[:, 0, 3] = ctx.rows("n_inv_sh", limb_ids)[:, 0]
    kern = _inv_kernel if inverse else _fwd_kernel

    def run(data):
        lead = data.shape[:-2]
        R = max(int(np.prod(lead)), 1)
        x = data.reshape(-1, L, n)
        x = jnp.swapaxes(x, 0, 1)  # [L, R, n]
        # block second-minor dim must be a multiple of 8 or equal to R:
        # pad the row axis up to a multiple of 8 when needed
        pad = (-R) % 8 if R > 8 else 0
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros((L, pad, n), jnp.uint32)], axis=1
            )
        Rp = R + pad
        bb = min(8, Rp)
        body = functools.partial(kern, n, bb)
        out = pl.pallas_call(
            body,
            grid=(L, Rp // bb),
            in_specs=[
                pl.BlockSpec((1, s_head, n // 2), lambda l, r: (l, 0, 0)),
                pl.BlockSpec((1, s_head, n // 2), lambda l, r: (l, 0, 0)),
                pl.BlockSpec((1, s_tail, B // 2, G), lambda l, r: (l, 0, 0, 0)),
                pl.BlockSpec((1, s_tail, B // 2, G), lambda l, r: (l, 0, 0, 0)),
                pl.BlockSpec((1, 1, 8), lambda l, r: (l, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, bb, n), lambda l, r: (l, r, 0)),
            ],
            out_specs=pl.BlockSpec((1, bb, n), lambda l, r: (l, r, 0)),
            out_shape=jax.ShapeDtypeStruct((L, Rp, n), jnp.uint32),
            input_output_aliases={5: 0},
            compiler_params=None
            if interpret
            else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(th, th_sh, tt, tt_sh, scal, x)
        out = out[:, :R] if pad else out
        return jnp.swapaxes(out, 0, 1).reshape(*lead, L, n)

    return run


@functools.lru_cache(maxsize=None)
def get_ntt(ctx, limb_ids: Tuple[int, ...], inverse: bool):
    """Cached kernel factory (one compiled family per context/limb set)."""
    return make_ntt(ctx, limb_ids, inverse)
