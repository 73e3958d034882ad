"""Fused negacyclic NTT/INTT as a single Pallas TPU kernel.

The XLA stage-chain implementation (ops/ntt.py) makes one HBM round trip per
butterfly stage (log2 n passes). This kernel keeps a block of polynomial rows
resident in VMEM for the whole transform — one HBM read, one write — with all
butterflies on the VPU.

Butterflies are expressed with `pltpu.roll` + masked selects instead of
reshape/slice/concat: every stage reads the partner element via a cyclic
roll of the whole tile and blends lo/hi outputs with an iota mask.
This does the twiddle multiply at every position (2x the arithmetic of the
half-width formulation) but eliminates ALL per-stage relayouts, which
dominate on Mosaic — measured 6x faster for the inverse and ~2x for the
forward at n=16384 versus the reshape/concat formulation.

Layout: a row of length n is the [G, B] matrix (G = n/128 sublanes, B = 128
lanes) for the WHOLE transform. Stages with gap >= B pair rows along the G
(sublane) axis; stages with gap < B pair along the B axis with LANE-axis
rolls — Mosaic's lane shift is as cheap as the sublane one, and skipping
the two in-VMEM transposes of the earlier [B, G] tail formulation measured
fwd 1.72 -> 1.67 us and inv 2.46 -> 1.57 us at n=16384. The inverse
additionally uses the late-multiply classic GS butterfly (hi' =
(x[lo] - x[hi])·w), which beat the multiply-first distributed form by
another 0.12 us. Twiddle tables are host-expanded full-width per element
and per stage in natural [G, B] order, so the kernel never transposes.

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
    """Half-width per-element twiddles (hi elements only), host numpy.

    Returns (head [L, S_head, n/2], head_sh, tail [L, S_tail, B/2, G],
    tail_sh). Stage axis order matches kernel traversal: forward = natural
    stage order (head s=0.., tail continuing); inverse = tail first.
    Consumed by parallel/ntt_sharded.py (and as the source for the
    full-width kernel tables below)."""
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


@functools.lru_cache(maxsize=None)
def _full_tables(ctx, limb_ids: Tuple[int, ...], inverse: bool):
    """Full-width per-element kernel tables (+ Shoup): the stage twiddle at
    every HI position, zero at LO positions.

    head_full [L, s_head, n]      — flat in natural [G, B] order
    tail_full [L, s_tail, G, B]   — host-shaped 2-D per stage in NATURAL
                                    [G, B] order (the kernel's tail stages
                                    roll along the lane axis), so the
                                    kernel never reshapes or transposes.

    Forward tables put the twiddle at HI positions only (LO entries zero;
    the forward reads wh at hi positions exclusively). Inverse tables also
    carry it at LO positions — harmless for the classic-GS inverse kernel
    (which only selects the hi output of the multiply)."""
    n = ctx.params.dimension
    logn = n.bit_length() - 1
    G = n // B
    s_tail = _n_tail(n)
    s_head = logn - s_tail
    head, head_sh, tail, tail_sh = _expanded_tables(ctx, limb_ids, inverse)
    L = len(limb_ids)
    head_full = np.zeros((L, max(s_head, 1), n), np.uint32)
    head_full_sh = np.zeros_like(head_full)
    tail_full = np.zeros((L, max(s_tail, 1), B, G), np.uint32)
    tail_full_sh = np.zeros_like(tail_full)
    for s in range(logn):
        t = (1 << s) if inverse else (n >> (s + 1))
        if t >= B:  # head: natural order, hi half of each block
            row = (s - s_tail) if inverse else s
            hrow = row if not inverse else row  # head row index
            blocks = n // (2 * t)
            f = head_full[:, hrow].reshape(L, blocks, 2, t)
            fs = head_full_sh[:, hrow].reshape(L, blocks, 2, t)
            f[:, :, 1] = head[:, row].reshape(L, blocks, t)
            fs[:, :, 1] = head_sh[:, row].reshape(L, blocks, t)
            if inverse:  # distributed GS: w at lo positions too
                f[:, :, 0] = f[:, :, 1]
                fs[:, :, 0] = fs[:, :, 1]
        else:  # tail: transposed [B, G] layout, hi rows of each p-block
            row = s if inverse else s - s_head
            U = B // (2 * t)
            tl = tail[:, row].reshape(L, U, t, G)
            tls = tail_sh[:, row].reshape(L, U, t, G)
            f = tail_full[:, row].reshape(L, U, 2, t, G)
            fs = tail_full_sh[:, row].reshape(L, U, 2, t, G)
            f[:, :, 1] = tl
            fs[:, :, 1] = tls
            if inverse:
                f[:, :, 0] = tl
                fs[:, :, 0] = tls
    # kernel tail stages run in natural layout with lane rolls: [.., G, B]
    tail_full = np.ascontiguousarray(np.swapaxes(tail_full, -1, -2))
    tail_full_sh = np.ascontiguousarray(np.swapaxes(tail_full_sh, -1, -2))
    for a in (head_full, head_full_sh, tail_full, tail_full_sh):
        a.setflags(write=False)
    return head_full, head_full_sh, tail_full, tail_full_sh


def fwd_stage_chain(x, th_ref, th_sh_ref, tt_ref, tt_sh_ref, q, two_q,
                    n: int, bb: int):
    """The full forward butterfly chain on a VMEM-resident [bb, n] tile,
    roll-based, transpose-free. th_ref: [1, s_head, n] head tables
    (natural order); tt_ref: [1, s_tail, G, B] tail tables (natural
    order). Head stages roll along sublanes, tail stages along lanes.
    Rows are read straight from the refs. Shared by the standalone NTT
    kernel and the fused external-product kernel."""
    from jax.experimental.pallas import tpu as pltpu

    logn = n.bit_length() - 1
    G = n // B
    s_tail = _n_tail(n)
    s_head = logn - s_tail
    logb = B.bit_length() - 1
    x = x.reshape(bb, G, B)
    g_ids = jax.lax.broadcasted_iota(jnp.int32, (1, G, 1), 1)
    for s in range(s_head):  # head: gap t >= B, pair along G (sublanes)
        t = n >> (s + 1)
        tg = t >> logb
        sbit = tg.bit_length() - 1
        w = th_ref[0, s].reshape(G, B)
        w_sh = th_sh_ref[0, s].reshape(G, B)
        wh = ma.shoup_mul_lazy(x, w, w_sh, q)  # meaningful at hi rows
        down_wh = pltpu.roll(wh, G - tg, 1)    # wh[g+tg]
        up_x = pltpu.roll(x, tg, 1)            # x[g-tg]
        is_hi = ((g_ids >> sbit) & 1) == 1
        lo_out = ma.add_lazy(x, down_wh, two_q)
        hi_out = ma.sub_lazy(up_x, wh, two_q)
        x = jnp.where(is_hi, hi_out, lo_out)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, B), 2)
    for si in range(s_tail):  # tail: gap t < B, pair along B (lanes)
        s = s_head + si
        t = n >> (s + 1)
        sbit = t.bit_length() - 1
        w = tt_ref[0, si]
        w_sh = tt_sh_ref[0, si]
        wh = ma.shoup_mul_lazy(x, w, w_sh, q)
        down_wh = pltpu.roll(wh, B - t, 2)
        up_x = pltpu.roll(x, t, 2)
        is_hi = ((lane_ids >> sbit) & 1) == 1
        lo_out = ma.add_lazy(x, down_wh, two_q)
        hi_out = ma.sub_lazy(up_x, wh, two_q)
        x = jnp.where(is_hi, hi_out, lo_out)
    return x.reshape(bb, n)


def _fwd_kernel(n, bb, th_ref, th_sh_ref, tt_ref, tt_sh_ref, scal_ref, x_ref, o_ref):
    q = scal_ref[0, 0, 0]
    two_q = scal_ref[0, 0, 1]
    o_ref[0] = fwd_stage_chain(
        x_ref[0], th_ref, th_sh_ref, tt_ref, tt_sh_ref, q, two_q, n, bb
    )


def _inv_kernel(n, bb, th_ref, th_sh_ref, tt_ref, tt_sh_ref, scal_ref, x_ref, o_ref):
    """Classic-GS inverse, transpose-free: tail stages (gap t < B) roll
    along the LANE axis in natural [G, B] layout, head stages along
    sublanes. Each stage emits lo' = x[lo] + x[hi] and
    hi' = (x[lo] - x[hi])·w — the late multiply measured 0.12 us faster
    than the multiply-first distributed form, and dropping the two tail
    transposes another 0.6 us (2.46 -> 1.57 us/transform at n=16384,
    vs 1.67 forward). The Shoup input x[lo] + 2q - x[hi] < 4q < 2^32 is
    in Harvey's full uint32 domain. Lazy values differ from ops/ntt.py's
    representatives (equal mod q)."""
    from jax.experimental.pallas import tpu as pltpu

    logn = n.bit_length() - 1
    s_tail = _n_tail(n)
    G = n // B
    logb = B.bit_length() - 1
    q = scal_ref[0, 0, 0]
    two_q = scal_ref[0, 0, 1]
    n_inv = scal_ref[0, 0, 2]
    n_inv_sh = scal_ref[0, 0, 3]
    x = x_ref[0].reshape(bb, G, B)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, B), 2)
    for s in range(s_tail):  # tail first: gap t < B, pair along lanes
        t = 1 << s
        w = tt_ref[0, s]
        w_sh = tt_sh_ref[0, s]
        up_x = pltpu.roll(x, t, 2)      # x[p-t]
        down = pltpu.roll(x, B - t, 2)  # x[p+t]
        is_hi = ((lane_ids >> s) & 1) == 1
        lo_out = ma.add_lazy(x, down, two_q)
        hi_out = ma.shoup_mul_lazy(up_x + two_q - x, w, w_sh, q)
        x = jnp.where(is_hi, hi_out, lo_out)
    g_ids = jax.lax.broadcasted_iota(jnp.int32, (1, G, 1), 1)
    for s in range(s_tail, logn):
        tg = 1 << (s - logb)
        w = th_ref[0, s - s_tail].reshape(G, B)
        w_sh = th_sh_ref[0, s - s_tail].reshape(G, B)
        up_x = pltpu.roll(x, tg, 1)      # x[g-tg]
        down = pltpu.roll(x, G - tg, 1)  # x[g+tg]
        is_hi = ((g_ids >> (s - logb)) & 1) == 1
        if s == logn - 1:
            # n^-1 on the lo half; the hi half's w already folds it in
            lo_out = ma.shoup_mul_lazy(x + down, n_inv, n_inv_sh, q)
        else:
            lo_out = ma.add_lazy(x, down, two_q)
        hi_out = ma.shoup_mul_lazy(up_x + two_q - x, w, w_sh, q)
        x = jnp.where(is_hi, hi_out, lo_out)
    o_ref[0] = x.reshape(bb, n)


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
    th, th_sh, tt, tt_sh = _full_tables(ctx, limb_ids, inverse)
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
                pl.BlockSpec((1, s_head, n), lambda l, r: (l, 0, 0)),
                pl.BlockSpec((1, s_head, n), lambda l, r: (l, 0, 0)),
                pl.BlockSpec((1, s_tail, G, B), lambda l, r: (l, 0, 0, 0)),
                pl.BlockSpec((1, s_tail, G, B), lambda l, r: (l, 0, 0, 0)),
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
