"""Intra-transform NTT sharding: one polynomial's butterfly network spread
across a mesh axis (the sequence/context-parallel analog for FHE —
SURVEY.md §2.6 row 3; no referent in the single-core reference).

Layout: the length-n row is the [G, B] matrix (G = n/128 sublanes, B = 128
lanes) of the fused kernel, sharded on the G axis over D devices (a
contiguous slice of the natural coefficient order). The first log2(D)
forward stages pair rows on DIFFERENT devices — each is one `ppermute`
block swap + a local butterfly (the four-step/distributed-FFT exchange
pattern, riding ICI on real hardware). All remaining stages are local, with
per-device slices of the same per-element twiddle tables the fused kernel
uses. The inverse runs the mirror: local tail/head stages first, then the
log2(D) cross-device stages last.

Outputs are bitwise identical to ops/ntt.py on the same inputs
(tests/test_parallel.py::test_intra_transform_sharded_ntt)."""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hehub_tpu.ops import modarith as ma
from hehub_tpu.ops.pallas import ntt_pallas as ntp

B = ntp.B


def _plan(n: int, D: int):
    logn = n.bit_length() - 1
    G = n // B
    Gd = G // D
    if Gd < 1 or D & (D - 1):
        raise ValueError(f"need a power-of-two device count <= {G}")
    s_tail = ntp._n_tail(n)
    s_head = logn - s_tail
    s_cross = D.bit_length() - 1
    if s_cross > s_head:
        raise ValueError(f"too many devices for n={n}: {D} > {2**s_head}")
    return logn, G, Gd, s_tail, s_head, s_cross


@functools.lru_cache(maxsize=None)
def _sharded_tables(ctx, limb_ids: Tuple[int, ...], inverse: bool, D: int):
    """Per-device slices of the global per-element twiddle tables.

    cross  [D, L, s_cross, n/D]      — cross-device stage tables
    head   [D, L, s_head_loc, n/(2D)] — local head-stage tables
    tail   [D, L, s_tail, B/2, G/D]   — local tail-stage tables
    (+ Shoup companions for each)."""
    n = ctx.params.dimension
    logn, G, Gd, s_tail, s_head, s_cross = _plan(n, D)
    th, th_sh, tt, tt_sh = ntp._expanded_tables(ctx, limb_ids, inverse)
    L = len(limb_ids)
    s_head_loc = s_head - s_cross

    cross = np.empty((D, L, max(s_cross, 1), n // D), np.uint32)
    cross_sh = np.empty_like(cross)
    head = np.empty((D, L, max(s_head_loc, 1), n // (2 * D)), np.uint32)
    head_sh = np.empty_like(head)
    tail = np.empty((D, L, s_tail, B // 2, Gd), np.uint32)
    tail_sh = np.empty_like(tail)

    for ci in range(s_cross):
        # forward cross stage ci is global stage ci; inverse cross stage ci
        # is global stage logn-1-(s_cross-1-ci) -> table row index in th
        s_glob = ci if not inverse else logn - s_cross + ci
        row = s_glob if not inverse else s_glob - s_tail
        t = (n >> (s_glob + 1)) if not inverse else (1 << s_glob)
        tg = t // B
        dist = tg // Gd
        for d in range(D):
            d_lo = d & ~dist
            g0 = d_lo * Gd
            k = g0 // (2 * tg)
            off = k * t + (g0 - k * 2 * tg) * B
            cross[d, :, ci] = th[:, row, off : off + n // D]
            cross_sh[d, :, ci] = th_sh[:, row, off : off + n // D]

    for li in range(s_head_loc):
        row = (s_cross + li) if not inverse else li
        for d in range(D):
            off = d * (n // (2 * D))
            head[d, :, li] = th[:, row, off : off + n // (2 * D)]
            head_sh[d, :, li] = th_sh[:, row, off : off + n // (2 * D)]

    for si in range(s_tail):
        for d in range(D):
            tail[d, :, si] = tt[:, si, :, d * Gd : (d + 1) * Gd]
            tail_sh[d, :, si] = tt_sh[:, si, :, d * Gd : (d + 1) * Gd]

    for a in (cross, cross_sh, head, head_sh, tail, tail_sh):
        a.setflags(write=False)
    return cross, cross_sh, head, head_sh, tail, tail_sh


def _swap_perm(D: int, dist: int):
    return [(d, d ^ dist) for d in range(D)]


def make_sharded_ntt(
    ctx,
    limb_ids: Tuple[int, ...],
    mesh: Mesh,
    axis: str,
    inverse: bool = False,
):
    """Returns fn(data [..., L, n] sharded on the last axis over `axis`) ->
    same shape/sharding, computing the (i)NTT with cross-device butterflies
    over `axis`."""
    n = ctx.params.dimension
    D = mesh.shape[axis]
    logn, G, Gd, s_tail, s_head, s_cross = _plan(n, D)
    s_head_loc = s_head - s_cross
    L = len(limb_ids)
    tabs = _sharded_tables(ctx, limb_ids, inverse, D)
    if D < 2:
        raise ValueError("intra-transform sharding needs >= 2 devices")
    q = ctx.rows("q", limb_ids)[..., None]  # [L,1,1]
    two_q = ctx.rows("two_q", limb_ids)[..., None]
    n_inv = ctx.rows("n_inv", limb_ids)[..., None]
    n_inv_sh = ctx.rows("n_inv_sh", limb_ids)[..., None]
    q5 = q[..., None, None]  # [L,1,1,1,1] for the 5-D stage views
    two_q5 = two_q[..., None, None]

    def _cross_stage(x, ci, w, w_sh, is_inverse_last):
        """x: [..., L, Gd, B] local block. One cross-device butterfly."""
        s_glob = ci if not inverse else logn - s_cross + ci
        t = (n >> (s_glob + 1)) if not inverse else (1 << s_glob)
        dist = (t // B) // Gd
        idx = jax.lax.axis_index(axis)
        other = jax.lax.ppermute(x, axis, _swap_perm(D, dist))
        is_hi = (idx & dist) != 0
        lo = jnp.where(is_hi, other, x)
        hi = jnp.where(is_hi, x, other)
        wl = w[:, ci].reshape(L, Gd, B)
        wl_sh = w_sh[:, ci].reshape(L, Gd, B)
        if not inverse:  # CT butterfly
            wh = ma.shoup_mul_lazy(hi, wl, wl_sh, q)
            out_lo = ma.add_lazy(lo, wh, two_q)
            out_hi = ma.sub_lazy(lo, wh, two_q)
        else:  # GS butterfly (n^-1 folded into the last stage's table/scalar)
            if is_inverse_last:
                out_lo = ma.shoup_mul_lazy(lo + hi, n_inv, n_inv_sh, q)
            else:
                out_lo = ma.add_lazy(lo, hi, two_q)
            out_hi = ma.shoup_mul_lazy(lo + two_q - hi, wl, wl_sh, q)
        return jnp.where(is_hi, out_hi, out_lo)

    def body(x, cross, cross_sh, head, head_sh, tail, tail_sh):
        # x local: [..., L, n/D] -> [..., L, Gd, B]
        lead = x.shape[:-1]
        x = x.reshape(*lead, Gd, B)
        cross_t = (cross[0], cross_sh[0])
        head_t = (head[0], head_sh[0])
        tail_t = (tail[0], tail_sh[0])

        def local_head(x, li):
            row = (s_cross + li) if not inverse else li
            s_glob = row if not inverse else row + s_tail
            t = (n >> (s_glob + 1)) if not inverse else (1 << s_glob)
            tg = t // B
            m_loc = Gd // (2 * tg)
            w = head_t[0][:, li].reshape(L, m_loc, 1, tg, B)
            w_sh = head_t[1][:, li].reshape(L, m_loc, 1, tg, B)
            xm = x.reshape(*lead, m_loc, 2, tg, B)
            lo, hi = xm[..., 0:1, :, :], xm[..., 1:2, :, :]
            if not inverse:
                wh = ma.shoup_mul_lazy(hi, w, w_sh, q5)
                t_lo = ma.add_lazy(lo, wh, two_q5)
                t_hi = ma.sub_lazy(lo, wh, two_q5)
            else:
                t_lo = ma.add_lazy(lo, hi, two_q5)
                t_hi = ma.shoup_mul_lazy(lo + two_q5 - hi, w, w_sh, q5)
            return jnp.concatenate([t_lo, t_hi], axis=-3).reshape(*lead, Gd, B)

        def local_tail(x, si):
            t = (n >> (s_head + si + 1)) if not inverse else (1 << si)
            U = B // (2 * t)
            w = tail_t[0][:, si].reshape(L, U, 1, t, Gd)
            w_sh = tail_t[1][:, si].reshape(L, U, 1, t, Gd)
            xm = x.reshape(*lead, U, 2, t, Gd)
            lo, hi = xm[..., 0:1, :, :], xm[..., 1:2, :, :]
            if not inverse:
                wh = ma.shoup_mul_lazy(hi, w, w_sh, q5)
                t_lo = ma.add_lazy(lo, wh, two_q5)
                t_hi = ma.sub_lazy(lo, wh, two_q5)
            else:
                t_lo = ma.add_lazy(lo, hi, two_q5)
                t_hi = ma.shoup_mul_lazy(lo + two_q5 - hi, w, w_sh, q5)
            return jnp.concatenate([t_lo, t_hi], axis=-3).reshape(*lead, B, Gd)

        if not inverse:
            for ci in range(s_cross):
                x = _cross_stage(x, ci, *cross_t, False)
            for li in range(s_head_loc):
                x = local_head(x, li)
            x = jnp.swapaxes(x, -1, -2)  # [.., B, Gd]
            for si in range(s_tail):
                x = local_tail(x, si)
            x = jnp.swapaxes(x, -1, -2)
        else:
            x = jnp.swapaxes(x, -1, -2)
            for si in range(s_tail):
                x = local_tail(x, si)
            x = jnp.swapaxes(x, -1, -2)
            for li in range(s_head_loc):
                x = local_head(x, li)
            for ci in range(s_cross):
                x = _cross_stage(x, ci, *cross_t, ci == s_cross - 1)
        return x.reshape(*lead, n // D)

    def run(data):
        nd = data.ndim
        spec_x = P(*([None] * (nd - 1) + [axis]))
        spec_t3 = P(axis, None, None, None)
        spec_t4 = P(axis, None, None, None, None)
        f = shard_map(
            body,
            mesh=mesh,
            in_specs=(spec_x, spec_t3, spec_t3, spec_t3, spec_t3,
                      spec_t4, spec_t4),
            out_specs=spec_x,
        )
        return f(data, *tabs)

    return run
