"""TEMPORARY perf probe for the Pallas INTT gap (fwd 1.72 vs inv 2.46 us
at n=16384). Times kernel VARIANTS on the real chip to locate the cost.
Not part of the library; deleted after the investigation.

Variants (perf-only; some are mathematically WRONG on purpose):
  fwd      - forward kernel (baseline)
  inv      - current inverse kernel (distributed GS)
  inv_noscale - inverse without the folded n^-1 final multiply
  inv_classic - late-multiply classic GS (mul after roll+sub)
  inv_headfirst - WRONG MATH: head stages first then tail, mimicking the
                  forward kernel's phase order, to test transpose placement
  inv_mix_ct  - classic GS tail + distributed head
  inv_mix_ch  - distributed tail + classic GS head
  inv_pre_t   - XLA transposes the input to [B, G] BEFORE the kernel, so
                the kernel starts on compute (no swap-at-load); transpose
                back mid-kernel as usual. Measures whether the initial
                in-kernel transpose is the 0.6 us.
  inv_lane    - ZERO transposes: tail stages run in natural [G, B] layout
                with rolls along the LANE axis (tables transposed on host).
  fwd_lane    - same trick for the forward kernel.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from hehub_tpu.core.context import create_ckks_params, make_context
from hehub_tpu.ops import modarith as ma
from hehub_tpu.ops.pallas import ntt_pallas as nk
from hehub_tpu.utils import profiling

B = nk.B


def _inv_variant_kernel(variant, n, bb, th_ref, th_sh_ref, tt_ref, tt_sh_ref,
                        scal_ref, x_ref, o_ref):
    from jax.experimental.pallas import tpu as pltpu

    logn = n.bit_length() - 1
    s_tail = nk._n_tail(n)
    G = n // B
    logb = B.bit_length() - 1
    q = scal_ref[0, 0, 0]
    two_q = scal_ref[0, 0, 1]
    n_inv = scal_ref[0, 0, 2]
    n_inv_sh = scal_ref[0, 0, 3]

    def tail_stage(x, s, p_ids):
        t = 1 << s
        w = tt_ref[0, s]
        w_sh = tt_sh_ref[0, s]
        is_hi = ((p_ids >> s) & 1) == 1
        if variant in ("inv_classic", "inv_mix_ct"):
            up_x = pltpu.roll(x, t, 1)
            down = pltpu.roll(x, B - t, 1)
            lo_out = ma.add_lazy(x, down, two_q)
            hi_out = ma.shoup_mul_lazy(up_x + two_q - x, w, w_sh, q)
        else:
            m = ma.shoup_mul_lazy(x, w, w_sh, q)
            up_m = pltpu.roll(m, t, 1)
            down = pltpu.roll(x, B - t, 1)
            lo_out = ma.add_lazy(x, down, two_q)
            hi_out = ma.sub_lazy(up_m, m, two_q)
        return jnp.where(is_hi, hi_out, lo_out)

    def head_stage(x, s, g_ids, scale_last):
        tg = 1 << (s - logb)
        w = th_ref[0, s - s_tail].reshape(G, B)
        w_sh = th_sh_ref[0, s - s_tail].reshape(G, B)
        is_hi = ((g_ids >> (s - logb)) & 1) == 1
        if variant in ("inv_classic", "inv_mix_ch", "inv_lane_classic"):
            up_x = pltpu.roll(x, tg, 1)
            down = pltpu.roll(x, G - tg, 1)
            if scale_last:
                lo_out = ma.shoup_mul_lazy(x + down, n_inv, n_inv_sh, q)
            else:
                lo_out = ma.add_lazy(x, down, two_q)
            hi_out = ma.shoup_mul_lazy(up_x + two_q - x, w, w_sh, q)
        else:
            m = ma.shoup_mul_lazy(x, w, w_sh, q)
            up_m = pltpu.roll(m, tg, 1)
            down = pltpu.roll(x, G - tg, 1)
            if scale_last:
                lo_out = ma.shoup_mul_lazy(x + down, n_inv, n_inv_sh, q)
            else:
                lo_out = ma.add_lazy(x, down, two_q)
            hi_out = ma.sub_lazy(up_m, m, two_q)
        return jnp.where(is_hi, hi_out, lo_out)

    noscale = variant == "inv_noscale"
    if variant in ("inv_lane", "inv_lane_classic", "fwd_lane"):
        # tables arrive transposed to natural [G, B]; rolls along LANES
        x = x_ref[0].reshape(bb, G, B)
        lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, B), 2)
        g_ids = jax.lax.broadcasted_iota(jnp.int32, (1, G, 1), 1)

        def tail_lane(x, s):
            t = 1 << s
            w = tt_ref[0, s]
            w_sh = tt_sh_ref[0, s]
            is_hi = ((lane_ids >> s) & 1) == 1
            if variant == "inv_lane_classic":
                up_x = pltpu.roll(x, t, 2)
                down = pltpu.roll(x, B - t, 2)
                lo_out = ma.add_lazy(x, down, two_q)
                hi_out = ma.shoup_mul_lazy(up_x + two_q - x, w, w_sh, q)
            else:
                m = ma.shoup_mul_lazy(x, w, w_sh, q)
                up_m = pltpu.roll(m, t, 2)
                down = pltpu.roll(x, B - t, 2)
                lo_out = ma.add_lazy(x, down, two_q)
                hi_out = ma.sub_lazy(up_m, m, two_q)
            return jnp.where(is_hi, hi_out, lo_out)

        if variant in ("inv_lane", "inv_lane_classic"):
            for s in range(s_tail):
                x = tail_lane(x, s)
            for s in range(s_tail, logn):
                x = head_stage(x, s, g_ids, scale_last=(s == logn - 1))
        else:  # fwd_lane: forward math, head first then lane-roll tail
            for s in range(logn - s_tail):
                t = n >> (s + 1)
                tg = t >> (B.bit_length() - 1)
                sbit = tg.bit_length() - 1
                w = th_ref[0, s].reshape(G, B)
                w_sh = th_sh_ref[0, s].reshape(G, B)
                wh = ma.shoup_mul_lazy(x, w, w_sh, q)
                down_wh = pltpu.roll(wh, G - tg, 1)
                up_x = pltpu.roll(x, tg, 1)
                is_hi = ((g_ids >> sbit) & 1) == 1
                lo_out = ma.add_lazy(x, down_wh, two_q)
                hi_out = ma.sub_lazy(up_x, wh, two_q)
                x = jnp.where(is_hi, hi_out, lo_out)
            for si in range(s_tail):
                s = (logn - s_tail) + si
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
        o_ref[0] = x.reshape(bb, n)
        return
    if variant == "inv_pre_t":
        # input arrives ALREADY transposed ([bb, B, G] flat): start on
        # compute, one in-kernel transpose (mid), natural-layout store
        x = x_ref[0].reshape(bb, B, G)
        p_ids = jax.lax.broadcasted_iota(jnp.int32, (1, B, 1), 1)
        for s in range(s_tail):
            x = tail_stage(x, s, p_ids)
        x = jnp.swapaxes(x, -1, -2)
        g_ids = jax.lax.broadcasted_iota(jnp.int32, (1, G, 1), 1)
        for s in range(s_tail, logn):
            x = head_stage(x, s, g_ids, scale_last=(s == logn - 1))
        o_ref[0] = x.reshape(bb, n)
        return
    x = x_ref[0].reshape(bb, G, B)
    if variant == "inv_headfirst":
        # WRONG MATH: head stages in natural layout FIRST (forward's phase
        # order), then transpose for the tail — perf probe only.
        g_ids = jax.lax.broadcasted_iota(jnp.int32, (1, G, 1), 1)
        for s in range(s_tail, logn):
            x = head_stage(x, s, g_ids, scale_last=(s == logn - 1))
        x = jnp.swapaxes(x, -1, -2)
        p_ids = jax.lax.broadcasted_iota(jnp.int32, (1, B, 1), 1)
        for s in range(s_tail):
            x = tail_stage(x, s, p_ids)
        x = jnp.swapaxes(x, -1, -2)
    else:
        x = jnp.swapaxes(x, -1, -2)
        p_ids = jax.lax.broadcasted_iota(jnp.int32, (1, B, 1), 1)
        for s in range(s_tail):
            x = tail_stage(x, s, p_ids)
        x = jnp.swapaxes(x, -1, -2)
        g_ids = jax.lax.broadcasted_iota(jnp.int32, (1, G, 1), 1)
        for s in range(s_tail, logn):
            x = head_stage(x, s, g_ids,
                           scale_last=(s == logn - 1 and not noscale))
    o_ref[0] = x.reshape(bb, n)


def make_variant(ctx, ids, variant):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = ctx.params.dimension
    logn = n.bit_length() - 1
    L = len(ids)
    G = n // B
    s_tail = nk._n_tail(n)
    s_head = logn - s_tail
    th, th_sh, tt, tt_sh = nk._full_tables(
        ctx, ids, inverse=(variant != "fwd_lane"))
    if variant in ("inv_lane", "inv_lane_classic", "fwd_lane"):
        tt = np.ascontiguousarray(np.swapaxes(tt, -1, -2))
        tt_sh = np.ascontiguousarray(np.swapaxes(tt_sh, -1, -2))
    tt_shape = tt.shape[1:]
    scal = np.zeros((L, 1, 8), np.uint32)
    scal[:, 0, 0] = ctx.rows("q", ids)[:, 0]
    scal[:, 0, 1] = ctx.rows("two_q", ids)[:, 0]
    scal[:, 0, 2] = ctx.rows("n_inv", ids)[:, 0]
    scal[:, 0, 3] = ctx.rows("n_inv_sh", ids)[:, 0]

    def run(data):
        R = data.shape[0] * L
        x = data.reshape(-1, L, n)
        x = jnp.swapaxes(x, 0, 1)
        Rb = x.shape[1]
        if variant == "inv_pre_t":
            x = jnp.swapaxes(x.reshape(L, Rb, G, B), -1, -2)
            x = x.reshape(L, Rb, n)
        bb = min(8, Rb)
        body = functools.partial(_inv_variant_kernel, variant, n, bb)
        out = pl.pallas_call(
            body,
            grid=(L, Rb // bb),
            in_specs=[
                pl.BlockSpec((1, s_head, n), lambda l, r: (l, 0, 0)),
                pl.BlockSpec((1, s_head, n), lambda l, r: (l, 0, 0)),
                pl.BlockSpec((1, *tt_shape), lambda l, r: (l, 0, 0, 0)),
                pl.BlockSpec((1, *tt_shape), lambda l, r: (l, 0, 0, 0)),
                pl.BlockSpec((1, 1, 8), lambda l, r: (l, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, bb, n), lambda l, r: (l, r, 0)),
            ],
            out_specs=pl.BlockSpec((1, bb, n), lambda l, r: (l, r, 0)),
            out_shape=jax.ShapeDtypeStruct((L, Rb, n), jnp.uint32),
            input_output_aliases={5: 0},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(th, th_sh, tt, tt_sh, scal, x)
        return jnp.swapaxes(out, 0, 1).reshape(data.shape)

    return run


def main():
    n, levels, batch = 16384, 7, 64
    params = create_ckks_params(n, scaling_bits=28, num_levels=levels - 1,
                                use_security_budget=False)
    ctx = make_context(params)
    ids = tuple(range(levels))
    L = len(ids)
    qs = np.asarray(ctx.moduli_of(ids), np.uint32)[:, None]
    rng = np.random.default_rng(3)
    data = jax.device_put(
        rng.integers(0, 1 << 31, (batch, L, n)).astype(np.uint32) % (2 * qs)
    )
    k = batch * L

    fwd = jax.jit(nk.get_ntt(ctx, ids, inverse=False))
    inv = jax.jit(nk.get_ntt(ctx, ids, inverse=True))
    results = {}
    t = profiling.device_time(fwd, (data,), iters=8, name="")
    results["fwd"] = t
    t = profiling.device_time(inv, (data,), iters=8, name="")
    results["inv"] = t

    ref_inv = np.asarray(inv(data))
    ref_fwd = np.asarray(fwd(data))
    # all documented variants by default; CLI args narrow to a subset
    # (e.g. `python scripts/probe_intt.py inv_lane_classic`)
    variants = tuple(sys.argv[1:]) or (
        "inv_noscale", "inv_classic", "inv_headfirst", "inv_mix_ch",
        "inv_pre_t", "inv_lane", "inv_lane_classic", "fwd_lane",
    )
    for variant in variants:
        ref = ref_fwd if variant.startswith("fwd") else ref_inv
        try:
            f = jax.jit(make_variant(ctx, ids, variant))
            out = np.asarray(f(data))
            ok = np.array_equal(out % qs, ref % qs)
            t = profiling.device_time(f, (data,), iters=8, name="")
            results[variant] = t
            print(f"{variant:14s}: {t*1e6/k:6.2f} us/tf  correct={ok}",
                  flush=True)
        except Exception as e:
            print(f"{variant:14s}: FAILED {type(e).__name__}: {e}",
                  flush=True)
    print(f"{'fwd':14s}: {results['fwd']*1e6/k:6.2f} us/tf", flush=True)
    print(f"{'inv':14s}: {results['inv']*1e6/k:6.2f} us/tf", flush=True)


if __name__ == "__main__":
    main()
