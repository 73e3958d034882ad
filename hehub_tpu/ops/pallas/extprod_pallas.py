"""Fused external product (key switching) as one Pallas kernel per output
limb — the framework's hottest compound op (≙ ext_prod_montgomery,
/root/reference/src/fhe/primitives/rgsw.cpp:57-156).

The XLA path materializes the [batch, l, l+1, n] digit matrix in HBM twice
(broadcast then NTT). This kernel keeps everything in VMEM per output limb:
for each (output limb j, row block): load the l coefficient-form digit rows,
run the l forward NTTs under q_j in-register, and contract against the two
key columns with Montgomery multiplies — one HBM read of the digits per
output limb and one write of the two accumulator rows, no intermediates.

Bitwise identical to rgsw.ext_prod's XLA path (same op order)."""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hehub_tpu.ops import modarith as ma
from hehub_tpu.ops.pallas import ntt_pallas as ntp


def _kernel(n, bb, l, th_ref, th_sh_ref, tt_ref, tt_sh_ref, scal_ref,
            dig_ref, key_ref, o_ref):
    """Grid (L_ext, R/bb). Blocks:
    th/tt: per-j full-width twiddles (head [1, s_head, n], tail natural
    [1, s_tail, G, B]); scal [1,1,8] SMEM (q, two_q, neg_qinv of limb j);
    dig [bb, l, n] strict coeff digits;
    key [1, l, 2, n] Montgomery-domain key column j; out [1, bb, 2, n]."""
    q = scal_ref[0, 0, 0]
    two_q = scal_ref[0, 0, 1]
    neg_qinv = scal_ref[0, 0, 2]
    x = dig_ref[:].reshape(bb * l, n)
    x = ntp.fwd_stage_chain(
        x, th_ref, th_sh_ref, tt_ref, tt_sh_ref, q, two_q, n, bb * l,
    ).reshape(bb, l, n)

    acc0 = None
    acc1 = None
    for i in range(l):
        p0 = ma.mont_mul_lazy(x[:, i, :], key_ref[0, i, 0], q, neg_qinv)
        p1 = ma.mont_mul_lazy(x[:, i, :], key_ref[0, i, 1], q, neg_qinv)
        acc0 = p0 if acc0 is None else ma.add_lazy(acc0, p0, two_q)
        acc1 = p1 if acc1 is None else ma.add_lazy(acc1, p1, two_q)
    o_ref[0] = jnp.stack([acc0, acc1], axis=1)  # [bb, 2, n]


def _kernel_conv(n, bb, D, th_ref, th_sh_ref, tt_ref, tt_sh_ref, scal_ref,
                 dig_ref, key_ref, o_ref):
    """Like _kernel, but digits are PRE-CONVERTED per target limb (alpha>1
    hybrid key switching): dig block [1, bb, D, n] holds limb j's converted
    digits; key [1, D, 2, n] is the key column j."""
    q = scal_ref[0, 0, 0]
    two_q = scal_ref[0, 0, 1]
    neg_qinv = scal_ref[0, 0, 2]
    x = dig_ref[0].reshape(bb * D, n)
    x = ntp.fwd_stage_chain(
        x, th_ref, th_sh_ref, tt_ref, tt_sh_ref, q, two_q, n, bb * D,
    ).reshape(bb, D, n)
    acc0 = None
    acc1 = None
    for g in range(D):
        p0 = ma.mont_mul_lazy(x[:, g, :], key_ref[0, g, 0], q, neg_qinv)
        p1 = ma.mont_mul_lazy(x[:, g, :], key_ref[0, g, 1], q, neg_qinv)
        acc0 = p0 if acc0 is None else ma.add_lazy(acc0, p0, two_q)
        acc1 = p1 if acc1 is None else ma.add_lazy(acc1, p1, two_q)
    o_ref[0] = jnp.stack([acc0, acc1], axis=1)  # [bb, 2, n]


@functools.lru_cache(maxsize=None)
def make_ext_prod_converted(ctx, D: int, ids_ext: Tuple[int, ...],
                            interpret: bool = False):
    """Fused kernel for alpha>1 hybrid KS: digits are already base-converted
    per target limb. Returns fn(digits [L_ext, R, D, n] coeff-form lazy,
    key [L_ext, D, 2, n]) -> out [L_ext, R, 2, n] (lazy NTT values)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = ctx.params.dimension
    L_ext = len(ids_ext)
    logn = n.bit_length() - 1
    G = n // ntp.B
    s_tail = ntp._n_tail(n)
    s_head = logn - s_tail
    th, th_sh, tt, tt_sh = ntp._full_tables(ctx, ids_ext, False)
    scal = np.zeros((L_ext, 1, 8), np.uint32)
    scal[:, 0, 0] = ctx.rows("q", ids_ext)[:, 0]
    scal[:, 0, 1] = ctx.rows("two_q", ids_ext)[:, 0]
    scal[:, 0, 2] = ctx.rows("neg_qinv", ids_ext)[:, 0]

    def run(digits, key):
        R = digits.shape[1]
        bb = 1  # single-row blocks measured fastest on v5e at n=16384
        pad = (-R) % bb
        if pad:
            z = jnp.zeros((L_ext, pad, D, n), jnp.uint32)
            digits = jnp.concatenate([digits, z], axis=1)
        Rp = R + pad
        body = functools.partial(_kernel_conv, n, bb, D)
        out = pl.pallas_call(
            body,
            grid=(L_ext, Rp // bb),
            in_specs=[
                pl.BlockSpec((1, s_head, n), lambda j, r: (j, 0, 0)),
                pl.BlockSpec((1, s_head, n), lambda j, r: (j, 0, 0)),
                pl.BlockSpec((1, s_tail, G, ntp.B), lambda j, r: (j, 0, 0, 0)),
                pl.BlockSpec((1, s_tail, G, ntp.B), lambda j, r: (j, 0, 0, 0)),
                pl.BlockSpec((1, 1, 8), lambda j, r: (j, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, bb, D, n), lambda j, r: (j, r, 0, 0)),
                pl.BlockSpec((1, D, 2, n), lambda j, r: (j, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, bb, 2, n), lambda j, r: (j, r, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((L_ext, Rp, 2, n), jnp.uint32),
            compiler_params=None
            if interpret
            else pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
            interpret=interpret,
        )(th, th_sh, tt, tt_sh, scal, digits, key)
        return out[:, :R] if pad else out

    return run


@functools.lru_cache(maxsize=None)
def make_ext_prod(ctx, ids: Tuple[int, ...], ids_ext: Tuple[int, ...],
                  interpret: bool = False):
    """Returns fn(digits [R, l, n], key [L_ext, l, 2, n])
    -> out [L_ext, R, 2, n] (lazy NTT values).

    digits: strict coeff-form residues of limb i under q_i, valid lazy
    inputs under every q_j (30-bit primes). key: the RGSW rows transposed to
    put the output-limb axis first (host-side rearrange, done once per key).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = ctx.params.dimension
    l = len(ids)
    L_ext = len(ids_ext)
    logn = n.bit_length() - 1
    G = n // ntp.B
    s_tail = ntp._n_tail(n)
    s_head = logn - s_tail
    th, th_sh, tt, tt_sh = ntp._full_tables(ctx, ids_ext, False)
    scal = np.zeros((L_ext, 1, 8), np.uint32)
    scal[:, 0, 0] = ctx.rows("q", ids_ext)[:, 0]
    scal[:, 0, 1] = ctx.rows("two_q", ids_ext)[:, 0]
    scal[:, 0, 2] = ctx.rows("neg_qinv", ids_ext)[:, 0]

    def run(digits, key):
        R = digits.shape[0]
        bb = 1  # single-row blocks measured fastest on v5e at n=16384
        # (0.106 ms/op vs 0.139 at bb=2, 0.160 at bb=4, batch 64, L=7)
        pad = (-R) % bb
        if pad:
            z = jnp.zeros((pad, l, n), jnp.uint32)
            digits = jnp.concatenate([digits, z], axis=0)
        Rp = R + pad
        body = functools.partial(_kernel, n, bb, l)
        out = pl.pallas_call(
            body,
            grid=(L_ext, Rp // bb),
            in_specs=[
                pl.BlockSpec((1, s_head, n), lambda j, r: (j, 0, 0)),
                pl.BlockSpec((1, s_head, n), lambda j, r: (j, 0, 0)),
                pl.BlockSpec((1, s_tail, G, ntp.B), lambda j, r: (j, 0, 0, 0)),
                pl.BlockSpec((1, s_tail, G, ntp.B), lambda j, r: (j, 0, 0, 0)),
                pl.BlockSpec((1, 1, 8), lambda j, r: (j, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((bb, l, n), lambda j, r: (r, 0, 0)),
                pl.BlockSpec((1, l, 2, n), lambda j, r: (j, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, bb, 2, n), lambda j, r: (j, r, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((L_ext, Rp, 2, n), jnp.uint32),
            compiler_params=None
            if interpret
            else pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
            interpret=interpret,
        )(th, th_sh, tt, tt_sh, scal, digits, key)
        return out[:, :R] if pad else out

    return run
