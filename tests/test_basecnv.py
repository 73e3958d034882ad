"""General k->m RNS base conversion — the case the reference throws
"under development" on (/root/reference/src/fhe/common/rns_transform.cpp:123)
— verified against the exact host CRT oracle."""

import numpy as np
import pytest

import jax

from hehub_tpu.core import basecnv, rns
from hehub_tpu.core.context import RlweParams, make_context
from hehub_tpu.ops import modarith as ma
from hehub_tpu.utils import hostmath as hm


def _ctx(n=64, limbs=5):
    primes = hm.gen_ntt_primes(30, limbs, n)
    params = RlweParams(dimension=n, moduli=tuple(primes))
    return make_context(params)


def _oracle(resid, src_mods, dst_mods, signed=True):
    ints = hm.crt_compose([np.asarray(r) for r in resid], list(src_mods))
    Q = 1
    for q in src_mods:
        Q *= int(q)
    if signed:
        ints = [hm.to_signed(x, Q) for x in ints]
    return np.stack(
        [np.asarray([x % p for x in ints], np.uint32) for p in dst_mods]
    )


@pytest.mark.parametrize("k,m", [(2, 3), (3, 2), (3, 1), (1, 4), (4, 4)])
def test_base_convert_random(k, m):
    ctx = _ctx(limbs=max(k, m) + 1)
    n = ctx.params.dimension
    src_ids = tuple(range(k))
    dst_ids = tuple(range(len(ctx.mod_list) - m, len(ctx.mod_list)))
    src_mods = ctx.moduli_of(src_ids)
    dst_mods = ctx.moduli_of(dst_ids)
    rng = np.random.default_rng(k * 10 + m)
    resid = np.stack(
        [rng.integers(0, q, n).astype(np.uint32) for q in src_mods]
    )
    poly = rns.RnsPoly(resid, rns.COEFF, src_ids)
    out = basecnv.base_convert(ctx, poly, dst_ids)
    got = np.asarray(ma.reduce_strict(out.data, ctx.rows("q", dst_ids)))
    want = _oracle(resid, src_mods, dst_mods, signed=True)
    np.testing.assert_array_equal(got, want)


def test_base_convert_structured_values():
    """Exact small/negative/large integers survive the signed lift."""
    ctx = _ctx(limbs=4)
    n = ctx.params.dimension
    src_ids = (0, 1)
    dst_ids = (2, 3)
    src_mods = ctx.moduli_of(src_ids)
    dst_mods = ctx.moduli_of(dst_ids)
    Q = int(src_mods[0]) * int(src_mods[1])
    # stay > k*2^-32*Q away from the ±Q/2 signed-lift boundary — inside that
    # band the 0.32 fixed-point v is ambiguous by contract (see base_convert)
    near = Q // 2 - (1 << 32)
    vals = [0, 1, -1, 12345, -12345, Q // 4, -(Q // 4), near, -near]
    ints = (vals * ((n // len(vals)) + 1))[:n]
    resid = hm.decompose_rns(ints, list(src_mods))
    poly = rns.RnsPoly(np.asarray(resid, np.uint32), rns.COEFF, src_ids)
    out = basecnv.base_convert(ctx, poly, dst_ids)
    got = np.asarray(ma.reduce_strict(out.data, ctx.rows("q", dst_ids)))
    want = np.stack(
        [np.asarray([x % p for x in ints], np.uint32) for p in dst_mods]
    )
    np.testing.assert_array_equal(got, want)


def test_base_convert_unsigned():
    ctx = _ctx(limbs=4)
    n = ctx.params.dimension
    src_ids = (0, 1, 2)
    dst_ids = (3,)
    src_mods = ctx.moduli_of(src_ids)
    rng = np.random.default_rng(9)
    resid = np.stack([rng.integers(0, q, n).astype(np.uint32) for q in src_mods])
    poly = rns.RnsPoly(resid, rns.COEFF, src_ids)
    out = basecnv.base_convert(ctx, poly, dst_ids, signed=False)
    got = np.asarray(ma.reduce_strict(out.data, ctx.rows("q", dst_ids)))
    want = _oracle(resid, src_mods, ctx.moduli_of(dst_ids), signed=False)
    np.testing.assert_array_equal(got, want)


def test_base_convert_batched_jit():
    ctx = _ctx(limbs=4)
    n = ctx.params.dimension
    src_ids = (0, 1)
    dst_ids = (2, 3)
    src_mods = ctx.moduli_of(src_ids)
    rng = np.random.default_rng(3)
    resid = np.stack(
        [
            np.stack([rng.integers(0, q, n).astype(np.uint32) for q in src_mods])
            for _ in range(3)
        ]
    )

    @jax.jit
    def run(x):
        return basecnv.base_convert(
            ctx, rns.RnsPoly(x, rns.COEFF, src_ids), dst_ids
        ).data

    got = np.asarray(ma.reduce_strict(run(resid), ctx.rows("q", dst_ids)))
    for b in range(3):
        want = _oracle(resid[b], src_mods, ctx.moduli_of(dst_ids))
        np.testing.assert_array_equal(got[b], want)
