"""Pallas fused-kernel equivalence: bitwise identical to the XLA stage-chain
path (interpret mode on CPU)."""

import numpy as np

from hehub_tpu.core.context import RlweParams, make_context
from hehub_tpu.ops import ntt as nttmod
from hehub_tpu.ops.pallas import ntt_pallas
from hehub_tpu.utils import hostmath as hm

RNG = np.random.default_rng(5)


def test_pallas_ntt_bitwise_equal():
    n = 512
    primes = hm.gen_ntt_primes(30, 3, n)
    ctx = make_context(RlweParams(dimension=n, moduli=primes[1:], special_mod=primes[0]))
    ids = (0, 1, 2)
    qs = np.asarray(ctx.moduli_of(ids), np.uint32)[:, None]
    x = RNG.integers(0, 1 << 31, (3, 3, n)).astype(np.uint32) % (2 * qs)
    ref = np.asarray(nttmod.ntt(ctx, x, ids))
    got = np.asarray(ntt_pallas.make_ntt(ctx, ids, inverse=False, interpret=True)(x))
    np.testing.assert_array_equal(ref, got)
    refi = np.asarray(nttmod.intt(ctx, ref, ids))
    goti = np.asarray(ntt_pallas.make_ntt(ctx, ids, inverse=True, interpret=True)(got))
    np.testing.assert_array_equal(refi, goti)


def test_pallas_row_padding():
    """Row counts that are neither <=8 nor multiples of 8 get padded."""
    n = 512
    primes = hm.gen_ntt_primes(30, 1, n)
    ctx = make_context(RlweParams(dimension=n, moduli=primes))
    ids = (0,)
    q = primes[0]
    x = RNG.integers(0, 2 * q, (11, 1, n)).astype(np.uint32)
    ref = np.asarray(nttmod.ntt(ctx, x, ids))
    got = np.asarray(ntt_pallas.make_ntt(ctx, ids, inverse=False, interpret=True)(x))
    np.testing.assert_array_equal(ref, got)
