"""Noise-budget observability (utils/noise.py) — the queryable counterpart
of the reference's scaling-factor-only metadata (SURVEY.md §5)."""

import numpy as np

import jax

from hehub_tpu.core.context import create_bgv_params, create_ckks_params, make_context
from hehub_tpu.models import bgv, ckks
from hehub_tpu.rlwe import keys as keys_mod
from hehub_tpu.rlwe import rlwe as rlwe_mod
from hehub_tpu.utils import noise

N = 256


def test_headroom_shrinks_with_depth():
    params = create_ckks_params(N, scaling_bits=28, num_levels=4,
                                use_security_budget=False)
    ctx = make_context(params)
    sk = rlwe_mod.keygen(ctx, jax.random.key(0))
    rlk = keys_mod.relin_key(ctx, sk, jax.random.key(1))
    v = np.random.default_rng(0).uniform(-1, 1, N // 2)
    ct = ckks.encrypt(ctx, ckks.encode(v, params), sk, jax.random.key(2))
    h0 = noise.modulus_headroom_bits(ctx, (ct.c0, ct.c1), sk)
    sq = ckks.rescale(ctx, ckks.mult(ctx, ct, ct, rlk))
    h1 = noise.modulus_headroom_bits(ctx, (sq.c0, sq.c1), sk)
    assert h0 > 0 and h1 > 0
    assert h1 < h0  # one level consumed


def test_fresh_ckks_error_small():
    params = create_ckks_params(N, scaling_bits=28, num_levels=2,
                                use_security_budget=False)
    ctx = make_context(params)
    sk = rlwe_mod.keygen(ctx, jax.random.key(0))
    v = np.random.default_rng(1).uniform(-1, 1, N // 2)
    ct = ckks.encrypt(ctx, ckks.encode(v, params), sk, jax.random.key(3))
    bits = noise.ckks_error_bits(ctx, ct, sk, v, params)
    assert bits < -12  # fresh encryption error well under 2^-12


def test_bgv_invariant_noise_grows():
    params = create_bgv_params(N, plain_bits=17, num_levels=3,
                              use_security_budget=False)
    ctx = make_context(params)
    t = params.plain_modulus
    sk = rlwe_mod.keygen(ctx, jax.random.key(0))
    a = np.random.default_rng(2).integers(0, t, N, dtype=np.uint64)
    ct = bgv.encrypt(ctx, bgv.simd_encode(ctx, a), sk, jax.random.key(4))
    n0 = noise.bgv_invariant_noise_bits(ctx, ct, sk)
    ct2 = bgv.add(ctx, ct, ct)
    n1 = noise.bgv_invariant_noise_bits(ctx, ct2, sk)
    assert n1 >= n0  # addition can only grow the invariant noise
    # decryption still exact
    got = bgv.simd_decode(ctx, bgv.decrypt(ctx, ct2, sk))
    np.testing.assert_array_equal(got.astype(np.uint64), 2 * a % t)
