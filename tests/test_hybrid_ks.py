"""Hybrid key switching with digit grouping (alpha > 1) over multiple
special primes — the SEAL/Lattigo-style generalization of the reference's
single-special-prime scheme (keys.cpp:8-36 implements only alpha=1).

Digits are SIGNED fast base conversions of limb groups (base_convert), so
these tests also exercise the general k->m conversion end-to-end."""

import numpy as np
import pytest

import jax

from hehub_tpu.core.context import create_bgv_params, create_ckks_params, make_context
from hehub_tpu.models import bgv, ckks
from hehub_tpu.rlwe import keys as keys_mod
from hehub_tpu.rlwe import rlwe as rlwe_mod

N = 256


@pytest.fixture(scope="module")
def setup():
    params = create_ckks_params(N, scaling_bits=28, num_levels=4,
                                use_security_budget=False, num_special=2)
    ctx = make_context(params)
    sk = rlwe_mod.keygen(ctx, jax.random.key(0))
    return params, ctx, sk


def test_alpha_requires_enough_specials():
    params = create_ckks_params(N, scaling_bits=28, num_levels=3,
                                use_security_budget=False, num_special=1)
    ctx = make_context(params)
    sk = rlwe_mod.keygen(ctx, jax.random.key(0))
    with pytest.raises(ValueError):
        keys_mod.relin_key(ctx, sk, jax.random.key(1), alpha=2)


def test_ckks_mult_relin_alpha2(setup):
    params, ctx, sk = setup
    rlk = keys_mod.relin_key(ctx, sk, jax.random.key(1), alpha=2)
    assert rlk.rows == 2  # ceil(4/2) digits instead of 4
    rng = np.random.default_rng(0)
    a = rng.uniform(-1, 1, N // 2)
    b = rng.uniform(-1, 1, N // 2)
    ca = ckks.encrypt(ctx, ckks.encode(a, params), sk, jax.random.key(2))
    cb = ckks.encrypt(ctx, ckks.encode(b, params), sk, jax.random.key(3))
    prod = ckks.rescale(ctx, ckks.mult(ctx, ca, cb, rlk))
    got = np.real(ckks.decode(ckks.decrypt(ctx, prod, sk), params))
    np.testing.assert_allclose(got, a * b, atol=2e-4)


def test_ckks_mult_below_keygen_level_alpha2(setup):
    """at_level slices digit rows correctly when the level cuts a group."""
    params, ctx, sk = setup
    rlk = keys_mod.relin_key(ctx, sk, jax.random.key(1), alpha=2)
    rng = np.random.default_rng(1)
    a = rng.uniform(-1, 1, N // 2)
    ca = ckks.encrypt(ctx, ckks.encode(a, params), sk, jax.random.key(4))
    # one rescale -> level 3 (odd: the second digit group is partial)
    sq1 = ckks.rescale(ctx, ckks.mult(ctx, ca, ca, rlk))
    sq2 = ckks.rescale(ctx, ckks.mult(ctx, sq1, sq1, rlk))
    got = np.real(ckks.decode(ckks.decrypt(ctx, sq2, sk), params))
    np.testing.assert_allclose(got, a**4, atol=2e-3)


def test_ckks_rotate_alpha2(setup):
    params, ctx, sk = setup
    rng = np.random.default_rng(2)
    v = rng.uniform(-1, 1, N // 2)
    ct = ckks.encrypt(ctx, ckks.encode(v, params), sk, jax.random.key(5))
    rk = keys_mod.rot_key(ctx, sk, 3, jax.random.key(6), alpha=2)
    got = ckks.decode(ckks.decrypt(ctx, ckks.rotate(ctx, ct, rk, 3), sk), params)
    np.testing.assert_allclose(got, np.roll(v, 3), atol=2e-4)
    ck = keys_mod.conj_key(ctx, sk, jax.random.key(7), alpha=2)
    got = ckks.decode(ckks.decrypt(ctx, ckks.conjugate(ctx, ct, ck), sk), params)
    np.testing.assert_allclose(got, np.conj(v), atol=2e-4)


def test_ckks_mult_alpha1_with_two_specials(setup):
    """alpha=1 still works when the context carries two special primes."""
    params, ctx, sk = setup
    rlk = keys_mod.relin_key(ctx, sk, jax.random.key(8), alpha=1)
    assert rlk.rows == 4
    rng = np.random.default_rng(3)
    a = rng.uniform(-1, 1, N // 2)
    ca = ckks.encrypt(ctx, ckks.encode(a, params), sk, jax.random.key(9))
    prod = ckks.rescale(ctx, ckks.mult(ctx, ca, ca, rlk))
    got = np.real(ckks.decode(ckks.decrypt(ctx, prod, sk), params))
    np.testing.assert_allclose(got, a * a, atol=2e-4)


def test_bgv_mult_relin_alpha2():
    params = create_bgv_params(N, plain_bits=17, num_levels=4, num_special=2,
                               use_security_budget=False)
    ctx = make_context(params)
    t = params.plain_modulus
    sk = rlwe_mod.keygen(ctx, jax.random.key(0))
    rlk = keys_mod.relin_key(ctx, sk, jax.random.key(1), alpha=2, noise_scale=t)
    rng = np.random.default_rng(4)
    a = rng.integers(0, t, N, dtype=np.uint64)
    b = rng.integers(0, t, N, dtype=np.uint64)
    ca = bgv.encrypt(ctx, bgv.simd_encode(ctx, a), sk, jax.random.key(2))
    cb = bgv.encrypt(ctx, bgv.simd_encode(ctx, b), sk, jax.random.key(3))
    prod = bgv.mult(ctx, ca, cb, rlk)
    got = bgv.simd_decode(ctx, bgv.decrypt(ctx, prod, sk))
    np.testing.assert_array_equal(got.astype(np.uint64), a * b % t)
