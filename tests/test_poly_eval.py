"""Homomorphic polynomial evaluation + non-polynomial functions — the
circuits the reference stubbed empty (fp_non_poly.h / cc_non_poly.h)."""

import numpy as np
import pytest

import jax

from hehub_tpu.circuits import poly_eval as pe
from hehub_tpu.core.context import create_ckks_params, make_context
from hehub_tpu.models import ckks
from hehub_tpu.rlwe import keys as keys_mod
from hehub_tpu.rlwe import rlwe as rlwe_mod

N = 256


@pytest.fixture(scope="module")
def setup():
    params = create_ckks_params(N, scaling_bits=28, num_levels=10,
                                use_security_budget=False)
    ctx = make_context(params)
    sk = rlwe_mod.keygen(ctx, jax.random.key(0))
    rlk = keys_mod.relin_key(ctx, sk, jax.random.key(1))
    return params, ctx, sk, rlk


def _enc(params, ctx, sk, vals, key=7):
    return ckks.encrypt(ctx, ckks.encode(vals, params), sk, jax.random.key(key))


def _dec(params, ctx, sk, ct):
    return np.real(ckks.decode(ckks.decrypt(ctx, ct, sk), params))


def test_power_basis(setup):
    params, ctx, sk, rlk = setup
    rng = np.random.default_rng(0)
    v = rng.uniform(-1, 1, N // 2)
    powers = pe.power_basis(ctx, _enc(params, ctx, sk, v), 5, rlk)
    for i in (2, 3, 4, 5):
        got = _dec(params, ctx, sk, powers[i])
        np.testing.assert_allclose(got, v**i, atol=2e-3)


def test_poly_eval_cubic(setup):
    params, ctx, sk, rlk = setup
    rng = np.random.default_rng(1)
    v = rng.uniform(-1, 1, N // 2)
    coeffs = [0.25, -1.0, 0.5, 2.0]
    got = _dec(params, ctx, sk, pe.poly_eval(
        ctx, params, _enc(params, ctx, sk, v), coeffs, rlk))
    want = coeffs[0] + coeffs[1] * v + coeffs[2] * v**2 + coeffs[3] * v**3
    np.testing.assert_allclose(got, want, atol=5e-3)


def test_poly_eval_degree7(setup):
    params, ctx, sk, rlk = setup
    rng = np.random.default_rng(2)
    v = rng.uniform(-1, 1, N // 2)
    coeffs = [0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, -0.5]
    got = _dec(params, ctx, sk, pe.poly_eval(
        ctx, params, _enc(params, ctx, sk, v), coeffs, rlk))
    np.testing.assert_allclose(got, v**3 - 0.5 * v**7, atol=1e-2)


def test_inverse_newton(setup):
    params, ctx, sk, rlk = setup
    rng = np.random.default_rng(3)
    v = rng.uniform(0.6, 1.4, N // 2)  # Newton converges on (0, 2)
    got = _dec(params, ctx, sk, pe.inverse(
        ctx, params, _enc(params, ctx, sk, v), rlk, iterations=3))
    np.testing.assert_allclose(got, 1.0 / v, rtol=3e-2)


def test_sign_iteration(setup):
    params, ctx, sk, rlk = setup
    rng = np.random.default_rng(4)
    # two iterations of f(y)=1.5y-0.5y^3 drive |v|>=0.6 to within 0.07 of +-1
    v = np.concatenate([rng.uniform(0.6, 1, N // 4), rng.uniform(-1, -0.6, N // 4)])
    got = _dec(params, ctx, sk, pe.sign(
        ctx, params, _enc(params, ctx, sk, v), rlk, iterations=2))
    assert np.all(np.abs(got - np.sign(v)) < 0.15)


def test_align_level_guard(setup):
    params, ctx, sk, rlk = setup
    ct = _enc(params, ctx, sk, np.ones(N // 2))
    low = ckks.mod_drop(ctx, ct, 2)
    with pytest.raises(ValueError):
        pe.align_level(ctx, low, ct.c0.limb_count)
