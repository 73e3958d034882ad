"""Core-layer algebraic and statistical checks (≙ the reference's
tests/common_t.cpp:39-266 taxonomy: parameter validation, sampler
range/statistics, Galois automorphism laws)."""

import numpy as np
import pytest

import jax

from hehub_tpu.core import galois, rns, sampling
from hehub_tpu.core.context import (
    BgvParams,
    RlweParams,
    create_ckks_params,
    make_context,
)
from hehub_tpu.models import ckks
from hehub_tpu.utils import hostmath as hm


def _ctx(n=256, limbs=2):
    primes = hm.gen_ntt_primes(30, limbs, n)
    return make_context(RlweParams(dimension=n, moduli=tuple(primes)))


# ---------------------------------------------------------------------------
# Parameter validation (≙ bgv_t.cpp:62-71 coprimality rejection and
# rns.cpp:16-18 ctor validation)
# ---------------------------------------------------------------------------


def test_params_rejects_bad_dimension():
    q = hm.gen_ntt_primes(30, 1, 256)[0]
    with pytest.raises(ValueError):
        RlweParams(dimension=100, moduli=(q,))


def test_params_rejects_duplicate_moduli():
    q = hm.gen_ntt_primes(30, 1, 256)[0]
    with pytest.raises(ValueError):
        RlweParams(dimension=256, moduli=(q, q))


def test_params_rejects_non_ntt_prime():
    with pytest.raises(ValueError):
        RlweParams(dimension=256, moduli=((1 << 29) + 1,))


def test_bgv_params_rejects_shared_plain_modulus():
    primes = hm.gen_ntt_primes(30, 2, 256)
    with pytest.raises(ValueError):
        BgvParams(dimension=256, moduli=primes, plain_modulus=primes[0])


def test_security_budget_enforced():
    with pytest.raises(ValueError):
        create_ckks_params(1024, num_levels=8)  # 9*30 bits >> 27-bit budget


def test_prime_generation_verified():
    """Programmatic generation replaces the reference's hand-maintained
    tables (which contain two corrupted entries, primelists.cpp:176,184)."""
    for n in (256, 4096):
        for q in hm.gen_ntt_primes(30, 4, n):
            assert hm.is_prime(q)
            assert q % (2 * n) == 1
            assert (1 << 29) <= q < (1 << 30)


# ---------------------------------------------------------------------------
# Galois automorphism laws (≙ common_t.cpp:168-266)
# ---------------------------------------------------------------------------


def _rand_ntt_poly(ctx, seed=0):
    ids = tuple(range(len(ctx.mod_list)))
    rng = np.random.default_rng(seed)
    qs = np.asarray(ctx.moduli_of(ids), np.uint32)[:, None]
    data = rng.integers(0, 1 << 31, (len(ids), ctx.params.dimension)).astype(
        np.uint32
    ) % qs
    return rns.RnsPoly(data, rns.NTT, ids)


def test_involution_squared_is_identity():
    ctx = _ctx()
    p = _rand_ntt_poly(ctx)
    got = galois.involution(galois.involution(p))
    np.testing.assert_array_equal(np.asarray(got.data), np.asarray(p.data))


def test_cycle_composition():
    ctx = _ctx()
    p = _rand_ntt_poly(ctx, 1)
    a = galois.cycle(galois.cycle(p, 3), 5)
    b = galois.cycle(p, 8)
    np.testing.assert_array_equal(np.asarray(a.data), np.asarray(b.data))


def test_cycle_full_period_is_identity():
    ctx = _ctx(n=64)
    p = _rand_ntt_poly(ctx, 2)
    out = p
    for _ in range(32):  # slot count n/2 = the rotation group order
        out = galois.cycle(out, 1)
    np.testing.assert_array_equal(np.asarray(out.data), np.asarray(p.data))


def test_cycle_preserves_multiset():
    ctx = _ctx()
    p = _rand_ntt_poly(ctx, 3)
    r = galois.cycle(p, 7)
    np.testing.assert_array_equal(
        np.sort(np.asarray(r.data), axis=-1), np.sort(np.asarray(p.data), axis=-1)
    )


def test_semantic_slot_rotation_via_encoder():
    """cycle(encode(v)) decodes to a cyclic slot shift (the semantic check of
    common_t.cpp:214-266, run through the CKKS encoder)."""
    params = create_ckks_params(256, scaling_bits=28, num_levels=2,
                                use_security_budget=False)
    ctx = make_context(params)
    slots = params.dimension // 2
    rng = np.random.default_rng(4)
    v = rng.uniform(-1, 1, slots)
    pt = ckks.encode(v, params)
    rotated = galois.cycle(rns.to_ntt(ctx, pt.poly), 1)
    back = ckks.CkksPt(rns.to_coeff(ctx, rotated), pt.scaling_factor)
    got = np.real(ckks.decode(back, params))
    # reference convention: slot i moves to slot i+step (ckks_t.cpp:436)
    np.testing.assert_allclose(got, np.roll(v, 1), atol=1e-5)


# ---------------------------------------------------------------------------
# Samplers (≙ common_t.cpp:81-129)
# ---------------------------------------------------------------------------


def test_ternary_range_and_balance():
    ctx = _ctx(n=4096, limbs=1)
    p = sampling.ternary_poly(ctx, jax.random.key(0), (0,), form=rns.COEFF)
    vals = np.asarray(p.data)[0].astype(np.int64)
    q = int(ctx.mod_list[0])
    signed = np.where(vals > q // 2, vals - q, vals)
    assert set(np.unique(signed)) <= {-1, 0, 1}
    # each symbol ~n/3: loose 5-sigma band
    for s in (-1, 0, 1):
        frac = np.mean(signed == s)
        assert abs(frac - 1 / 3) < 0.05


def test_uniform_range_and_mean():
    ctx = _ctx(n=4096, limbs=2)
    p = sampling.uniform_poly(ctx, jax.random.key(1), (0, 1), form=rns.COEFF)
    vals = np.asarray(p.data)
    for k, q in enumerate(ctx.mod_list):
        v = vals[k].astype(np.float64)
        assert v.max() < q
        assert abs(v.mean() / q - 0.5) < 0.03


def test_gaussian_std_and_truncation():
    ctx = _ctx(n=16384, limbs=1)
    p = sampling.gaussian_poly(ctx, jax.random.key(2), (0,), form=rns.COEFF)
    vals = np.asarray(p.data)[0].astype(np.int64)
    q = int(ctx.mod_list[0])
    signed = np.where(vals > q // 2, vals - q, vals)
    assert np.abs(signed).max() <= 6 * sampling.SIGMA
    assert abs(signed.std() - sampling.SIGMA) < 0.3
    assert abs(signed.mean()) < 0.2


def test_samplers_reproducible_by_key():
    ctx = _ctx()
    ids = (0, 1)
    a = sampling.gaussian_poly(ctx, jax.random.key(7), ids)
    b = sampling.gaussian_poly(ctx, jax.random.key(7), ids)
    c = sampling.gaussian_poly(ctx, jax.random.key(8), ids)
    np.testing.assert_array_equal(np.asarray(a.data), np.asarray(b.data))
    assert not np.array_equal(np.asarray(a.data), np.asarray(c.data))


# ---------------------------------------------------------------------------
# Per-prime-bit-width parameter lists (≙ ckks::create_params(dimension,
# moduli_bits, additional_mod_bits, scaling), basics.cpp:14-38)
# ---------------------------------------------------------------------------


def test_bit_length_params_widths_and_distinctness():
    from hehub_tpu.core.context import create_ckks_params_from_bit_lengths

    params = create_ckks_params_from_bit_lengths(
        256, [30, 25, 25, 23], special_mod_bits=30,
        use_security_budget=False,
    )
    widths = [q.bit_length() for q in params.moduli]
    assert widths == [30, 25, 25, 23]
    allp = (params.special_mod, *params.moduli)
    assert len(set(allp)) == len(allp)
    for q in allp:
        assert hm.is_prime(q) and q % (2 * 256) == 1
    # default scale follows the trailing chain width
    assert params.initial_scaling_factor == 2.0**23


def test_bit_length_params_budget_and_width_guards():
    from hehub_tpu.core.context import create_ckks_params_from_bit_lengths

    with pytest.raises(ValueError):  # 4*30 > 27-bit budget at n=1024
        create_ckks_params_from_bit_lengths(1024, [30, 30, 30])
    with pytest.raises(ValueError):  # width beyond the uint32 lane design
        create_ckks_params_from_bit_lengths(
            256, [36, 30], use_security_budget=False
        )


def test_bit_length_params_roundtrip_and_mult():
    """Encode/encrypt/mult/rescale_auto/decrypt/decode on a mixed-width
    chain: the flexible-scale machinery must track non-uniform limb drops."""
    from hehub_tpu.core.context import create_ckks_params_from_bit_lengths
    from hehub_tpu.rlwe import keys as keys_mod
    from hehub_tpu.rlwe import rlwe as rlwe_mod

    params = create_ckks_params_from_bit_lengths(
        256, [30, 28, 26, 24], special_mod_bits=30,
        initial_scaling_factor=2.0**24, use_security_budget=False,
    )
    ctx = make_context(params)
    sk = rlwe_mod.keygen(ctx, jax.random.key(0))
    rlk = keys_mod.relin_key(ctx, sk, jax.random.key(1))
    rng = np.random.default_rng(5)
    va = rng.uniform(-1, 1, 128)
    vb = rng.uniform(-1, 1, 128)
    cta = ckks.encrypt(ctx, ckks.encode(va, params), sk, jax.random.key(2))
    ctb = ckks.encrypt(ctx, ckks.encode(vb, params), sk, jax.random.key(3))
    prod = ckks.rescale_auto(ctx, ckks.mult(ctx, cta, ctb, rlk))
    got = np.real(ckks.decode(ckks.decrypt(ctx, prod, sk), params))
    np.testing.assert_allclose(got, va * vb, atol=2e-4)
