"""BGV tests: exact round trips, homomorphic ops vs Z_t oracles, mod-switch
invariance, and end-to-end ct-ct mult+relin — including the case the
reference leaves commented out (tests/bgv_t.cpp:193-226).
(taxonomy of /root/reference/tests/bgv_t.cpp)"""

import functools

import jax
import numpy as np

from hehub_tpu.core.context import create_bgv_params, make_context
from hehub_tpu.models import bgv
from hehub_tpu.rlwe import keys as keys_mod
from hehub_tpu.rlwe import rlwe as rlwe_mod

RNG = np.random.default_rng(31)
N = 256


@functools.lru_cache(maxsize=None)
def setup():
    params = create_bgv_params(N, plain_bits=17, num_levels=3,
                               use_security_budget=False)
    ctx = make_context(params)
    sk = rlwe_mod.keygen(ctx, jax.random.key(40))
    return params, ctx, sk


def rand_slots(t, count=N):
    return RNG.integers(0, t, count, dtype=np.uint64)


def test_encode_decode_exact():
    params, ctx, sk = setup()
    t = params.plain_modulus
    data = rand_slots(t)
    pt = bgv.simd_encode(ctx, data)
    np.testing.assert_array_equal(bgv.simd_decode(ctx, pt), data)


def test_encrypt_decrypt_exact():
    params, ctx, sk = setup()
    t = params.plain_modulus
    data = rand_slots(t)
    ct = bgv.encrypt(ctx, bgv.simd_encode(ctx, data), sk, jax.random.key(41))
    got = bgv.simd_decode(ctx, bgv.decrypt(ctx, ct, sk))
    np.testing.assert_array_equal(got, data)
    # device fast path agrees while noise is fresh
    got_dev = bgv.simd_decode(ctx, bgv.decrypt_device(ctx, ct, sk))
    np.testing.assert_array_equal(got_dev, data)


def test_homomorphic_add_sub_mult_plain():
    params, ctx, sk = setup()
    t = params.plain_modulus
    a, b = rand_slots(t), rand_slots(t)
    ct = bgv.encrypt(ctx, bgv.simd_encode(ctx, a), sk, jax.random.key(42))
    pb = bgv.simd_encode(ctx, b)
    np.testing.assert_array_equal(
        bgv.simd_decode(ctx, bgv.decrypt(ctx, bgv.add_plain(ctx, ct, pb), sk)),
        (a + b) % t,
    )
    np.testing.assert_array_equal(
        bgv.simd_decode(ctx, bgv.decrypt(ctx, bgv.sub_plain(ctx, ct, pb), sk)),
        (a.astype(np.int64) - b.astype(np.int64)) % t,
    )
    np.testing.assert_array_equal(
        bgv.simd_decode(ctx, bgv.decrypt(ctx, bgv.mult_plain(ctx, ct, pb), sk)),
        (a * b) % t,
    )


def test_ct_ct_add():
    params, ctx, sk = setup()
    t = params.plain_modulus
    a, b = rand_slots(t), rand_slots(t)
    ca = bgv.encrypt(ctx, bgv.simd_encode(ctx, a), sk, jax.random.key(43))
    cb = bgv.encrypt(ctx, bgv.simd_encode(ctx, b), sk, jax.random.key(44))
    got = bgv.simd_decode(ctx, bgv.decrypt(ctx, bgv.add(ctx, ca, cb), sk))
    np.testing.assert_array_equal(got, (a + b) % t)


def test_mod_switch_preserves_decryption():
    """(≙ tests/bgv_t.cpp:229-258)"""
    params, ctx, sk = setup()
    t = params.plain_modulus
    data = rand_slots(t)
    ct = bgv.encrypt(ctx, bgv.simd_encode(ctx, data), sk, jax.random.key(45))
    ct2 = bgv.mod_switch(ctx, ct)
    assert ct2.c0.limb_count == ct.c0.limb_count - 1
    got = bgv.simd_decode(ctx, bgv.decrypt(ctx, ct2, sk))
    np.testing.assert_array_equal(got, data)


def test_big_prime_t_coefficient_roundtrip():
    """Encrypt/decrypt under the reference's own 45-bit prime t
    (/root/reference/tests/bgv_t.cpp:48-58, the 'CRT decrypt' case) in
    coefficient encoding — beyond the 30-bit device lanes."""
    t = 35184358850561  # 45-bit prime, ≡ 1 mod 2n for n <= 1024
    params = create_bgv_params(N, num_levels=4, plain_modulus=t,
                               use_security_budget=False)
    ctx = make_context(params)
    sk = rlwe_mod.keygen(ctx, jax.random.key(50))
    data = RNG.integers(0, t, N, dtype=np.uint64)
    pt = bgv.pt_from_values(ctx, data)
    np.testing.assert_array_equal(pt.data, data)  # digit form is exact
    ct = bgv.encrypt(ctx, pt, sk, jax.random.key(51))
    got = bgv.decrypt(ctx, ct, sk)
    np.testing.assert_array_equal(got.data, data)


def test_big_prime_t_simd_and_add():
    """SIMD packing mod the 45-bit prime t through the host u64 NTT, plus a
    homomorphic add (slotwise mod t)."""
    t = 35184358850561
    params = create_bgv_params(N, num_levels=4, plain_modulus=t,
                               use_security_budget=False)
    assert params.simd_capable
    ctx = make_context(params)
    sk = rlwe_mod.keygen(ctx, jax.random.key(52))
    a = RNG.integers(0, t, N, dtype=np.uint64)
    b = RNG.integers(0, t, N, dtype=np.uint64)
    pa, pb = bgv.simd_encode(ctx, a), bgv.simd_encode(ctx, b)
    np.testing.assert_array_equal(bgv.simd_decode(ctx, pa), a)
    ca = bgv.encrypt(ctx, pa, sk, jax.random.key(53))
    cb = bgv.encrypt(ctx, pb, sk, jax.random.key(54))
    got = bgv.simd_decode(ctx, bgv.decrypt(ctx, bgv.add(ctx, ca, cb), sk))
    np.testing.assert_array_equal(
        got, (a.astype(object) + b.astype(object)) % t
    )


def test_composite_crt_t_simd_ops():
    """Composite t = t1·t2 (two NTT primes): CRT SIMD encode/decode,
    homomorphic mult_plain, ct-ct mult + relin, and a mod switch — the
    'CRT-composed plain moduli' coverage of bgv_t.cpp:34-61 extended to
    the full op surface."""
    from hehub_tpu.utils import hostmath as hm

    t1, t2 = hm.gen_ntt_primes(17, 2, N)[:2]
    t = t1 * t2  # ~34-bit composite
    params = create_bgv_params(N, num_levels=4, plain_modulus=t,
                               use_security_budget=False)
    assert params.plain_factors == tuple(sorted((t1, t2)))
    assert params.simd_capable
    ctx = make_context(params)
    sk = rlwe_mod.keygen(ctx, jax.random.key(60))
    rlk = keys_mod.relin_key(ctx, sk, jax.random.key(61), noise_scale=t)
    a = RNG.integers(0, t, N, dtype=np.uint64)
    b = RNG.integers(0, t, N, dtype=np.uint64)
    pa, pb = bgv.simd_encode(ctx, a), bgv.simd_encode(ctx, b)
    np.testing.assert_array_equal(bgv.simd_decode(ctx, pa), a)
    ca = bgv.encrypt(ctx, pa, sk, jax.random.key(62))
    cb = bgv.encrypt(ctx, pb, sk, jax.random.key(63))
    want_mult = np.asarray(
        (a.astype(object) * b.astype(object)) % t, dtype=np.uint64
    )
    got_mp = bgv.simd_decode(ctx, bgv.decrypt(
        ctx, bgv.mult_plain(ctx, ca, pb), sk))
    np.testing.assert_array_equal(got_mp, want_mult)
    prod = bgv.mult(ctx, ca, cb, rlk)
    got = bgv.simd_decode(ctx, bgv.decrypt(ctx, prod, sk))
    np.testing.assert_array_equal(got, want_mult)
    prod2 = bgv.mod_switch(ctx, prod)
    got2 = bgv.simd_decode(ctx, bgv.decrypt(ctx, prod2, sk))
    np.testing.assert_array_equal(got2, want_mult)


def test_non_ntt_t_coefficient_mode():
    """A plain even modulus (t = 2^16, a prime power with no NTT structure):
    coefficient encode/decrypt round trip plus negacyclic plaintext-product
    semantics via mult_plain."""
    t = 1 << 16
    params = create_bgv_params(N, num_levels=3, plain_modulus=t,
                               use_security_budget=False)
    assert not params.simd_capable
    ctx = make_context(params)
    sk = rlwe_mod.keygen(ctx, jax.random.key(70))
    data = RNG.integers(0, t, N, dtype=np.uint64)
    ct = bgv.encrypt(ctx, bgv.pt_from_values(ctx, data), sk, jax.random.key(71))
    got = bgv.decrypt(ctx, ct, sk)
    np.testing.assert_array_equal(got.data, data)


def test_ct_ct_mult_relin():
    """End-to-end multiply: the reference's missing test, implemented."""
    params, ctx, sk = setup()
    t = params.plain_modulus
    rlk = keys_mod.relin_key(ctx, sk, jax.random.key(46), noise_scale=t)
    a, b = rand_slots(t), rand_slots(t)
    ca = bgv.encrypt(ctx, bgv.simd_encode(ctx, a), sk, jax.random.key(47))
    cb = bgv.encrypt(ctx, bgv.simd_encode(ctx, b), sk, jax.random.key(48))
    prod = bgv.mult(ctx, ca, cb, rlk)
    got = bgv.simd_decode(ctx, bgv.decrypt(ctx, prod, sk))
    np.testing.assert_array_equal(got, (a * b) % t)
    # and survives a subsequent mod switch
    prod2 = bgv.mod_switch(ctx, prod)
    got2 = bgv.simd_decode(ctx, bgv.decrypt(ctx, prod2, sk))
    np.testing.assert_array_equal(got2, (a * b) % t)
