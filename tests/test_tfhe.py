"""TFHE functional bootstrapping tests.

The reference declares this API but implements none of it
(/root/reference/src/fhe/tfhe/func_boot.h, func_boot.cpp is empty); the
documented algorithm (blind rotation -> extraction -> key switch) is the
spec. Zero-noise mode proves the pipeline exactly; noisy mode proves the
gate bootstrap with real noise."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from hehub_tpu.models import tfhe

PAR = tfhe.TfheParams(
    rlwe_dimension=256,
    lwe_dimension=32,
    decomp_bits=6,
    decomp_levels=5,
    ks_decomp_bits=10,
    ks_levels=3,
)


@functools.lru_cache(maxsize=None)
def keys_noiseless():
    return tfhe.keygen(PAR, jax.random.key(70), debug_zero_e=True)


@functools.lru_cache(maxsize=None)
def keys_noisy():
    return tfhe.keygen(PAR, jax.random.key(71))


def bucket_lut(fvals, n, two_n):
    """LUT poly t_j = fvals[j // bucket], buckets of the exponent domain."""
    bucket = n // len(fvals)
    return np.repeat(np.asarray(fvals, np.uint32), bucket)


def phase_of(ct, keys):
    return np.asarray(tfhe.lwe_phase(PAR, ct, keys.lwe_s))


def centered(x, q):
    x = np.asarray(x, np.int64)
    return np.where(x >= q // 2, x - q, x)


def test_lwe_roundtrip():
    keys = keys_noisy()
    q = PAR.q
    msgs = np.asarray([0, q // 4, q // 2, 3 * q // 4], np.uint32)
    ct = tfhe.lwe_encrypt(PAR, msgs, keys.lwe_s, jax.random.key(1))
    ph = phase_of(ct, keys).astype(np.int64)
    err = centered((ph - msgs) % q, q)
    assert (np.abs(err) < 64).all()


def test_functional_bootstrap_exact_noiseless():
    keys = keys_noiseless()
    q, n = PAR.q, PAR.rlwe_dimension
    two_n = 2 * n
    nb = 8
    fvals = [(k + 1) * q // 37 % q for k in range(nb)]
    lut = bucket_lut(fvals, n, two_n)
    # exponents at bucket centers in the LOWER half (no negacyclic flip)
    buckets = np.arange(nb)
    exps = buckets * (n // nb) + n // nb // 2
    msgs = (exps.astype(np.uint64) * q // two_n).astype(np.uint32)
    ct = tfhe.lwe_encrypt(PAR, msgs, keys.lwe_s, jax.random.key(2), noise_std=0.0)
    out = tfhe.functional_bootstrap(PAR, ct, lut, keys)
    ph = phase_of(out, keys)
    np.testing.assert_array_equal(ph, np.asarray(fvals, np.uint32))


def test_functional_bootstrap_negacyclic():
    """Upper-half exponents return the negated LUT value (func_boot.h:28-31)."""
    keys = keys_noiseless()
    q, n = PAR.q, PAR.rlwe_dimension
    two_n = 2 * n
    c = q // 8
    lut = np.full(n, c, np.uint32)
    exps = np.asarray([n + n // 4, n + n // 2])  # k = 1
    msgs = (exps.astype(np.uint64) * q // two_n).astype(np.uint32)
    ct = tfhe.lwe_encrypt(PAR, msgs, keys.lwe_s, jax.random.key(3), noise_std=0.0)
    out = tfhe.functional_bootstrap(PAR, ct, lut, keys)
    ph = phase_of(out, keys)
    np.testing.assert_array_equal(ph, np.full(2, q - c, np.uint32))


def test_redundant_msb():
    keys = keys_noiseless()
    q, n = PAR.q, PAR.rlwe_dimension
    two_n = 2 * n
    exps = np.asarray([n // 3, n - 8, n + n // 3, 2 * n - 8])
    msgs = (exps.astype(np.uint64) * q // two_n).astype(np.uint32)
    ct = tfhe.lwe_encrypt(PAR, msgs, keys.lwe_s, jax.random.key(4), noise_std=0.0)
    msb = tfhe.get_redundant_msb(PAR, ct, keys)
    ph = centered(phase_of(msb, keys), q)
    expect = np.asarray([0, 0, -(q // 2), -(q // 2)])  # k*q/2 mod q, centered
    assert (np.abs((ph - expect) % q if False else ph - expect) <= 4).all()


def test_fully_functional_bootstrap():
    """FFBS evaluates the LUT on the low exponent bits regardless of the
    redundant MSB (func_boot.h:70-89)."""
    keys = keys_noiseless()
    q, n = PAR.q, PAR.rlwe_dimension
    two_n = 2 * n
    nb = 8
    fvals = [(3 * k + 5) * q // 41 % q for k in range(nb)]
    lut = bucket_lut(fvals, n, two_n)
    buckets = np.asarray([1, 6, 1, 6])
    exps = buckets * (n // nb) + n // nb // 2
    exps = exps + np.asarray([0, 0, n, n])  # two with redundant MSB set
    msgs = (exps.astype(np.uint64) * q // two_n).astype(np.uint32)
    ct = tfhe.lwe_encrypt(PAR, msgs, keys.lwe_s, jax.random.key(5), noise_std=0.0)
    out = tfhe.fully_functional_bootstrap(PAR, ct, lut, keys)
    ph = phase_of(out, keys).astype(np.int64)
    expect = np.asarray(fvals, np.int64)[buckets]
    err = centered((ph - expect) % q, q)
    assert (np.abs(err) <= 16).all(), (ph, expect)


def test_nand_gate_noisy():
    keys = keys_noisy()
    bits = [(0, 0), (0, 1), (1, 0), (1, 1)]
    b1 = np.asarray([x for x, _ in bits])
    b2 = np.asarray([y for _, y in bits])
    c1 = tfhe.lwe_encrypt(PAR, tfhe.encode_bit(PAR, b1), keys.lwe_s, jax.random.key(6))
    c2 = tfhe.lwe_encrypt(PAR, tfhe.encode_bit(PAR, b2), keys.lwe_s, jax.random.key(7))
    out = tfhe.nand_gate(PAR, c1, c2, keys)
    got = np.asarray(tfhe.lwe_decrypt_bit(PAR, out, keys.lwe_s))
    np.testing.assert_array_equal(got, 1 - (b1 & b2))


def test_key_switch_mxu_matches_elementwise():
    """The int8-MXU key-switch path (digit base <= 2^7) must agree exactly
    with the elementwise Shoup form on the same key material."""
    params = tfhe.TfheParams(rlwe_dimension=512, lwe_dimension=64,
                             ks_decomp_bits=5, ks_levels=6)
    keys = tfhe.keygen(params, jax.random.key(3))
    rng = np.random.default_rng(7)
    a = jnp.asarray(rng.integers(0, params.q, (9, params.rlwe_dimension))
                    .astype(np.uint32))
    b = jnp.asarray(rng.integers(0, params.q, 9).astype(np.uint32))
    ct = tfhe.LweCt(a, b)
    got = tfhe._key_switch_mxu(params, ct, keys)
    # elementwise reference (force the generic branch)
    import dataclasses
    params_wide = dataclasses.replace(params, ks_decomp_bits=5)
    qc, two_q = np.uint32(params.q), np.uint32(2 * params.q)
    kb, kl = params.ks_decomp_bits, params.ks_levels
    d = jnp.stack([(a >> jnp.uint32(kb * v)) & jnp.uint32((1 << kb) - 1)
                   for v in range(kl)], axis=-1)
    from hehub_tpu.ops import modarith as ma
    ta = ma.shoup_mul_lazy(d[..., None], keys.ksk_a, keys.ksk_a_sh, qc)
    tb = ma.shoup_mul_lazy(d, keys.ksk_b, keys.ksk_b_sh, qc)
    out_a = ma.reduce_strict(
        ma.reduce_add_lazy(ta.reshape(ta.shape[0], -1, ta.shape[-1]), -2,
                           two_q), qc)
    out_b = ma.reduce_strict(
        ma.add_lazy(ma.reduce_add_lazy(tb.reshape(tb.shape[0], -1), -1,
                                       two_q), b, two_q), qc)
    np.testing.assert_array_equal(np.asarray(got.a), np.asarray(out_a))
    np.testing.assert_array_equal(np.asarray(got.b), np.asarray(out_b))
