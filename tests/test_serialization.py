"""Serialization round trips (component absent from the reference)."""

import io

import jax
import numpy as np

from hehub_tpu.models import bgv, ckks
from hehub_tpu.rlwe import keys as keys_mod
from hehub_tpu.rlwe import rlwe as rlwe_mod
from hehub_tpu.utils import serialization as ser

from tests.test_ckks import setup as ckks_setup
from tests.test_bgv import setup as bgv_setup


def roundtrip(obj, params):
    buf = io.BytesIO()
    ser.save(buf, obj, params)
    buf.seek(0)
    return ser.load(buf)


def test_params_json():
    params, ctx, sk = ckks_setup()
    back = ser.params_from_json(ser.params_to_json(params))
    assert back == params


def test_sk_and_ct_roundtrip():
    params, ctx, sk = ckks_setup()
    sk2, p2 = roundtrip(sk, params)
    np.testing.assert_array_equal(sk2.coeffs, sk.coeffs)
    np.testing.assert_array_equal(sk2.ntt, sk.ntt)

    data = np.arange(8) / 8.0
    ct = ckks.encrypt(ctx, ckks.encode(data, params), sk, jax.random.key(90))
    ct2, p2 = roundtrip(ct, params)
    assert p2 == params and ct2.scaling_factor == ct.scaling_factor
    out = ckks.decode(ckks.decrypt(ctx, ct2, sk), params, count=8)
    np.testing.assert_allclose(out, data, atol=2**-12)


def test_relin_key_roundtrip():
    params, ctx, sk = ckks_setup()
    rlk = keys_mod.relin_key(ctx, sk, jax.random.key(91))
    rlk2, _ = roundtrip(rlk, params)
    assert rlk2.limb_ids == rlk.limb_ids
    np.testing.assert_array_equal(np.asarray(rlk2.data), np.asarray(rlk.data))
    # the restored key still relinearizes
    a = np.arange(8) / 9.0
    ca = ckks.encrypt(ctx, ckks.encode(a, params), sk, jax.random.key(92))
    prod = ckks.rescale(ctx, ckks.mult(ctx, ca, ca, rlk2))
    got = ckks.decode(ckks.decrypt(ctx, prod, sk), params, count=8)
    np.testing.assert_allclose(got, a * a, atol=2**-9)


def test_bgv_ct_roundtrip():
    params, ctx, sk = bgv_setup()
    t = params.plain_modulus
    data = np.arange(16, dtype=np.uint64) % t
    ct = bgv.encrypt(ctx, bgv.simd_encode(ctx, data), sk, jax.random.key(93))
    ct2, p2 = roundtrip(ct, params)
    assert p2 == params and ct2.plain_modulus == t
    got = bgv.simd_decode(ctx, bgv.decrypt(ctx, ct2, sk), count=16)
    np.testing.assert_array_equal(got, data)


def test_tfhe_keys_roundtrip(tmp_path):
    import jax

    from hehub_tpu.models import tfhe

    params = tfhe.TfheParams(rlwe_dimension=256, lwe_dimension=16,
                             decomp_levels=2, ks_levels=2)
    keys = tfhe.keygen(params, jax.random.key(0))
    p = tmp_path / "tfhe_keys.npz"
    ser.save(p, keys, params.rlwe_params)
    loaded, lp = ser.load(p)
    assert lp == params.rlwe_params
    np.testing.assert_array_equal(loaded.lwe_s, keys.lwe_s)
    np.testing.assert_array_equal(np.asarray(loaded.bsk), np.asarray(keys.bsk))
    np.testing.assert_array_equal(loaded.ksk_b, np.asarray(keys.ksk_b))
    np.testing.assert_array_equal(loaded.rlwe_sk.coeffs, keys.rlwe_sk.coeffs)
    # the loaded keys actually WORK: encrypt/decrypt a bit
    ct = tfhe.lwe_encrypt(params, tfhe.encode_bit(params, 1),
                          loaded.lwe_s, jax.random.key(1))
    assert int(tfhe.lwe_decrypt_bit(params, ct, loaded.lwe_s)) == 1
