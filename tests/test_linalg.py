"""Homomorphic matrix-vector product vs a numpy dense oracle
(taxonomy of /root/reference/tests/lin_alg_t.cpp, Eigen replaced by numpy)."""

import jax
import numpy as np

from hehub_tpu.circuits import linear_algebra as la
from hehub_tpu.models import ckks
from hehub_tpu.rlwe import keys as keys_mod

from tests.test_ckks import setup, rand_data


def test_requiring_steps():
    steps = la.mv_mul_requiring_steps(slot_count=64, matrix_width=4)
    assert steps == [1, 61, 2, 62, 3, 63]


def test_mv_mul_narrow():
    params, ctx, sk = setup()
    slots = params.dimension // 2
    h, w = 8, 8  # narrow: w <= slots/2
    mat = np.asarray(rand_data(h * w)).reshape(h, w)
    vec = np.asarray(rand_data(w))
    steps = la.mv_mul_requiring_steps(slots, w)
    rot_keys = {
        s: keys_mod.rot_key(ctx, sk, s, jax.random.key(1000 + s)) for s in set(steps)
    }
    full = np.zeros(slots, np.complex128)
    full[:w] = vec
    ct = ckks.encrypt(ctx, ckks.encode(full, params), sk, jax.random.key(99))
    out_ct = la.matrix_vector_mul(ctx, params, mat, ct, rot_keys)
    got = ckks.decode(ckks.decrypt(ctx, out_ct, sk), params)[:h]
    np.testing.assert_allclose(got, mat @ vec, atol=2**-7)


def test_mv_mul_full_width():
    params, ctx, sk = setup()
    slots = params.dimension // 2
    h, w = slots, slots
    rng = np.random.default_rng(77)
    mat = rng.uniform(-1, 1, (h, w))
    vec = rng.uniform(-1, 1, w)
    rot_keys = {1: keys_mod.rot_key(ctx, sk, 1, jax.random.key(1111))}
    ct = ckks.encrypt(ctx, ckks.encode(vec, params), sk, jax.random.key(98))
    out_ct = la.matrix_vector_mul(ctx, params, mat, ct, rot_keys)
    got = ckks.decode(ckks.decrypt(ctx, out_ct, sk), params).real
    np.testing.assert_allclose(got, mat @ vec, atol=2**-4)


def test_mv_mul_batched():
    """Batched ciphertexts thread through the circuit: one call on a
    [B, L, n] tensor matches the per-item results (VERDICT r1 item 5)."""
    params, ctx, sk = setup()
    slots = params.dimension // 2
    h, w = 8, 8
    rng = np.random.default_rng(5)
    mat = rng.uniform(-1, 1, (h, w))
    Bb = 3
    vecs = rng.uniform(-1, 1, (Bb, w))
    steps = la.mv_mul_requiring_steps(slots, w)
    rot_keys = {
        s: keys_mod.rot_key(ctx, sk, s, jax.random.key(2000 + s))
        for s in set(steps)
    }
    full = np.zeros((Bb, slots), np.complex128)
    full[:, :w] = vecs
    ct = ckks.encrypt(ctx, ckks.encode(full, params), sk, jax.random.key(97))
    assert ct.c0.data.ndim == 3  # [B, L, n]
    out_ct = la.matrix_vector_mul(ctx, params, mat, ct, rot_keys)
    got = ckks.decode(ckks.decrypt(ctx, out_ct, sk), params)[..., :h].real
    np.testing.assert_allclose(got, vecs @ mat.T, atol=2**-6)
