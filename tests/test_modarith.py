"""Property tests for the uint32 lazy modular kernels vs Python bignum
(taxonomy of /root/reference/tests/mod_arith_t.cpp: lazy range < 2q plus
exactness mod q)."""

import numpy as np
import pytest

from hehub_tpu.ops import modarith as ma
from hehub_tpu.utils import hostmath as hm

RNG = np.random.default_rng(7)


def rand_lazy(q, shape=(4096,)):
    return RNG.integers(0, 2 * q, size=shape, dtype=np.uint32)


@pytest.fixture(scope="module", params=[29, 30])
def q(request):
    return hm.gen_ntt_primes(request.param, 1, 4096)[0]


def consts(q):
    neg_qinv = (-hm.modinv(q, 1 << 32)) % (1 << 32)
    r = (1 << 32) % q
    return dict(
        q=np.uint32(q),
        two_q=np.uint32(2 * q),
        neg_qinv=np.uint32(neg_qinv),
        r_mod_q=np.uint32(r),
        r_shoup=np.uint32(hm.shoup(r, q)),
    )


def test_mul_hi_exact(q):
    a = RNG.integers(0, 1 << 32, size=10000, dtype=np.uint32)
    b = RNG.integers(0, 1 << 32, size=10000, dtype=np.uint32)
    hi = np.asarray(ma.mul_hi(a, b))
    expect = ((a.astype(np.uint64) * b.astype(np.uint64)) >> 32).astype(np.uint32)
    np.testing.assert_array_equal(hi, expect)


def test_add_sub_neg_lazy(q):
    c = consts(q)
    a, b = rand_lazy(q), rand_lazy(q)
    s = np.asarray(ma.add_lazy(a, b, c["two_q"]))
    d = np.asarray(ma.sub_lazy(a, b, c["two_q"]))
    n = np.asarray(ma.neg_lazy(a, c["two_q"]))
    assert (s < 2 * q).all() and (d < 2 * q).all() and (n < 2 * q).all()
    np.testing.assert_array_equal(s % q, (a.astype(np.uint64) + b) % q)
    np.testing.assert_array_equal(d % q, (a.astype(np.int64) - b) % q)
    np.testing.assert_array_equal(n % q, (-a.astype(np.int64)) % q)


def test_shoup_mul(q):
    c = consts(q)
    w = int(RNG.integers(0, q))
    w_sh = np.uint32(hm.shoup(w, q))
    # Shoup accepts ANY uint32 input, not just lazy
    x = RNG.integers(0, 1 << 32, size=8192, dtype=np.uint32)
    r = np.asarray(ma.shoup_mul_lazy(x, np.uint32(w), w_sh, c["q"]))
    assert (r < 2 * q).all()
    np.testing.assert_array_equal(
        r % q, (x.astype(object) * w % q).astype(np.uint64)
    )


def test_mont_mul(q):
    c = consts(q)
    a, b = rand_lazy(q, (8192,)), rand_lazy(q, (8192,))
    r = np.asarray(ma.mont_mul_lazy(a, b, c["q"], c["neg_qinv"]))
    assert (r < 2 * q).all()
    rinv = hm.modinv(1 << 32, q)
    expect = (a.astype(object) * b.astype(object) * rinv % q).astype(np.uint64)
    np.testing.assert_array_equal(r % q, expect)


def test_mul_mod_general(q):
    c = consts(q)
    a, b = rand_lazy(q, (8192,)), rand_lazy(q, (8192,))
    r = np.asarray(
        ma.mul_mod_lazy(a, b, c["q"], c["neg_qinv"], c["r_mod_q"], c["r_shoup"])
    )
    assert (r < 2 * q).all()
    expect = (a.astype(object) * b.astype(object) % q).astype(np.uint64)
    np.testing.assert_array_equal(r % q, expect)


def test_reduce_strict(q):
    a = rand_lazy(q)
    r = np.asarray(ma.reduce_strict(a, np.uint32(q)))
    assert (r < q).all()
    np.testing.assert_array_equal(r, a % q)
