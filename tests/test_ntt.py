"""NTT correctness: naive O(n^2) negacyclic-evaluation oracle on small n,
impulse/monomial analytic cases, and roundtrip NTT∘INTT == id on large n
(taxonomy of /root/reference/tests/ntt_t.cpp:30-181)."""

import numpy as np
import pytest

from hehub_tpu.core.context import RlweParams, make_context
from hehub_tpu.core import rns
from hehub_tpu.ops import ntt as nttmod
from hehub_tpu.utils import hostmath as hm

RNG = np.random.default_rng(11)


def bitrev(x, bits):
    return int(f"{x:0{bits}b}"[::-1], 2)


def naive_ntt(coeffs, q, n):
    """Oracle: out[j] = a(ψ^(2*rev(j)+1)) with exact Python ints."""
    logn = n.bit_length() - 1
    psi = hm.negacyclic_psi(q, n)
    out = []
    for j in range(n):
        e = 2 * bitrev(j, logn) + 1
        root = pow(psi, e, q)
        acc, x = 0, 1
        for c in coeffs:
            acc = (acc + int(c) * x) % q
            x = x * root % q
        out.append(acc)
    return np.asarray(out, dtype=np.uint32)


def params_for(n, levels=2):
    primes = hm.gen_ntt_primes(30, levels + 1, n)
    return RlweParams(dimension=n, moduli=primes[1:], special_mod=primes[0])


@pytest.mark.parametrize("n", [16, 64, 256])
def test_ntt_matches_naive_oracle(n):
    ctx = make_context(params_for(n))
    ids = (0, 1)
    coeffs = RNG.integers(0, [[ctx.mod_list[0]], [ctx.mod_list[1]]], size=(2, n))
    poly = rns.RnsPoly(coeffs.astype(np.uint32), rns.COEFF, ids)
    values = np.asarray(rns.to_ntt(ctx, poly).data)
    for k, q in enumerate(ctx.moduli_of(ids)):
        assert (values[k] < 2 * q).all()
        np.testing.assert_array_equal(values[k] % q, naive_ntt(coeffs[k], q, n))


@pytest.mark.parametrize("n", [16, 128])
def test_impulse_and_constant(n):
    ctx = make_context(params_for(n))
    q = ctx.mod_list[0]
    # constant polynomial c -> all values c
    c = 12345 % q
    coeffs = np.zeros((1, n), np.uint32)
    coeffs[0, 0] = c
    poly = rns.RnsPoly(coeffs, rns.COEFF, (0,))
    vals = np.asarray(rns.to_ntt(ctx, poly).data)[0]
    np.testing.assert_array_equal(vals % q, np.full(n, c))


@pytest.mark.parametrize("n", [1024, 8192])
@pytest.mark.parametrize("batch", [(), (3,)])
def test_roundtrip_large(n, batch):
    import jax

    ctx = make_context(params_for(n, levels=3))
    ids = (0, 1, 2, 3)
    qs = np.asarray(ctx.moduli_of(ids), dtype=np.uint32)[:, None]
    coeffs = RNG.integers(0, 1 << 30, size=(*batch, 4, n)).astype(np.uint32) % (2 * qs)

    @jax.jit
    def roundtrip(data):
        poly = rns.RnsPoly(data, rns.COEFF, ids)
        return rns.to_coeff(ctx, rns.to_ntt(ctx, poly)).data

    got = np.asarray(roundtrip(coeffs))
    assert (got < 2 * qs).all()
    np.testing.assert_array_equal(got % qs, coeffs % qs)


def test_negacyclic_convolution(n=256):
    """NTT-pointwise-INTT == negacyclic polynomial product (exact oracle)."""
    ctx = make_context(params_for(n))
    q = ctx.mod_list[0]
    a = RNG.integers(0, q, size=n).astype(np.uint32)
    b = RNG.integers(0, q, size=n).astype(np.uint32)
    pa = rns.to_ntt(ctx, rns.RnsPoly(a[None], rns.COEFF, (0,)))
    pb = rns.to_ntt(ctx, rns.RnsPoly(b[None], rns.COEFF, (0,)))
    prod = np.asarray(rns.to_coeff(ctx, rns.mul(ctx, pa, pb)).data)[0] % q
    # oracle in exact ints
    expect = np.zeros(n, dtype=object)
    for i in range(n):
        ai = int(a[i])
        for j in range(n):
            k = i + j
            if k < n:
                expect[k] += ai * int(b[j])
            else:
                expect[k - n] -= ai * int(b[j])
    expect = np.asarray([int(e) % q for e in expect], dtype=np.uint64)
    np.testing.assert_array_equal(prod.astype(np.uint64), expect)


def test_single_modulus_wrappers(n=512):
    from hehub_tpu.core.context import ModulusTables

    q = hm.gen_ntt_primes(17, 1, n)[0]
    tabs = ModulusTables(q, n)
    x = RNG.integers(0, q, size=(2, n)).astype(np.uint32)
    back = np.asarray(nttmod.intt_single(tabs, nttmod.ntt_single(tabs, x)))
    np.testing.assert_array_equal(back % q, x % q)
