"""C++ host runtime vs the exact Python implementations."""

import numpy as np
import pytest

from hehub_tpu.native import loader
from hehub_tpu.utils import hostmath as hm

pytestmark = pytest.mark.skipif(not loader.available(), reason="no native lib")

RNG = np.random.default_rng(9)


def test_primegen_matches():
    got = np.empty(4, np.uint64)
    found = loader._lib().hh_gen_ntt_primes(30, 4, np.uint64(4096), got)
    assert found == 4
    assert tuple(int(x) for x in got) == hm.gen_ntt_primes(30, 4, 4096)


def test_is_prime():
    for x in [2, 3, 4, 561, 2**31 - 1, 10**18 + 9, 10**18 + 7]:
        assert loader.is_prime(x) == hm.is_prime(x)


def test_compose_mod_matches_python():
    mods = list(hm.gen_ntt_primes(30, 4, 256))
    n = 64
    resid = np.stack(
        [RNG.integers(0, q, n, dtype=np.uint64).astype(np.uint32) for q in mods]
    )
    t = 65537
    got = loader.compose_mod(resid, mods, t)
    ints = hm.crt_compose(resid, mods)
    Q = int(np.prod([int(m) for m in mods], dtype=object))
    expect = np.asarray(
        [hm.to_signed(x, Q) % t for x in ints], dtype=np.uint32
    )
    np.testing.assert_array_equal(got, expect)


def test_compose_double_matches_python():
    mods = list(hm.gen_ntt_primes(30, 3, 256))
    n = 32
    resid = np.stack(
        [RNG.integers(0, q, n, dtype=np.uint64).astype(np.uint32) for q in mods]
    )
    got = loader.compose_double(resid, mods)
    ints = hm.crt_compose(resid, mods)
    Q = int(np.prod([int(m) for m in mods], dtype=object))
    expect = np.asarray([float(hm.to_signed(x, Q)) for x in ints])
    np.testing.assert_allclose(got, expect, rtol=1e-15)


def test_native_ntt_roundtrip():
    from hehub_tpu.core.context import ModulusTables

    n = 512
    q = hm.gen_ntt_primes(30, 1, n)[0]
    tabs = ModulusTables(q, n)
    x = RNG.integers(0, q, n, dtype=np.uint64).astype(np.uint32)
    v = loader.ntt_fwd(x, q, tabs.tw_fwd)
    back = loader.ntt_inv(v, q, np.asarray(tabs.tw_inv), hm.modinv(n, q))
    np.testing.assert_array_equal(back, x)
    # matches the JAX kernel's value order
    from hehub_tpu.ops import ntt as nttmod

    vj = np.asarray(nttmod.ntt_single(tabs, x[None]))[0]
    np.testing.assert_array_equal(v, vj % q)
