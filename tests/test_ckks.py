"""CKKS end-to-end tests: approximate round trips with explicit noise
budgets, exact CRT oracle for rescale, rotation/conjugation slot semantics
(taxonomy of /root/reference/tests/ckks_t.cpp:19-451)."""

import functools

import jax
import numpy as np
import pytest

from hehub_tpu.core import basecnv, rns
from hehub_tpu.core.context import create_ckks_params, make_context
from hehub_tpu.models import ckks
from hehub_tpu.rlwe import keys as keys_mod
from hehub_tpu.rlwe import rlwe as rlwe_mod

RNG = np.random.default_rng(23)
N = 256  # small ring for CI speed; larger dims exercised in bench


@functools.lru_cache(maxsize=None)
def setup():
    params = create_ckks_params(
        N, scaling_bits=28, num_levels=3, use_security_budget=False
    )
    ctx = make_context(params)
    sk = rlwe_mod.keygen(ctx, jax.random.key(0))
    return params, ctx, sk


def rand_data(count):
    return RNG.uniform(-1, 1, count) + 1j * RNG.uniform(-1, 1, count)


def test_encode_decode_roundtrip():
    params, ctx, sk = setup()
    data = rand_data(N // 2)
    pt = ckks.encode(data, params)
    out = ckks.decode(pt, params)
    np.testing.assert_allclose(out, data, atol=1e-6)


def test_encrypt_decrypt():
    params, ctx, sk = setup()
    data = rand_data(N // 2)
    pt = ckks.encode(data, params)
    ct = ckks.encrypt(ctx, pt, sk, jax.random.key(1))
    out = ckks.decode(ckks.decrypt(ctx, ct, sk), params)
    # fresh noise ~ sigma*sqrt(n)/Delta
    np.testing.assert_allclose(out, data, atol=2**-13)


def test_add_sub_mult_plain():
    params, ctx, sk = setup()
    a, b = rand_data(N // 2), rand_data(N // 2)
    pa = ckks.encode(a, params)
    pb = ckks.encode(b, params)
    ct = ckks.encrypt(ctx, pa, sk, jax.random.key(2))
    got_add = ckks.decode(ckks.decrypt(ctx, ckks.add_plain(ctx, ct, pb), sk), params)
    np.testing.assert_allclose(got_add, a + b, atol=2**-12)
    got_sub = ckks.decode(ckks.decrypt(ctx, ckks.sub_plain(ctx, ct, pb), sk), params)
    np.testing.assert_allclose(got_sub, a - b, atol=2**-12)
    prod = ckks.mult_plain(ctx, ct, pb)
    prod = ckks.rescale(ctx, prod)
    got = ckks.decode(ckks.decrypt(ctx, prod, sk), params)
    np.testing.assert_allclose(got, a * b, atol=2**-10)


def test_ct_add():
    params, ctx, sk = setup()
    a, b = rand_data(N // 2), rand_data(N // 2)
    ca = ckks.encrypt(ctx, ckks.encode(a, params), sk, jax.random.key(3))
    cb = ckks.encrypt(ctx, ckks.encode(b, params), sk, jax.random.key(4))
    got = ckks.decode(ckks.decrypt(ctx, ckks.add(ctx, ca, cb), sk), params)
    np.testing.assert_allclose(got, a + b, atol=2**-12)


def test_mult_relin_rescale():
    params, ctx, sk = setup()
    rlk = keys_mod.relin_key(ctx, sk, jax.random.key(5))
    a, b = rand_data(N // 2), rand_data(N // 2)
    ca = ckks.encrypt(ctx, ckks.encode(a, params), sk, jax.random.key(6))
    cb = ckks.encrypt(ctx, ckks.encode(b, params), sk, jax.random.key(7))
    prod = ckks.mult(ctx, ca, cb, rlk)
    assert prod.level == ca.level  # relin keeps level; rescale drops
    prod = ckks.rescale(ctx, prod)
    assert prod.level == ca.level - 1
    got = ckks.decode(ckks.decrypt(ctx, prod, sk), params)
    np.testing.assert_allclose(got, a * b, atol=2**-9)


def test_deep_mult_chain():
    """Squaring chain across all levels (Basel-style depth)."""
    params, ctx, sk = setup()
    rlk = keys_mod.relin_key(ctx, sk, jax.random.key(8))
    a = rand_data(N // 2) * 0.5
    ct = ckks.encrypt(ctx, ckks.encode(a, params), sk, jax.random.key(9))
    expect = a
    for lvl in range(2):
        ct = ckks.rescale(ctx, ckks.mult(ctx, ct, ct, rlk))
        expect = expect * expect
    got = ckks.decode(ckks.decrypt(ctx, ct, sk), params)
    np.testing.assert_allclose(got, expect, atol=2**-7)


def test_rescale_exact_crt_oracle():
    """Rescale output == floor((x + q/2) / q) on CRT-composed integers —
    the exactness proof of /root/reference/tests/ckks_t.cpp:136-175."""
    params, ctx, sk = setup()
    ids = (0, 1, 2)
    mods = ctx.moduli_of(ids)
    n = params.dimension
    resid = np.stack(
        [RNG.integers(0, q, n, dtype=np.uint64).astype(np.uint32) for q in mods]
    )
    poly = rns.to_ntt(ctx, rns.RnsPoly(resid, rns.COEFF, ids))
    dropped = rns.reduce_strict(
        ctx, rns.to_coeff(ctx, basecnv.div_last_rounded(ctx, poly))
    )
    got = np.asarray(dropped.data)

    composed = basecnv.compose_to_int(resid, mods)
    q_last = mods[-1]
    for i in range(n):
        v = composed[i]  # centered
        # reference convention: remainder in [-q/2, q/2) with v>=q/2 negative
        r = v % q_last
        if r >= (q_last + 1) // 2 or (r == q_last // 2):
            r -= q_last
        expect = (v - r) // q_last
        for k, q in enumerate(mods[:-1]):
            assert got[k, i] == expect % q, (i, k)


def test_rotate_and_conjugate():
    params, ctx, sk = setup()
    data = rand_data(N // 2)
    ct = ckks.encrypt(ctx, ckks.encode(data, params), sk, jax.random.key(10))
    for step in (1, 3, N // 4):
        rk = keys_mod.rot_key(ctx, sk, step, jax.random.key(100 + step))
        got = ckks.decode(ckks.decrypt(ctx, ckks.rotate(ctx, ct, rk, step), sk), params)
        # reference convention: slot i moves to slot i+step
        # (/root/reference/tests/ckks_t.cpp:436)
        np.testing.assert_allclose(got, np.roll(data, step), atol=2**-9)
    ck = keys_mod.conj_key(ctx, sk, jax.random.key(11))
    got = ckks.decode(ckks.decrypt(ctx, ckks.conjugate(ctx, ct, ck), sk), params)
    np.testing.assert_allclose(got, np.conj(data), atol=2**-9)


def test_hoisted_rotations():
    """hoisted_rotations (one shared digit decomposition, no reference
    counterpart — its rotate redoes the digit NTTs per call) must match
    both np.roll semantics and the per-call rotate() up to key-switch
    noise; also at a dropped level, exercising at_level key slicing."""
    params, ctx, sk = setup()
    data = rand_data(N // 2)
    ct = ckks.encrypt(ctx, ckks.encode(data, params), sk, jax.random.key(10))
    steps = (1, 3, N // 4)
    rks = {s: keys_mod.rot_key(ctx, sk, s, jax.random.key(100 + s))
           for s in steps}
    outs = ckks.hoisted_rotations(ctx, ct, rks, steps)
    for step in steps:
        got = ckks.decode(ckks.decrypt(ctx, outs[step], sk), params)
        np.testing.assert_allclose(got, np.roll(data, step), atol=2**-9)
        ref = ckks.decode(
            ckks.decrypt(ctx, ckks.rotate(ctx, ct, rks[step], step), sk),
            params,
        )
        np.testing.assert_allclose(got, ref, atol=2**-9)
    ct_low = ckks.mod_drop(ctx, ct)
    outs_low = ckks.hoisted_rotations(ctx, ct_low, rks, steps[:1])
    got = ckks.decode(ckks.decrypt(ctx, outs_low[steps[0]], sk), params)
    np.testing.assert_allclose(got, np.roll(data, steps[0]), atol=2**-9)


def test_rotate_accumulate():
    """Lazy giant-step accumulation: sum-of-rotations with ONE deferred
    special-prime division must match the eager rotate-then-add result up
    to key-switch noise (the division is linear up to rounding)."""
    params, ctx, sk = setup()
    rng = np.random.default_rng(21)
    datas = [rand_data(N // 2) for _ in range(3)]
    cts = [
        ckks.encrypt(ctx, ckks.encode(d, params), sk, jax.random.key(30 + i))
        for i, d in enumerate(datas)
    ]
    steps = (0, 2, 5)
    rks = {s: keys_mod.rot_key(ctx, sk, s, jax.random.key(300 + s))
           for s in steps if s}
    out = ckks.rotate_accumulate(ctx, list(zip(cts, steps)), rks)
    got = ckks.decode(ckks.decrypt(ctx, out, sk), params)
    want = sum(np.roll(d, s) for d, s in zip(datas, steps))
    np.testing.assert_allclose(got, want, atol=2**-8)
    # all-step-0 path: plain sum, no key switch
    out0 = ckks.rotate_accumulate(ctx, [(c, 0) for c in cts], {})
    got0 = ckks.decode(ckks.decrypt(ctx, out0, sk), params)
    np.testing.assert_allclose(got0, sum(datas), atol=2**-8)


def test_batched_ciphertexts():
    """Leading batch dims: many ciphertexts in one tensor op (the FHE analog
    of data parallelism, new in the TPU design)."""
    params, ctx, sk = setup()
    batch = 4
    datas = [rand_data(N // 2) for _ in range(batch)]
    pts = [ckks.encode(d, params) for d in datas]
    stacked = rns.RnsPoly(
        np.stack([np.asarray(p.poly.data) for p in pts]),
        rns.COEFF,
        pts[0].poly.limb_ids,
    )
    pt = ckks.CkksPt(stacked, pts[0].scaling_factor)
    ct = ckks.encrypt(ctx, pt, sk, jax.random.key(12))
    dec = rlwe_mod.decrypt_core(ctx, rlwe_mod.RlweCt(ct.c0, ct.c1), sk)
    for i, d in enumerate(datas):
        one = ckks.CkksPt(
            rns.RnsPoly(dec.data[i], rns.COEFF, dec.limb_ids), ct.scaling_factor
        )
        np.testing.assert_allclose(ckks.decode(one, params), d, atol=2**-12)


def test_batched_encode_decode_encrypt():
    """encode/decode vectorize over leading batch dims; a batched
    encrypt+square round trip matches per-item results."""
    params, ctx, sk = setup()
    rng = np.random.default_rng(12)
    B = 3
    vals = rng.uniform(-1, 1, (B, N // 2))
    pt = ckks.encode(vals, params)
    assert pt.poly.data.shape[:-2] == (B,)
    back = np.real(ckks.decode(pt, params))
    np.testing.assert_allclose(back, vals, atol=1e-6)
    ct = ckks.encrypt(ctx, pt, sk, jax.random.key(77))
    got = np.real(ckks.decode(ckks.decrypt(ctx, ct, sk), params))
    np.testing.assert_allclose(got, vals, atol=2**-12)


def test_encode_decompose_exact_vs_bigint():
    """Device digit decomposition == exact Python-int residue decomposition
    for coefficients spanning several limbs (role of the reference's UBInt
    encode path, basics.cpp:226-254)."""
    from hehub_tpu.utils import hostmath as hm

    params, ctx, sk = setup()
    ids = (0, 1, 2)
    mods = ctx.moduli_of(ids)
    ints = RNG.integers(-(2**61), 2**61, N)
    coeffs = ints.astype(np.float64)  # rint-exact by construction below
    ints = np.rint(coeffs).astype(object)  # the integers the floats denote
    digits, neg = ckks._digitize(coeffs)
    got = np.asarray(ckks.decompose_digits(ctx, digits, neg, ids).data)
    got = got % np.asarray(mods, np.uint32)[:, None]
    expect = hm.decompose_rns([int(v) for v in ints], list(mods))
    np.testing.assert_array_equal(got, expect)


def test_garner_decode_matches_bigint_oracle():
    """Device mixed-radix + host float64 evaluation == exact CRT compose."""
    from hehub_tpu.core import basecnv as bc

    params, ctx, sk = setup()
    ids = (0, 1, 2)
    mods = ctx.moduli_of(ids)
    resid = np.stack(
        [RNG.integers(0, q, N, dtype=np.uint64).astype(np.uint32) for q in mods]
    )
    digits = np.asarray(bc.to_mixed_radix(ctx, resid, ids, 3))
    got = ckks._mixed_radix_to_float(digits, mods)
    expect = np.asarray(
        [float(v) for v in bc.compose_to_int(resid, mods)], np.float64
    )
    np.testing.assert_allclose(got, expect, rtol=2**-50)


def test_high_precision_roundtrip():
    """48-bit scaling factor (beyond any single 30-bit limb): batched
    encode/decode round trip at ~2^-40 accuracy — the regime the reference
    reaches only through its UBInt paths."""
    params, ctx, sk = setup()
    vals = RNG.uniform(-1, 1, (2, N // 2)) + 1j * RNG.uniform(-1, 1, (2, N // 2))
    pt = ckks.encode(vals, params, scaling_factor=2.0**48)
    out = ckks.decode(pt, params)
    np.testing.assert_allclose(out, vals, atol=2**-40)
    ct = ckks.encrypt(ctx, pt, sk, jax.random.key(31))
    got = ckks.decode(ckks.decrypt(ctx, ct, sk), params)
    np.testing.assert_allclose(got, vals, atol=2**-33)


def test_high_precision_mult():
    """ct-ct mult + relin at a 48-bit effective scale passes at atol 2^-20
    (VERDICT round-1 done-criterion; the grid itself runs in bench.py)."""
    params = create_ckks_params(
        N, scaling_bits=48, num_levels=5, use_security_budget=False
    )
    ctx = make_context(params)
    sk = rlwe_mod.keygen(ctx, jax.random.key(40))
    rlk = keys_mod.relin_key(ctx, sk, jax.random.key(41))
    a = RNG.uniform(-1, 1, N // 2) + 1j * RNG.uniform(-1, 1, N // 2)
    b = RNG.uniform(-1, 1, N // 2) + 1j * RNG.uniform(-1, 1, N // 2)
    ca = ckks.encrypt(ctx, ckks.encode(a, params), sk, jax.random.key(42))
    cb = ckks.encrypt(ctx, ckks.encode(b, params), sk, jax.random.key(43))
    prod = ckks.rescale_auto(ctx, ckks.mult(ctx, ca, cb, rlk))
    assert prod.scaling_factor >= 2.0**48
    got = ckks.decode(ckks.decrypt(ctx, prod, sk), params)
    np.testing.assert_allclose(got, a * b, atol=2**-20)


def test_batched_rotate_and_conjugate():
    """Galois ops broadcast over leading batch dims (gathers + ext_prod are
    batch-transparent)."""
    params, ctx, sk = setup()
    rng = np.random.default_rng(13)
    vals = rng.uniform(-1, 1, (3, N // 2))
    ct = ckks.encrypt(ctx, ckks.encode(vals, params), sk, jax.random.key(20))
    rk = keys_mod.rot_key(ctx, sk, 5, jax.random.key(21))
    got = np.real(ckks.decode(
        ckks.decrypt(ctx, ckks.rotate(ctx, ct, rk, 5), sk), params))
    np.testing.assert_allclose(got, np.roll(vals, 5, axis=-1), atol=2e-4)
    ck = keys_mod.conj_key(ctx, sk, jax.random.key(22))
    got = ckks.decode(ckks.decrypt(ctx, ckks.conjugate(ctx, ct, ck), sk), params)
    np.testing.assert_allclose(got, np.conj(vals), atol=2e-4)


def test_decode_large_magnitude_slots():
    """Slots of |z| ~ 2^12 exceed decode_limb_count's default 2^8 magnitude
    budget: the sentinel-limb probe must detect the would-be aliasing and
    transparently re-decode over the full chain (VERDICT r2 item 9 /
    ADVICE r2: previously a silent mis-decode)."""
    params, ctx, sk = setup()
    big = RNG.uniform(-1, 1, N // 2) * 2.0**12
    pt = ckks.encode(big, params)
    out = np.real(ckks.decode(pt, params))
    np.testing.assert_allclose(out, big, atol=1e-3)
    # explicit limbs= still honors the caller's choice (no probe)
    out2 = np.real(ckks.decode(pt, params, limbs=len(params.moduli)))
    np.testing.assert_allclose(out2, big, atol=1e-3)


def test_scalar_encode_decode():
    """Reference scalar sugar: ckks::encode(double) replicates into all
    slots, decode<T> averages them back (ckks.h:123-144, 167-170)."""
    params, ctx, sk = setup()
    pt = ckks.encode_scalar(0.375, params)
    assert abs(ckks.decode_scalar(pt, params) - 0.375) < 1e-8
    ct = ckks.encrypt(ctx, pt, sk, jax.random.key(33))
    got = ckks.decode_scalar(ckks.decrypt(ctx, ct, sk), params)
    # averaging n/2 slots shrinks fresh noise by ~sqrt(n/2)
    assert abs(got - 0.375) < 2**-14


def test_native_host_kernels_match_numpy():
    """The C++ host pipeline (native/loader: digitize, mixed_radix,
    encode/decode pre+post) vs the pure-numpy fallbacks. Integer kernels
    must be BITWISE equal; the float transform halves agree to <=1 ulp
    (numpy's vectorized complex multiply FMA-contracts; the C++ is
    compiled -ffp-contract=off to match numpy's *integer* semantics
    exactly, see csrc/hehub_native.cpp)."""
    from hehub_tpu.native import loader

    if not loader.available():
        pytest.skip("native runtime not built")
    n = 512
    half = n // 2
    scale = 2.0**28
    mods = [1073643521, 1073479681, 1072496641, 1071513601]

    def with_fallback(fn):
        orig = loader.available
        loader.available = lambda: False
        try:
            return fn()
        finally:
            loader.available = orig

    # digitize: bitwise, incl. half-to-even ties and negatives, batched
    c = RNG.uniform(-(2.0**55), 2.0**55, (3, n))
    c[0, :6] = [0.5, -0.5, 1.5, 2.5, -2.5, 2.0**61]
    ref = with_fallback(lambda: ckks._digitize(c))
    got = ckks._digitize(c)
    np.testing.assert_array_equal(got[0], ref[0])
    np.testing.assert_array_equal(got[1], ref[1])
    with pytest.raises(ValueError):
        ckks._digitize(np.array([2.0**62]))

    # mixed radix: bitwise, plain + sentinel split
    dg = RNG.integers(0, mods[0], (2, 4, n)).astype(np.uint32)
    ref = with_fallback(lambda: ckks._mixed_radix_to_float(dg, mods))
    np.testing.assert_array_equal(ckks._mixed_radix_to_float(dg, mods), ref)
    ref_v, ref_top = with_fallback(
        lambda: ckks._mixed_radix_to_float(dg, mods, split_top=True))
    got_v, got_top = ckks._mixed_radix_to_float(dg, mods, split_top=True)
    np.testing.assert_array_equal(got_v, ref_v)
    if got_top is None:
        assert not np.any(ref_top)
    else:
        np.testing.assert_array_equal(got_top, ref_top)

    # encode host: digit output identical (rint absorbs the <=1 ulp
    # transform difference except at exact .5 ties, absent here)
    data = RNG.uniform(-1, 1, (2, half)) + 1j * RNG.uniform(-1, 1, (2, half))
    ref = with_fallback(lambda: ckks._encode_host(data, n, scale))
    got = ckks._encode_host(data, n, scale)
    np.testing.assert_array_equal(got[0], ref[0])
    np.testing.assert_array_equal(got[1], ref[1])
    # short input takes the padding branch
    short = data[..., :5]
    ref = with_fallback(lambda: ckks._encode_host(short, n, scale))
    got = ckks._encode_host(short, n, scale)
    np.testing.assert_array_equal(got[0], ref[0])

    # decode host: <=1 ulp, full + partial count
    coeffs = np.round(RNG.uniform(-(2.0**40), 2.0**40, (2, n)))
    ref = with_fallback(lambda: ckks._decode_host(coeffs, n, scale, half))
    np.testing.assert_allclose(
        ckks._decode_host(coeffs, n, scale, half), ref, rtol=1e-13)
    ref = with_fallback(lambda: ckks._decode_host(coeffs, n, scale, 7))
    np.testing.assert_allclose(
        ckks._decode_host(coeffs, n, scale, 7), ref, rtol=1e-13)
