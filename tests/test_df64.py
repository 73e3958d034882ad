"""df64 (double-float32) arithmetic, FFT, and the on-device CKKS codec
(ops/df64.py + the models/ckks.py device paths). Runs on the CPU mesh with
the codec force-enabled — the df64 building blocks are IEEE f32 exact, so
CPU and TPU produce identical results."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hehub_tpu import config
from hehub_tpu.core import basecnv
from hehub_tpu.core.context import create_ckks_params, make_context
from hehub_tpu.models import ckks
from hehub_tpu.ops import df64
from hehub_tpu.rlwe import rlwe as rlwe_mod


def test_df64_mul_add_precision():
    rng = np.random.default_rng(0)
    a = rng.uniform(-1, 1, 4096) * 2.0 ** rng.integers(-10, 40, 4096)
    b = rng.uniform(-1, 1, 4096) * 2.0 ** rng.integers(-10, 40, 4096)
    ah = df64.from_f64(a)
    bh = df64.from_f64(b)
    mul = jax.jit(lambda x, y: df64.mul_dd(x, y))
    add = jax.jit(lambda x, y: df64.add_dd(x, y))
    mh, ml = mul(ah, bh)
    sh, sl = add(ah, bh)
    m = df64.to_f64(np.asarray(mh), np.asarray(ml))
    s = df64.to_f64(np.asarray(sh), np.asarray(sl))
    assert np.max(np.abs(m - a * b) / np.maximum(np.abs(a * b), 1e-300)) < 2.0**-44
    ref = a + b
    denom = np.maximum(np.abs(ref), np.maximum(np.abs(a), np.abs(b)))
    assert np.max(np.abs(s - ref) / denom) < 2.0**-44


def test_balanced_digits_roundtrip():
    rng = np.random.default_rng(1)
    v = np.rint(rng.uniform(-1, 1, 8192) * 2.0**44)
    vh, vl = df64.from_f64(v)
    d0, d1, d2 = jax.jit(df64.balanced_digits)(jnp.asarray(vh), jnp.asarray(vl))
    d0, d1, d2 = (np.asarray(d, np.int64) for d in (d0, d1, d2))
    assert np.abs(d0).max() < 2**22 and np.abs(d1).max() < 2**22
    recomposed = d0 + (d1 << 22) + (d2 << 44)
    assert np.abs(recomposed - v.astype(np.int64)).max() <= 1


def test_decompose_balanced_matches_digitize():
    params = create_ckks_params(256, scaling_bits=28, num_levels=2,
                                use_security_budget=False)
    ctx = make_context(params)
    ids = (0, 1, 2)
    rng = np.random.default_rng(2)
    v = rng.integers(-(2**40), 2**40, (4, 256))
    # balanced digits of v via the df64 extraction
    vh, vl = df64.from_f64(v.astype(np.float64))
    d0, d1, d2 = df64.balanced_digits(jnp.asarray(vh), jnp.asarray(vl))
    digits = jnp.stack([d0, d1, d2], axis=-2)
    got = np.asarray(
        jax.jit(lambda d: basecnv.decompose_balanced(ctx, d, ids).data)(digits)
    )
    mods = ctx.moduli_of(ids)
    for k, q in enumerate(mods):
        assert np.array_equal(got[..., k, :] % q, v % q)


def test_fft_matches_numpy():
    m = 4096
    rng = np.random.default_rng(3)
    x = rng.uniform(-1, 1, m) + 1j * rng.uniform(-1, 1, m)
    br = df64.bitrev_perm(m)
    x4 = tuple(jnp.asarray(p) for p in df64.cfrom_c128(x[br]))
    out = jax.jit(lambda a: df64.fft(a, m))(x4)
    got = df64.cto_c128(*(np.asarray(p) for p in out))
    ref = np.fft.fft(x)
    assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 1e-11


def test_pallas_fft_matches_xla():
    """The fused Pallas FFT kernel (interpret mode on CPU) computes the
    same transform as the XLA stage chain. Tolerances are backend-scoped:
    XLA:CPU mis-rounds f32 add chains inside broadcast-bearing fusions
    (see ops/df64.two_sum's caveat), so BATCHED rows — where the [G, B]
    twiddle table broadcasts against [bb, G, B] data — only reach the f32
    floor on CPU, while the unbatched case (degenerate broadcast) shows
    the true df64 precision both kernels deliver on TPU. The on-chip
    accuracy gate is bench.py's encode/decode roundtrip assert."""
    from hehub_tpu.ops.pallas import fft_pallas

    m = 1024
    rng = np.random.default_rng(5)
    br = df64.bitrev_perm(m)
    for batch, tol in (((), 1e-11), ((3,), 3e-6)):
        x = rng.uniform(-1, 1, (*batch, m)) + 1j * rng.uniform(
            -1, 1, (*batch, m))
        x4 = tuple(jnp.asarray(p) for p in df64.cfrom_c128(x[..., br]))
        ref = jax.jit(lambda a: df64.fft_xla(a, m))(x4)
        got = fft_pallas.fft(x4, m, interpret=True)
        exact = np.fft.fft(x, axis=-1)
        scale = np.abs(exact).max()
        gc = df64.cto_c128(*(np.asarray(p) for p in got))
        rc = df64.cto_c128(*(np.asarray(p) for p in ref))
        assert np.abs(gc - exact).max() / scale < tol
        assert np.abs(rc - exact).max() / scale < tol


@pytest.fixture
def df64_forced():
    old = config.use_df64_codec
    config.use_df64_codec = True
    yield
    config.use_df64_codec = old


def _setup(n=2048, levels=3, scale_bits=28):
    params = create_ckks_params(n, scaling_bits=scale_bits,
                                num_levels=levels - 1,
                                use_security_budget=False)
    ctx = make_context(params)
    sk = rlwe_mod.keygen(ctx, jax.random.key(0))
    return params, ctx, sk


def test_device_encode_matches_host(df64_forced):
    params, ctx, sk = _setup()
    n = params.dimension
    rng = np.random.default_rng(4)
    v = rng.uniform(-1, 1, n // 2) + 1j * rng.uniform(-1, 1, n // 2)
    pt_dev = ckks.encode(v, params)
    config.use_df64_codec = False
    pt_host = ckks.encode(v, params)
    # coefficients agree up to the df64 rounding of +-1 at the scale
    a = np.asarray(pt_dev.poly.data).astype(np.int64)
    b = np.asarray(pt_host.poly.data).astype(np.int64)
    mods = np.asarray(ctx.moduli_of(pt_dev.poly.limb_ids), np.int64)
    diff = (a - b) % mods[:, None]
    diff = np.minimum(diff, mods[:, None] - diff)
    assert diff.max() <= 1
    # and the host decode of the device encode is accurate
    got = ckks.decode(pt_host, params)
    got_dev = ckks.decode(pt_dev, params)
    assert np.abs(got_dev - v).max() < 1e-6
    assert np.abs(got - got_dev).max() < 1e-6


def test_device_decode_matches_host(df64_forced):
    params, ctx, sk = _setup()
    n = params.dimension
    rng = np.random.default_rng(5)
    v = rng.uniform(-1, 1, n // 2) + 1j * rng.uniform(-1, 1, n // 2)
    config.use_df64_codec = False
    pt = ckks.encode(v, params)
    host = ckks.decode(pt, params)
    config.use_df64_codec = True
    dev = ckks.decode(pt, params)
    assert np.abs(dev - host).max() < 1e-9


def test_device_roundtrip_through_encryption(df64_forced):
    params, ctx, sk = _setup()
    n = params.dimension
    rng = np.random.default_rng(6)
    v = rng.uniform(-1, 1, n // 2)
    pt = ckks.encode(v, params)
    ct = ckks.encrypt(ctx, pt, sk, jax.random.key(7))
    got = np.real(ckks.decode(ckks.decrypt(ctx, ct, sk), params))
    assert np.abs(got - v).max() < 1e-4


def test_device_decode_overflow_probe(df64_forced):
    """|z| ~ 2^12 slots overflow the default K-limb budget: the device
    sentinel must fire and decode must still return the right values via
    the host full-chain fallback."""
    params, ctx, sk = _setup(levels=4)
    n = params.dimension
    rng = np.random.default_rng(7)
    v = rng.uniform(-1, 1, n // 2) * 2.0**12
    pt = ckks.encode(v, params, scaling_factor=2.0**28)
    got = np.real(ckks.decode(pt, params))
    assert np.abs(got - v).max() < 1e-3


def test_large_scale_falls_back_to_host(df64_forced):
    """scale 2^48 exceeds the df64 coefficient bound: encode must take the
    float64 host path and stay exact."""
    params, ctx, sk = _setup(levels=4, scale_bits=48)
    n = params.dimension
    rng = np.random.default_rng(8)
    v = rng.uniform(-1, 1, n // 2)
    pt = ckks.encode(v, params, scaling_factor=2.0**48)
    got = np.real(ckks.decode(pt, params))
    assert np.abs(got - v).max() < 1e-9
