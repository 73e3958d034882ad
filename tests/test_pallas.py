"""Pallas fused-kernel equivalence: bitwise identical to the XLA stage-chain
path (interpret mode on CPU)."""

import numpy as np

from hehub_tpu.core.context import RlweParams, make_context
from hehub_tpu.ops import ntt as nttmod
from hehub_tpu.ops.pallas import ntt_pallas
from hehub_tpu.utils import hostmath as hm

RNG = np.random.default_rng(5)


def test_pallas_ntt_bitwise_equal():
    n = 512
    primes = hm.gen_ntt_primes(30, 3, n)
    ctx = make_context(RlweParams(dimension=n, moduli=primes[1:], special_mod=primes[0]))
    ids = (0, 1, 2)
    qs = np.asarray(ctx.moduli_of(ids), np.uint32)[:, None]
    x = RNG.integers(0, 1 << 31, (3, 3, n)).astype(np.uint32) % (2 * qs)
    ref = np.asarray(nttmod.ntt(ctx, x, ids))
    got = np.asarray(ntt_pallas.make_ntt(ctx, ids, inverse=False, interpret=True)(x))
    np.testing.assert_array_equal(ref, got)
    # the inverse kernel distributes the GS twiddle (lo*w - hi*w), so its
    # lazy representatives differ from the stage chain's (lo-hi)*w —
    # compare strictly reduced (equal mod q)
    refi = np.asarray(nttmod.intt(ctx, ref, ids)) % qs
    goti = (
        np.asarray(ntt_pallas.make_ntt(ctx, ids, inverse=True, interpret=True)(got))
        % qs
    )
    np.testing.assert_array_equal(refi, goti)


def test_pallas_row_padding():
    """Row counts that are neither <=8 nor multiples of 8 get padded."""
    n = 512
    primes = hm.gen_ntt_primes(30, 1, n)
    ctx = make_context(RlweParams(dimension=n, moduli=primes))
    ids = (0,)
    q = primes[0]
    x = RNG.integers(0, 2 * q, (11, 1, n)).astype(np.uint32)
    ref = np.asarray(nttmod.ntt(ctx, x, ids))
    got = np.asarray(ntt_pallas.make_ntt(ctx, ids, inverse=False, interpret=True)(x))
    np.testing.assert_array_equal(ref, got)


def test_pallas_ext_prod_bitwise_equal():
    """Fused external-product kernel == XLA path, bitwise."""
    import jax

    from hehub_tpu.core import rns as rns_mod
    from hehub_tpu.ops.pallas import extprod_pallas
    from hehub_tpu.rlwe import keys as keys_mod
    from hehub_tpu.rlwe import rgsw as rgsw_mod
    from hehub_tpu.rlwe import rlwe as rlwe_mod

    n = 1024
    primes = hm.gen_ntt_primes(30, 4, n)
    ctx = make_context(
        RlweParams(dimension=n, moduli=primes[1:], special_mod=primes[0])
    )
    sk = rlwe_mod.keygen(ctx, jax.random.key(0))
    rlk = keys_mod.relin_key(ctx, sk, jax.random.key(1))
    ids = (0, 1, 2)
    ids_ext = rlk.limb_ids
    qs = np.asarray(ctx.moduli_of(ids), np.uint32)[:, None]
    x = RNG.integers(0, 1 << 31, (2, 3, n)).astype(np.uint32) % (2 * qs)
    poly = rns_mod.RnsPoly(x, rns_mod.NTT, ids)

    # XLA reference
    want = rgsw_mod.ext_prod(ctx, poly, rlk)

    # fused kernel in interpret mode
    import jax.numpy as jnp

    d = rns_mod.reduce_strict(ctx, rns_mod.to_coeff(ctx, poly))
    digits = d.data.reshape(-1, 3, n)
    key_t = jnp.transpose(rlk.data[:3], (2, 0, 1, 3))
    out = extprod_pallas.make_ext_prod(ctx, ids, ids_ext, interpret=True)(
        digits, key_t
    )
    for half, ref in ((0, want.c0), (1, want.c1)):
        got = np.asarray(jnp.transpose(out[:, :, half], (1, 0, 2))).reshape(
            2, 4, n
        )
        np.testing.assert_array_equal(got, np.asarray(ref.data))


def test_pallas_ext_prod_converted_bitwise_equal():
    """Fused alpha=2 kernel (pre-converted digits) == XLA path, bitwise."""
    import jax
    import jax.numpy as jnp

    from hehub_tpu.core import basecnv
    from hehub_tpu.core import rns as rns_mod
    from hehub_tpu.ops.pallas import extprod_pallas
    from hehub_tpu.rlwe import keys as keys_mod
    from hehub_tpu.rlwe import rlwe as rlwe_mod
    from hehub_tpu.rlwe import rgsw as rgsw_mod

    n = 1024
    primes = hm.gen_ntt_primes(30, 6, n)
    ctx = make_context(
        RlweParams(dimension=n, moduli=primes[2:], special_mod=tuple(primes[:2]))
    )
    sk = rlwe_mod.keygen(ctx, jax.random.key(0))
    rlk = keys_mod.relin_key(ctx, sk, jax.random.key(1), alpha=2)
    ids = (0, 1, 2, 3)
    ids_ext = rlk.limb_ids
    qs = np.asarray(ctx.moduli_of(ids), np.uint32)[:, None]
    x = RNG.integers(0, 1 << 31, (2, 4, n)).astype(np.uint32) % (2 * qs)
    poly = rns_mod.RnsPoly(x, rns_mod.NTT, ids)

    want = rgsw_mod.ext_prod(ctx, poly, rlk)  # XLA path (CPU)

    d = rns_mod.reduce_strict(ctx, rns_mod.to_coeff(ctx, poly))
    convs = []
    for grp in ((0, 1), (2, 3)):
        gp = rns_mod.take_limbs(d, grp)
        convs.append(basecnv.base_convert(ctx, gp, ids_ext, signed=True).data)
    digits = jnp.transpose(
        jnp.stack(convs, axis=-3).reshape(-1, 2, len(ids_ext), n), (2, 0, 1, 3)
    )
    key_t = jnp.transpose(rlk.data[:2], (2, 0, 1, 3))
    out = extprod_pallas.make_ext_prod_converted(
        ctx, 2, ids_ext, interpret=True
    )(digits, key_t)
    for half, ref in ((0, want.c0), (1, want.c1)):
        got = np.asarray(jnp.transpose(out[:, :, half], (1, 0, 2))).reshape(
            2, len(ids_ext), n
        )
        np.testing.assert_array_equal(got, np.asarray(ref.data))
