"""On-chip bitwise check of the fused external-product kernels (both
alpha=1 and alpha=2 pre-converted) against the XLA path after the tail
table layout change to natural [G, B]."""
import jax
import jax.numpy as jnp
import numpy as np

from hehub_tpu import config
from hehub_tpu.core.context import RlweParams, make_context
from hehub_tpu.core import rns as rns_mod, basecnv
from hehub_tpu.rlwe import keys as keys_mod, rlwe as rlwe_mod, rgsw as rgsw_mod
from hehub_tpu.utils import hostmath as hm

RNG = np.random.default_rng(5)

# alpha=1
n = 4096
primes = hm.gen_ntt_primes(30, 4, n)
ctx = make_context(RlweParams(dimension=n, moduli=primes[1:], special_mod=primes[0]))
sk = rlwe_mod.keygen(ctx, jax.random.key(0))
rlk = keys_mod.relin_key(ctx, sk, jax.random.key(1))
ids = (0, 1, 2)
ids_ext = rlk.limb_ids
qs = np.asarray(ctx.moduli_of(ids), np.uint32)[:, None]
x = RNG.integers(0, 1 << 31, (2, 3, n)).astype(np.uint32) % (2 * qs)
poly = rns_mod.RnsPoly(jax.device_put(x), rns_mod.NTT, ids)

config.use_pallas = False
want = jax.jit(lambda p: rgsw_mod.ext_prod(ctx, p, rlk))(poly)
config.use_pallas = True
got = jax.jit(lambda p: rgsw_mod.ext_prod(ctx, p, rlk))(poly)
ok0 = np.array_equal(np.asarray(want.c0.data), np.asarray(got.c0.data))
ok1 = np.array_equal(np.asarray(want.c1.data), np.asarray(got.c1.data))
print(f"alpha=1: c0 bitwise={ok0} c1 bitwise={ok1}")

# alpha=2 (pre-converted digits)
primes = hm.gen_ntt_primes(30, 6, n)
ctx = make_context(RlweParams(dimension=n, moduli=primes[2:], special_mod=tuple(primes[:2])))
sk = rlwe_mod.keygen(ctx, jax.random.key(0))
rlk = keys_mod.relin_key(ctx, sk, jax.random.key(1), alpha=2)
ids = (0, 1, 2, 3)
qs = np.asarray(ctx.moduli_of(ids), np.uint32)[:, None]
x = RNG.integers(0, 1 << 31, (2, 4, n)).astype(np.uint32) % (2 * qs)
poly = rns_mod.RnsPoly(jax.device_put(x), rns_mod.NTT, ids)

config.use_pallas = False
want = jax.jit(lambda p: rgsw_mod.ext_prod(ctx, p, rlk))(poly)
config.use_pallas = True
got = jax.jit(lambda p: rgsw_mod.ext_prod(ctx, p, rlk))(poly)
ok0 = np.array_equal(np.asarray(want.c0.data), np.asarray(got.c0.data))
ok1 = np.array_equal(np.asarray(want.c1.data), np.asarray(got.c1.data))
print(f"alpha=2: c0 bitwise={ok0} c1 bitwise={ok1}")
