"""hehub_tpu — a TPU-native RLWE homomorphic-encryption framework.

Built from scratch for JAX/XLA/Pallas with the capability surface of the
reference C++ library (BGV, CKKS, RLWE/RGSW primitives, TFHE functional
bootstrapping, homomorphic linear algebra), redesigned around:

  * dense uint32 RNS tensors of shape [..., L, n] (batch-leading),
  * 30-bit NTT primes with Shoup/Montgomery lazy arithmetic in 32-bit lanes,
  * functional, jit-traceable scheme ops (no mutable global caches),
  * explicit keyed PRNG (JAX threefry) instead of an unseeded global engine,
  * device-mesh sharding over (batch, limb) axes via jax.sharding.
"""

__version__ = "0.1.0"

from hehub_tpu.core.context import CkksParams, BgvParams, Context, make_context  # noqa: F401
