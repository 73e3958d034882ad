"""Keyed random polynomial sampling on the JAX PRNG
(≙ /root/reference/src/fhe/common/sampling.cpp:15-99, redesigned).

The reference draws from a process-global, *never seeded*
std::default_random_engine (sampling.cpp:12-13) — deterministic and not
cryptographic. Here every sampler takes an explicit jax.random key
(threefry2x32), giving reproducible-by-key, parallelizable sampling; for
production use the root key should come from OS entropy (secrets module).

Gaussian noise: σ = 3.2, truncated at 6σ (clamped rather than resampled —
a tail-mass difference of ~2e-9 which we document instead of hiding).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hehub_tpu.core import rns
from hehub_tpu.core.rns import COEFF, NTT, RnsPoly

SIGMA = 3.2
TRUNC = 6.0 * SIGMA


def _lift_signed_small(ints, ctx, limb_ids):
    """Map small signed integers [..., n] -> lazy residues [..., L, n].
    |ints| + q < 2^31, so int32 arithmetic is exact."""
    q = ctx.rows("q", limb_ids)  # [L, 1]
    x = ints[..., None, :].astype(jnp.int32)
    return jnp.where(x < 0, x + q.astype(jnp.int32), x).astype(jnp.uint32)


def ternary_poly(
    ctx, key, limb_ids: Tuple[int, ...], batch_shape=(), form=NTT
) -> RnsPoly:
    """Uniform ternary {-1,0,1} secret polynomial, NTT'd by default
    (≙ get_rand_ternary_poly, sampling.cpp:15-37)."""
    n = ctx.params.dimension
    t = jax.random.randint(key, (*batch_shape, n), -1, 2, dtype=jnp.int32)
    poly = RnsPoly(_lift_signed_small(t, ctx, limb_ids), COEFF, limb_ids)
    return rns.to_ntt(ctx, poly) if form == NTT else poly


def uniform_poly(
    ctx, key, limb_ids: Tuple[int, ...], batch_shape=(), form=NTT
) -> RnsPoly:
    """Uniform residues in [0, q_k) per limb (≙ get_rand_uniform_poly,
    sampling.cpp:39-57)."""
    n = ctx.params.dimension
    q = ctx.rows("q", limb_ids)  # [L,1] numpy
    u = jax.random.randint(
        key,
        (*batch_shape, len(limb_ids), n),
        jnp.zeros_like(q, dtype=jnp.uint32),
        jnp.asarray(q, dtype=jnp.uint32),
        dtype=jnp.uint32,
    )
    return RnsPoly(u, form, limb_ids)


def gaussian_poly(
    ctx,
    key,
    limb_ids: Tuple[int, ...],
    batch_shape=(),
    std_dev: float = SIGMA,
    form=NTT,
) -> RnsPoly:
    """Discrete-Gaussian-ish noise: rounded normal, |e| <= 6σ
    (≙ get_rand_gaussian_poly, sampling.cpp:60-88)."""
    n = ctx.params.dimension
    g = jax.random.normal(key, (*batch_shape, n), dtype=jnp.float32) * std_dev
    g = jnp.clip(jnp.round(g), -6.0 * std_dev, 6.0 * std_dev).astype(jnp.int32)
    poly = RnsPoly(_lift_signed_small(g, ctx, limb_ids), COEFF, limb_ids)
    return rns.to_ntt(ctx, poly) if form == NTT else poly


def zero_poly(ctx, limb_ids: Tuple[int, ...], batch_shape=(), form=NTT) -> RnsPoly:
    """(≙ get_zero_poly, sampling.cpp:90-97); used by the no-noise debug mode
    replacing the reference's HEHUB_DEBUG_RLWE_ZERO_C1/E compile flags."""
    return rns.zeros(ctx, limb_ids, batch_shape, form)
