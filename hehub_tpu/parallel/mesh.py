"""Device-mesh sharding for FHE workloads (new TPU-native component; the
reference is single-process single-thread — SURVEY.md §2.6).

Two mesh axes:
  * "batch" — independent ciphertexts sharded over the leading batch dim
    (the FHE analog of data parallelism; embarrassingly parallel, no
    collectives).
  * "limb"  — RNS limbs sharded over the [-2] axis (the analog of tensor
    parallelism). NTT, pointwise mults, and rescale's per-limb work are
    limb-local; the external product's digit matrix needs each source digit
    on every destination limb, which GSPMD lowers to an all-gather of
    coefficient digits over ICI.

All scheme ops are pure jnp on [..., L, n] tensors, so sharding is expressed
purely through NamedSharding on inputs plus with_sharding_constraint hints —
XLA inserts the collectives (psum/all-gather) where the math demands them.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = "batch"
LIMB_AXIS = "limb"


def make_mesh(
    batch: int = 1, limb: int = 1, devices: Optional[Sequence] = None
) -> Mesh:
    devs = np.asarray(devices if devices is not None else jax.devices())
    if batch * limb > devs.size:
        raise ValueError(f"mesh {batch}x{limb} exceeds {devs.size} devices")
    grid = devs[: batch * limb].reshape(batch, limb)
    return Mesh(grid, (BATCH_AXIS, LIMB_AXIS))


def ct_pspec(batch_dims: int = 1, shard_limbs: bool = False) -> P:
    """PartitionSpec for a ciphertext tensor [batch..., L, n]."""
    spec = [None] * batch_dims + [LIMB_AXIS if shard_limbs else None, None]
    if batch_dims:
        spec[0] = BATCH_AXIS
    return P(*spec)


def shard_poly_data(mesh: Mesh, data, batch_dims: int = 1, shard_limbs: bool = False):
    """device_put a polynomial tensor with (batch, limb) sharding."""
    return jax.device_put(
        data, NamedSharding(mesh, ct_pspec(batch_dims, shard_limbs))
    )


def constrain(data, mesh: Mesh, batch_dims: int = 1, shard_limbs: bool = False):
    """Sharding hint inside jit bodies."""
    return jax.lax.with_sharding_constraint(
        data, NamedSharding(mesh, ct_pspec(batch_dims, shard_limbs))
    )
