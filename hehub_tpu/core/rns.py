"""RnsPoly: the dense-tensor RNS polynomial (≙ RnsPolynomial,
/root/reference/src/fhe/common/rns.h:15-156, redesigned as an immutable
JAX pytree).

data: uint32 [..., L, n] with leading batch dims; every residue is lazy in
[0, 2q). `form` ('coeff' | 'ntt') is the trace-time representation tag
(≙ PolyRepForm, rns.h:153-155); `limb_ids` are static indices into the
Context's modulus axis, so level changes (≙ add/remove_components,
rns.cpp:33-56) are static slices, never data-dependent.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hehub_tpu.ops import modarith as ma
from hehub_tpu.ops import ntt as nttmod

COEFF = "coeff"
NTT = "ntt"


@jax.tree_util.register_pytree_node_class
class RnsPoly:
    __slots__ = ("data", "form", "limb_ids")

    def __init__(self, data, form: str, limb_ids: Tuple[int, ...]):
        self.data = data
        self.form = form
        self.limb_ids = tuple(limb_ids)

    # -- pytree protocol ---------------------------------------------------
    def tree_flatten(self):
        return (self.data,), (self.form, self.limb_ids)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0], aux[1])

    # -- structure ----------------------------------------------------------
    @property
    def dimension(self) -> int:
        return self.data.shape[-1]

    @property
    def limb_count(self) -> int:
        return len(self.limb_ids)

    @property
    def batch_shape(self):
        return self.data.shape[:-2]

    def with_data(self, data, form=None):
        return RnsPoly(data, form or self.form, self.limb_ids)

    def __repr__(self):
        return (
            f"RnsPoly(shape={tuple(self.data.shape)}, form={self.form}, "
            f"limbs={self.limb_ids})"
        )


def _check(a: RnsPoly, b: RnsPoly, form=None):
    if a.limb_ids != b.limb_ids:
        raise ValueError(f"limb mismatch: {a.limb_ids} vs {b.limb_ids}")
    if a.form != b.form:
        raise ValueError(f"representation mismatch: {a.form} vs {b.form}")
    if form is not None and a.form != form:
        raise ValueError(f"expected {form} form, got {a.form}")


# ---------------------------------------------------------------------------
# Elementwise ops (≙ RnsIntVec operators, rns.cpp:58-171)
# ---------------------------------------------------------------------------


def add(ctx, a: RnsPoly, b: RnsPoly) -> RnsPoly:
    _check(a, b)
    two_q = ctx.rows("two_q", a.limb_ids)
    return a.with_data(ma.add_lazy(a.data, b.data, two_q))


def sub(ctx, a: RnsPoly, b: RnsPoly) -> RnsPoly:
    _check(a, b)
    two_q = ctx.rows("two_q", a.limb_ids)
    return a.with_data(ma.sub_lazy(a.data, b.data, two_q))


def neg(ctx, a: RnsPoly) -> RnsPoly:
    two_q = ctx.rows("two_q", a.limb_ids)
    return a.with_data(ma.neg_lazy(a.data, two_q))


def mul(ctx, a: RnsPoly, b: RnsPoly) -> RnsPoly:
    """Pointwise product; requires NTT (value) form (≙ rns.h:241-253)."""
    _check(a, b, form=NTT)
    ids = a.limb_ids
    out = ma.mul_mod_lazy(
        a.data,
        b.data,
        ctx.rows("q", ids),
        ctx.rows("neg_qinv", ids),
        ctx.rows("r_mod_q", ids),
        ctx.rows("r_shoup", ids),
    )
    return a.with_data(out)


def mul_scalar(ctx, a: RnsPoly, scalars) -> RnsPoly:
    """Multiply by per-limb host constants (≙ RnsIntVec::operator*=(vector<u64>),
    rns.cpp:152-171). `scalars`: python ints (one per limb, or a single int)."""
    from hehub_tpu.utils import hostmath as hm

    ids = a.limb_ids
    mods = ctx.moduli_of(ids)
    if isinstance(scalars, (int, np.integer)):
        scalars = [int(scalars)] * len(ids)
    w, w_sh = hm.shoup_pair_arrays(scalars, mods)
    out = ma.shoup_mul_lazy(
        a.data, w[:, None], w_sh[:, None], ctx.rows("q", ids)
    )
    return a.with_data(out)


def reduce_strict(ctx, a: RnsPoly) -> RnsPoly:
    return a.with_data(ma.reduce_strict(a.data, ctx.rows("q", a.limb_ids)))


# ---------------------------------------------------------------------------
# Transforms
# ---------------------------------------------------------------------------


def to_ntt(ctx, a: RnsPoly) -> RnsPoly:
    if a.form != COEFF:
        raise ValueError("to_ntt expects coeff form")
    return RnsPoly(nttmod.ntt(ctx, a.data, a.limb_ids), NTT, a.limb_ids)


def to_coeff(ctx, a: RnsPoly) -> RnsPoly:
    if a.form != NTT:
        raise ValueError("to_coeff expects ntt form")
    return RnsPoly(nttmod.intt(ctx, a.data, a.limb_ids), COEFF, a.limb_ids)


# ---------------------------------------------------------------------------
# Level manipulation (static)
# ---------------------------------------------------------------------------


def take_limbs(a: RnsPoly, positions: Tuple[int, ...]) -> RnsPoly:
    """Select limb rows by *position within this poly* (static gather)."""
    idx = np.asarray(positions, dtype=np.int64)
    data = jnp.take(a.data, jnp.asarray(idx), axis=-2)
    ids = tuple(a.limb_ids[p] for p in positions)
    return RnsPoly(data, a.form, ids)


def drop_last_limb(a: RnsPoly) -> RnsPoly:
    return RnsPoly(a.data[..., :-1, :], a.form, a.limb_ids[:-1])


def concat_limbs(a: RnsPoly, b: RnsPoly) -> RnsPoly:
    if a.form != b.form:
        raise ValueError("form mismatch")
    data = jnp.concatenate([a.data, b.data], axis=-2)
    return RnsPoly(data, a.form, a.limb_ids + b.limb_ids)


def zeros(ctx, limb_ids: Tuple[int, ...], batch_shape=(), form=COEFF) -> RnsPoly:
    n = ctx.params.dimension
    data = jnp.zeros((*batch_shape, len(limb_ids), n), dtype=jnp.uint32)
    return RnsPoly(data, form, limb_ids)
