"""RGSW ciphertexts and the RNS external product — the key-switching engine
(≙ /root/reference/src/fhe/primitives/rgsw.h:20-51, rgsw.cpp:11-156),
redesigned as batched tensor contractions.

Layout: an RNS-decomposition RGSW/KSK ciphertext is one uint32 tensor
[rows, 2, limbs, n] of NTT values kept in the Montgomery domain (pre-scaled
by R = 2^32, ≙ rgsw_encrypt_montgomery rgsw.cpp:33-55) so the external
product's inner products are plain mont_mul + lazy adds — one fused
elementwise chain over [rows, limbs, n] tiles instead of the reference's
u128 scalar accumulator loop (rgsw.cpp:121-153).

Digit grouping (`alpha`): hybrid key switching groups `alpha` ciphertext
limbs per decomposition digit (the SEAL/Lattigo-style generalization — the
reference implements only alpha=1). Row g encrypts s'·B_g where the basis
integer B_g ≡ P (mod every q_j in group g), ≡ 0 (mod other q_j and mod P),
and the switch input digit d_g is the SIGNED fast base conversion of the
group's residues into the full QP basis (core/basecnv.base_convert).
alpha=1 degenerates to the reference's scheme with raw per-limb digits.
Cost: ceil(l/alpha)·(l+s) digit NTTs instead of l·(l+1), at the price of
`s = ceil(alpha·30/30)` special primes.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hehub_tpu.core import rns
from hehub_tpu.core.context import Context
from hehub_tpu.core.rns import NTT, RnsPoly
from hehub_tpu.ops import modarith as ma
from hehub_tpu.ops import ntt as nttmod
from hehub_tpu.rlwe import rlwe as rlwe_mod


class RgswCt(NamedTuple):
    """data: [rows, 2, L_ext, n] uint32 Montgomery-domain NTT values.
    limb_ids: context limb indices of the L_ext axis (ct limbs + specials).
    alpha: ciphertext limbs per decomposition digit (row)."""

    data: jnp.ndarray
    limb_ids: Tuple[int, ...]
    alpha: int = 1

    @property
    def rows(self) -> int:
        return self.data.shape[0]

    def at_level(self, level: int, num_special: int) -> "RgswCt":
        """Restrict to digits covering the first `level` ct limbs and the
        limb set {0..level-1} ∪ specials — static slicing enabling ops
        below the keygen level."""
        d_rows = -(-level // self.alpha)
        sp = len(self.limb_ids) - num_special
        d = jnp.concatenate(
            [self.data[:d_rows, :, :level], self.data[:d_rows, :, sp:]],
            axis=2,
        )
        ids = self.limb_ids[:level] + self.limb_ids[sp:]
        return RgswCt(d, ids, self.alpha)


def rgsw_encrypt_rns(
    ctx: Context,
    pt_ntt: np.ndarray,
    sk: rlwe_mod.RlweSk,
    key,
    limb_ids_ext: Tuple[int, ...],
    basis_rows: Sequence[Sequence[int]],
    alpha: int = 1,
    **dbg,
) -> RgswCt:
    """RGSW encryption with per-row basis VECTORS: row g is an RLWE(0)
    sample over the extended limbs plus pt·basis_rows[g][j] folded into
    c0's limb j for every j (≙ rgsw_encrypt + the e_i-basis of RlweKsk,
    rgsw.cpp:11-31, keys.cpp:26-34, generalized to digit groups).
    `pt_ntt`: host uint32 [len(ids_ext), n] strict values.

    Output is converted to the Montgomery domain (≙ rgsw.cpp:33-55).

    The whole generation is ONE cached jitted program per key shape —
    essential on remote backends where each eager op is an RPC round trip
    (bootstrapping needs ~100 rotation keys of ~30 rows each)."""
    basis_tup = tuple(tuple(int(x) for x in row) for row in basis_rows)
    fn = _rgsw_encrypt_jit(
        ctx, sk, limb_ids_ext, basis_tup, tuple(sorted(dbg.items()))
    )
    data = fn(jnp.asarray(np.ascontiguousarray(pt_ntt)), key)
    return RgswCt(data, limb_ids_ext, alpha)


@functools.lru_cache(maxsize=None)
def _rgsw_encrypt_jit(
    ctx: Context,
    sk: "rlwe_mod.RlweSk",
    limb_ids_ext: Tuple[int, ...],
    basis_rows: Tuple[Tuple[int, ...], ...],
    dbg_items: Tuple,
):
    from hehub_tpu.utils import hostmath as hm

    mods = ctx.moduli_of(limb_ids_ext)
    dbg = dict(dbg_items)
    k_rows = len(basis_rows)
    # per-(row, limb) basis residues + Shoup companions, host constants
    w_np = np.zeros((k_rows, len(mods)), np.uint32)
    w_sh_np = np.zeros_like(w_np)
    for g in range(k_rows):
        for j, q_j in enumerate(mods):
            w = int(basis_rows[g][j]) % q_j
            w_np[g, j] = w
            w_sh_np[g, j] = hm.shoup(w, q_j)

    def gen(pt_ntt, key):
        keys = jax.random.split(key, k_rows)
        # vmap over rows: ONE traced row body instead of a k_rows-deep
        # unroll (the unrolled XLA program took ~25 min to compile through
        # the remote helper; this compiles in seconds and runs faster)
        ct = jax.vmap(
            lambda k: rlwe_mod.rlwe_sample(ctx, sk, k, limb_ids_ext, **dbg)
        )(keys)
        q = ctx.rows("q", limb_ids_ext)
        two_q = ctx.rows("two_q", limb_ids_ext)
        # pt·B_g folded into c0: Shoup rows (w=0 rows contribute exactly 0)
        row_add = ma.reduce_strict(
            ma.shoup_mul_lazy(
                pt_ntt[None], w_np[:, :, None], w_sh_np[:, :, None], q
            ),
            q,
        )
        c0d = ma.add_lazy(ct.c0.data, row_add, two_q)
        data = jnp.stack([c0d, ct.c1.data], axis=1)  # [rows, 2, L_ext, n]
        # Montgomery domain: multiply everything by R = 2^32 mod q
        return ma.shoup_mul_lazy(
            data, ctx.rows("r_mod_q", limb_ids_ext),
            ctx.rows("r_shoup", limb_ids_ext), q,
        )

    return jax.jit(gen, static_argnums=())


def _digit_groups(l: int, alpha: int):
    return [tuple(range(g, min(g + alpha, l))) for g in range(0, l, alpha)]


def ks_digits(ctx: Context, poly: RnsPoly, rgsw: RgswCt) -> jnp.ndarray:
    """Key-switch digit decomposition of `poly` under `rgsw`'s basis,
    returned in NTT form over the extended limbs: [..., D, L_ext, n].

    Split out of ext_prod so the decomposition can be HOISTED: computed
    once and shared by many automorphism key-switches of the same
    ciphertext (Galois automorphisms are pure gathers on NTT values, and
    RNS digit decomposition is linear, so permuting the digits equals
    decomposing the permuted polynomial up to the signed/strict residue
    representative — equally valid digits with the same noise bound).
    The digit NTTs are the dominant cost of a rotation (l·(l+s)
    transforms); sharing them across B rotations pays ~B× on that block.
    """
    if poly.form != NTT:
        raise ValueError("ks_digits expects NTT form")
    l = poly.limb_count
    ids = poly.limb_ids
    ids_ext = rgsw.limb_ids
    if ids_ext[:l] != ids or len(ids_ext) - l < 1:
        raise ValueError(f"rgsw limbs {ids_ext} do not extend poly limbs {ids}")
    groups = _digit_groups(l, rgsw.alpha)
    if len(groups) > rgsw.rows:
        raise ValueError(
            f"key has {rgsw.rows} digit rows but level {l} at "
            f"alpha={rgsw.alpha} needs {len(groups)}"
        )
    d = rns.reduce_strict(ctx, rns.to_coeff(ctx, poly))
    n = poly.dimension
    if rgsw.alpha == 1:
        tiled = jnp.broadcast_to(
            d.data[..., :, None, :],
            (*d.data.shape[:-2], l, len(ids_ext), n),
        )
    else:
        from hehub_tpu.core import basecnv

        digit_list = []
        for grp in groups:
            grp_poly = rns.take_limbs(d, grp)
            conv = basecnv.base_convert(ctx, grp_poly, ids_ext, signed=True)
            digit_list.append(conv.data)
        tiled = jnp.stack(digit_list, axis=-3)
    return nttmod.ntt(ctx, tiled, ids_ext)


def ks_contract(ctx: Context, digits: jnp.ndarray, rgsw: RgswCt) -> rlwe_mod.RlweCt:
    """Montgomery contraction of NTT-form digits [..., D, L_ext, n] against
    the key rows (the second half of ext_prod; ≙ rgsw.cpp:121-153)."""
    ids_ext = rgsw.limb_ids
    q = ctx.rows("q", ids_ext)
    two_q = ctx.rows("two_q", ids_ext)
    neg_qinv = ctx.rows("neg_qinv", ids_ext)
    n_dig = digits.shape[-3]
    halves = []
    for half in range(2):
        acc = None
        for g in range(n_dig):
            prod = ma.mont_mul_lazy(
                digits[..., g, :, :], rgsw.data[g, half], q, neg_qinv
            )
            acc = prod if acc is None else ma.add_lazy(acc, prod, two_q)
        halves.append(RnsPoly(acc, NTT, ids_ext))
    return rlwe_mod.RlweCt(halves[0], halves[1])


def ext_prod(ctx: Context, poly: RnsPoly, rgsw: RgswCt) -> rlwe_mod.RlweCt:
    """External product: the hottest compound kernel
    (≙ ext_prod_montgomery, rgsw.cpp:57-156).

    poly: NTT form over ct limbs (no specials), lazy.
    rgsw: digit rows covering poly's limbs, limbs = poly limbs + specials.
    Returns an RLWE ct over poly limbs + specials, NTT form.

    TPU shape: digits are built by ONE batched NTT over a [D, L_ext, n]
    tile (alpha=1: raw residues broadcast; alpha>1: signed fast base
    conversion of each group), and the contraction over digits is an
    unrolled mont_mul + lazy-add chain that XLA fuses; no scalar loops, no
    128-bit accumulators.
    """
    if poly.form != NTT:
        raise ValueError("ext_prod expects NTT form")
    l = poly.limb_count
    ids = poly.limb_ids
    ids_ext = rgsw.limb_ids
    n_sp = len(ids_ext) - l
    if ids_ext[:l] != ids or n_sp < 1:
        raise ValueError(f"rgsw limbs {ids_ext} do not extend poly limbs {ids}")
    alpha = rgsw.alpha
    groups = _digit_groups(l, alpha)
    if len(groups) > rgsw.rows:
        raise ValueError(
            f"key has {rgsw.rows} digit rows but level {l} at alpha={alpha} "
            f"needs {len(groups)}"
        )

    n = poly.dimension
    from hehub_tpu import config

    if alpha == 1:
        if config.pallas_enabled() and n >= 1024 \
                and config.pallas_tables_fit(len(ids_ext), n):
            # fused kernel: digit NTTs + Montgomery contraction stay in VMEM
            # per output limb (bitwise equal to the XLA path below)
            from hehub_tpu.ops.pallas import extprod_pallas

            # digits: coeff-form strict residues of each limb, [0, q_i)
            d = rns.reduce_strict(ctx, rns.to_coeff(ctx, poly))
            batch_shape = d.data.shape[:-2]
            digits = d.data.reshape(-1, l, n)
            key_t = jnp.transpose(rgsw.data[:l], (2, 0, 1, 3))
            out = extprod_pallas.make_ext_prod(ctx, ids, ids_ext)(digits, key_t)
            halves = []
            for half in range(2):
                h = jnp.transpose(out[:, :, half], (1, 0, 2))  # [R, L_ext, n]
                halves.append(
                    RnsPoly(h.reshape(*batch_shape, len(ids_ext), n), NTT, ids_ext)
                )
            return rlwe_mod.RlweCt(halves[0], halves[1])

        # XLA path: broadcast each digit across target limbs and NTT under
        # each target modulus: [..., l(src), l+s(dst), n]. Digit values
        # < q_i < 2 q_j for all 30-bit limb pairs, so they are valid lazy
        # inputs under q_j. (The reference keeps the original NTT values on
        # the diagonal, rgsw.cpp:99-101, purely to skip those transforms;
        # the re-NTT'd digit is the same value mod q_i.)
        return ks_contract(ctx, ks_digits(ctx, poly, rgsw), rgsw)
    else:
        # alpha > 1: signed fast base conversion of each limb group into the
        # full extended basis (the general k->m conversion the reference
        # leaves "under development", rns_transform.cpp:123)
        from hehub_tpu.core import basecnv

        d = rns.reduce_strict(ctx, rns.to_coeff(ctx, poly))
        digit_list = []
        for grp in groups:
            grp_poly = rns.take_limbs(d, grp)
            conv = basecnv.base_convert(ctx, grp_poly, ids_ext, signed=True)
            digit_list.append(conv.data)
        tiled = jnp.stack(digit_list, axis=-3)  # [..., D, L_ext, n]
        if config.pallas_enabled() and n >= 1024 \
                and config.pallas_tables_fit(len(ids_ext), n):
            # fused kernel on the pre-converted digits (bitwise equal to the
            # XLA path below)
            from hehub_tpu.ops.pallas import extprod_pallas

            Dg = len(groups)
            batch_shape = tiled.shape[:-3]
            digits = jnp.transpose(
                tiled.reshape(-1, Dg, len(ids_ext), n), (2, 0, 1, 3)
            )  # [L_ext, R, D, n]
            key_t = jnp.transpose(rgsw.data[:Dg], (2, 0, 1, 3))
            out = extprod_pallas.make_ext_prod_converted(ctx, Dg, ids_ext)(
                digits, key_t
            )
            halves = []
            for half in range(2):
                h = jnp.transpose(out[:, :, half], (1, 0, 2))
                halves.append(
                    RnsPoly(h.reshape(*batch_shape, len(ids_ext), n), NTT, ids_ext)
                )
            return rlwe_mod.RlweCt(halves[0], halves[1])
        return ks_contract(ctx, nttmod.ntt(ctx, tiled, ids_ext), rgsw)
