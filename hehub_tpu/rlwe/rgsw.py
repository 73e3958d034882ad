"""RGSW ciphertexts and the RNS external product — the key-switching engine
(≙ /root/reference/src/fhe/primitives/rgsw.h:20-51, rgsw.cpp:11-156),
redesigned as batched tensor contractions.

Layout: an RNS-decomposition RGSW/KSK ciphertext is one uint32 tensor
[rows, 2, limbs, n] of NTT values kept in the Montgomery domain (pre-scaled
by R = 2^32, ≙ rgsw_encrypt_montgomery rgsw.cpp:33-55) so the external
product's inner products are plain mont_mul + lazy adds — one fused
elementwise chain over [rows, limbs, n] tiles instead of the reference's
u128 scalar accumulator loop (rgsw.cpp:121-153).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

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
    limb_ids: context limb indices of the L_ext axis (ct limbs + special)."""

    data: jnp.ndarray
    limb_ids: Tuple[int, ...]

    @property
    def rows(self) -> int:
        return self.data.shape[0]

    def at_level(self, level: int, special_pos: int) -> "RgswCt":
        """Restrict to the first `level` rows and limbs {0..level-1, special}
        — static slicing enabling ops below the keygen level."""
        d = jnp.concatenate(
            [
                self.data[:level, :, :level],
                self.data[:level, :, special_pos : special_pos + 1],
            ],
            axis=2,
        )
        ids = self.limb_ids[:level] + (self.limb_ids[special_pos],)
        return RgswCt(d, ids)


def rgsw_encrypt_rns(
    ctx: Context,
    pt_ntt: np.ndarray,
    sk: rlwe_mod.RlweSk,
    key,
    limb_ids_ext: Tuple[int, ...],
    basis_scalars: Tuple[int, ...],
    **dbg,
) -> RgswCt:
    """RGSW encryption with the RNS-decomposition basis: row i is an RLWE(0)
    sample over the extended limbs plus pt*basis_scalars[i] folded into c0's
    limb i (≙ rgsw_encrypt + the e_i-basis of RlweKsk, rgsw.cpp:11-31,
    keys.cpp:26-34). `pt_ntt`: host uint32 [len(ids_ext), n] strict values.

    Output is converted to the Montgomery domain (≙ rgsw.cpp:33-55).
    """
    k_rows = len(basis_scalars)
    mods = ctx.moduli_of(limb_ids_ext)
    keys = jax.random.split(key, k_rows)
    row_cts = []
    for i in range(k_rows):
        c0, c1 = rlwe_mod.rlwe_sample(ctx, sk, keys[i], limb_ids_ext, **dbg)
        q_i = mods[i]
        w = int(basis_scalars[i]) % q_i
        row_add = (pt_ntt[i].astype(np.uint64) * w % q_i).astype(np.uint32)
        two_q_i = np.uint32(2 * q_i)
        patched = ma.add_lazy(c0.data[..., i, :], row_add, two_q_i)
        c0_data = c0.data.at[..., i, :].set(patched)
        row_cts.append(jnp.stack([c0_data, c1.data], axis=0))
    data = jnp.stack(row_cts, axis=0)  # [rows, 2, L_ext, n]
    # Montgomery domain: multiply everything by R = 2^32 mod q
    q = ctx.rows("q", limb_ids_ext)
    data = ma.shoup_mul_lazy(
        data, ctx.rows("r_mod_q", limb_ids_ext), ctx.rows("r_shoup", limb_ids_ext), q
    )
    return RgswCt(data, limb_ids_ext)


def ext_prod(ctx: Context, poly: RnsPoly, rgsw: RgswCt) -> rlwe_mod.RlweCt:
    """External product: the hottest compound kernel
    (≙ ext_prod_montgomery, rgsw.cpp:57-156).

    poly: NTT form over ct limbs (no special), lazy.
    rgsw: rows >= poly.limb_count, limbs = poly limbs + special.
    Returns an RLWE ct over poly limbs + special, NTT form.

    TPU shape: the decomposition matrix D[..., i, j, :] (digit i under
    modulus j) is built by ONE batched NTT over an [l, l+1, n] tile, and the
    contraction over i is an unrolled mont_mul + lazy-add chain that XLA
    fuses; no scalar loops, no 128-bit accumulators.
    """
    if poly.form != NTT:
        raise ValueError("ext_prod expects NTT form")
    l = poly.limb_count
    ids = poly.limb_ids
    ids_ext = rgsw.limb_ids
    if ids_ext[:l] != ids or len(ids_ext) != l + 1:
        raise ValueError(f"rgsw limbs {ids_ext} do not extend poly limbs {ids}")

    # digits: coeff-form strict residues of each limb
    d = rns.reduce_strict(ctx, rns.to_coeff(ctx, poly))  # [..., l, n], [0, q_i)

    n = poly.dimension
    from hehub_tpu import config

    if config.pallas_enabled() and n >= 1024:
        # fused kernel: digit NTTs + Montgomery contraction stay in VMEM per
        # output limb (bitwise equal to the XLA path below)
        from hehub_tpu.ops.pallas import extprod_pallas

        batch_shape = d.data.shape[:-2]
        digits = d.data.reshape(-1, l, n)
        key_t = jnp.transpose(rgsw.data[:l], (2, 0, 1, 3))  # [L_ext, l, 2, n]
        out = extprod_pallas.make_ext_prod(ctx, ids, ids_ext)(digits, key_t)
        halves = []
        for half in range(2):
            h = jnp.transpose(out[:, :, half], (1, 0, 2))  # [R, L_ext, n]
            halves.append(
                RnsPoly(h.reshape(*batch_shape, l + 1, n), NTT, ids_ext)
            )
        return rlwe_mod.RlweCt(halves[0], halves[1])

    # XLA path: broadcast each digit across target limbs and NTT under each
    # target modulus: [..., l(src), l+1(dst), n]. Digit values < q_i < 2 q_j
    # for all 30-bit limb pairs, so they are valid lazy inputs under q_j.
    # (The reference keeps the original NTT values on the diagonal,
    # rgsw.cpp:99-101, purely to skip those transforms; the re-NTT'd digit
    # is the same value mod q_i, so we use it uniformly.)
    tiled = jnp.broadcast_to(
        d.data[..., :, None, :],
        (*d.data.shape[:-2], l, l + 1, poly.dimension),
    )
    D = nttmod.ntt(ctx, tiled, ids_ext)

    q = ctx.rows("q", ids_ext)
    two_q = ctx.rows("two_q", ids_ext)
    neg_qinv = ctx.rows("neg_qinv", ids_ext)

    halves = []
    for half in range(2):
        acc = None
        for i in range(l):
            prod = ma.mont_mul_lazy(D[..., i, :, :], rgsw.data[i, half], q, neg_qinv)
            acc = prod if acc is None else ma.add_lazy(acc, prod, two_q)
        halves.append(RnsPoly(acc, NTT, ids_ext))
    return rlwe_mod.RlweCt(halves[0], halves[1])
