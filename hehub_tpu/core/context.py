"""Parameter objects and the immutable precomputed-table Context.

The reference scatters precomputed state across lazily-filled mutable global
caches (ntt_factors_cache ntt.cpp:107-143, mulmod LUTs mod_arith.cpp:64-92,
fft_factors_cache ckks/basics.cpp:103). TPU-natively, all of that becomes one
immutable `Context` of numpy tables computed eagerly at parameter-creation
time; ops slice these tables at trace time so they are baked into the XLA
program as constants (no runtime table plumbing, no thread-safety hazards).

Layout convention: a context covers M = len(moduli) + 1 "limbs": the ciphertext
modulus chain q_0..q_{L-1} followed by the key-switching special prime p at
index L (≙ RlweParams + additional_mod, /root/reference/src/fhe/primitives/
rlwe.h:16-25 and ckks.h:19-27). BGV additionally carries single-limb tables
for the plaintext modulus t.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional, Sequence, Tuple, Union

import numpy as np

from hehub_tpu.utils import hostmath as hm

U32 = np.uint32
U64 = np.uint64


# ---------------------------------------------------------------------------
# Parameters (static, hashable)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class RlweParams:
    """Static RLWE parameters (≙ RlweParams, rlwe.h:16-25).

    `special_mod` may be a single prime (the reference's additional_mod,
    rlwe.h:23) or a tuple of primes — multiple key-switching specials enable
    hybrid key switching with digit grouping (alpha > 1)."""

    dimension: int
    moduli: Tuple[int, ...]
    special_mod: Optional[object] = None  # int | Tuple[int, ...] | None

    def __post_init__(self):
        n = self.dimension
        if n & (n - 1) or n < 8:
            raise ValueError("dimension must be a power of two >= 8")
        if self.special_mod is not None and not isinstance(
            self.special_mod, (int, np.integer)
        ):
            object.__setattr__(self, "special_mod", tuple(self.special_mod))
        all_mods = self.moduli + self.special_mods
        if len(set(all_mods)) != len(all_mods):
            raise ValueError("moduli must be distinct")
        for q in all_mods:
            # uint32 lanes with lazy [0, 2q) residues need q < 2^30 (so
            # 4q < 2^32 in the butterflies); narrower primes down to 23
            # bits are fine — Shoup/Montgomery preconditions only cap q
            # from above, and q >= 2^22 keeps the base-2^22/2^23 digit
            # planes of basecnv.decompose_* valid lazy inputs
            # (create_ckks_params_from_bit_lengths uses mixed widths)
            if not (1 << 22) <= q < (1 << 30):
                raise ValueError(f"modulus {q} outside the [23, 30]-bit lane range")
            if q % (2 * n) != 1 or not hm.is_prime(q):
                raise ValueError(f"{q} is not an NTT prime for n={n}")

    @property
    def special_mods(self) -> Tuple[int, ...]:
        if self.special_mod is None:
            return ()
        if isinstance(self.special_mod, (int, np.integer)):
            return (int(self.special_mod),)
        return tuple(self.special_mod)

    @property
    def log_dimension(self) -> int:
        return self.dimension.bit_length() - 1

    @property
    def level_count(self) -> int:
        return len(self.moduli)


@dataclasses.dataclass(frozen=True)
class CkksParams(RlweParams):
    """CKKS parameters (≙ CkksParams, ckks.h:19-27)."""

    initial_scaling_factor: float = 1.0


@dataclasses.dataclass(frozen=True)
class BgvParams(RlweParams):
    """BGV parameters: plaintext modulus t — ANY integer in [2, 2^58)
    coprime to the ciphertext moduli (≙ the reference's coprimality-only
    requirement, bgv/basics.cpp:80-117; its CRT-decrypt test runs a 45-bit
    prime t, tests/bgv_t.cpp:48-58).

    SIMD slot packing additionally needs every prime factor of t to satisfy
    t_i ≡ 1 (mod 2n); factors < 2^29 pack on device, larger ones through the
    host big-prime NTT (hostmath.ntt_host_u64)."""

    plain_modulus: int = 0

    def __post_init__(self):
        super().__post_init__()
        import math

        t = self.plain_modulus
        if not 2 <= t < (1 << 58):
            raise ValueError(f"plain modulus {t} must be in [2, 2^58)")
        for q in self.moduli + self.special_mods:
            if math.gcd(t, q) != 1:
                raise ValueError("plain modulus must be coprime with ct moduli")

    @property
    def plain_factors(self) -> Tuple[int, ...]:
        """t as pairwise-coprime prime powers (the CRT basis for Z_t)."""
        return hm.coprime_factors(self.plain_modulus)

    @property
    def simd_capable(self) -> bool:
        """True when Z_t slots pack via per-factor negacyclic NTTs."""
        n = self.dimension
        return all(
            e == 1 and p % (2 * n) == 1
            for p, e in hm.factorize(self.plain_modulus)
        )


# Standard ~128-bit-security total log(Q·P) budgets per dimension
# (≙ std_log_q_size, /root/reference/src/fhe/ckks/basics.cpp:41-43).
# = the HomomorphicEncryption.org Standard v1.1 ternary-classical column;
# utils/security.rlwe_budget_security_bits interpolates arbitrary
# (dimension, logQP) pairs through the same estimator-derived table.
STD_LOGQP_BUDGET = {1024: 27, 2048: 54, 4096: 109, 8192: 218, 16384: 438, 32768: 881}


def create_ckks_params(
    dimension: int,
    scaling_bits: int = 28,
    num_levels: Optional[int] = None,
    use_security_budget: bool = True,
    num_special: int = 1,
) -> CkksParams:
    """Automatic CKKS parameter selection with 30-bit limbs.

    Mirrors ckks::create_params(dimension, initial_scaling_bits)
    (/root/reference/src/fhe/ckks/basics.cpp:40-64) but with a fixed 30-bit
    limb width: the level budget comes from the same standard log(QP) table,
    divided into 30-bit primes. Scaling factors up to 2^55 (the reference's
    own bench grid, bench/benchmarks.cpp:21-22) are supported: coefficients
    span several limbs, encode/decode handle the magnitude exactly
    (models/ckks.py), and rescale drops as many limbs as the scale warrants
    (models/ckks.rescale with dropping_primes > 1).
    """
    if scaling_bits > 55:
        raise ValueError(
            "scaling factors above 2^55 leave no slot-value headroom below "
            "the 2^62 encode bound"
        )
    budget = STD_LOGQP_BUDGET.get(dimension)
    if num_levels is None:
        if budget is None:
            raise ValueError(f"no standard budget for dimension {dimension}")
        num_levels = budget // 30 - num_special
        if num_levels < 1:
            if use_security_budget:
                raise ValueError(
                    f"dimension {dimension} cannot fit even one level plus "
                    f"{num_special} special prime(s) within its {budget}-bit "
                    "128-bit-security budget; use a larger dimension, or pass "
                    "num_levels explicitly with use_security_budget=False to "
                    "build KNOWINGLY-INSECURE parameters"
                )
            num_levels = 1
    if use_security_budget:
        if budget is None:
            raise ValueError(
                f"no standard security budget for dimension {dimension}; "
                "pass use_security_budget=False to opt out explicitly"
            )
        if 30 * (num_levels + num_special) > budget:
            raise ValueError(
                f"{num_levels} levels exceed the 128-bit-security budget "
                f"({budget} bits) for dimension {dimension}"
            )
    if 29 * num_levels < scaling_bits + 11:
        raise ValueError(
            f"{num_levels} levels of 30-bit primes cannot hold coefficients "
            f"at a 2^{scaling_bits} scale (fresh ciphertexts would wrap mod Q)"
        )
    primes = hm.gen_ntt_primes(30, num_levels + num_special, dimension)
    return CkksParams(
        dimension=dimension,
        moduli=tuple(primes[num_special:]),
        special_mod=tuple(primes[:num_special]) if num_special != 1 else primes[0],
        initial_scaling_factor=float(2.0**scaling_bits),
    )


def create_ckks_params_from_bit_lengths(
    dimension: int,
    moduli_bits: Sequence[int],
    special_mod_bits: Union[int, Sequence[int]] = 30,
    initial_scaling_factor: Optional[float] = None,
    use_security_budget: bool = True,
) -> CkksParams:
    """Per-prime-bit-width parameter selection (≙ ckks::create_params
    (dimension, moduli_bits, additional_mod_bits, scaling),
    /root/reference/src/fhe/ckks/basics.cpp:14-38): callers pick the width
    of every chain prime and of the key-switch special prime(s).

    TPU-native limbs are uint32 with 30-bit lazy headroom, so each width
    must be in [20, 30]; the reference's wide primes (up to 59 bits) map
    onto MULTI-LIMB scaling factors here instead — create_ckks_params with
    scaling_bits up to 55 spans several limbs per rescale and covers the
    same precision regimes (PARITY.md "known deltas").

    The default scaling factor is 2^(last chain width), matching the
    reference's convention that the trailing moduli carry the scale."""
    if not moduli_bits:
        raise ValueError("need at least one chain modulus")
    specials = (
        (special_mod_bits,)
        if isinstance(special_mod_bits, int)
        else tuple(special_mod_bits)
    )
    for w in (*moduli_bits, *specials):
        if not 23 <= w <= 30:
            raise ValueError(
                f"per-prime widths must be in [23, 30] bits (got {w}): "
                "uint32 lanes need q < 2^30 for lazy arithmetic and "
                "q >= 2^22 for the digit-plane decompositions; for wider "
                "effective scales use create_ckks_params with a multi-limb "
                "scaling factor (scaling_bits up to 55)"
            )
    if use_security_budget:
        budget = STD_LOGQP_BUDGET.get(dimension)
        if budget is None:
            raise ValueError(
                f"no standard security budget for dimension {dimension}; "
                "pass use_security_budget=False to opt out explicitly"
            )
        total = sum(moduli_bits) + sum(specials)
        if total > budget:
            raise ValueError(
                f"sum of prime widths ({total} bits) exceeds the 128-bit-"
                f"security budget ({budget} bits) for dimension {dimension}"
            )
    # one downward scan per distinct width keeps all primes distinct:
    # same-width primes come from one gen_ntt_primes call, different
    # widths occupy disjoint ranges [2^(w-1), 2^w)
    order = [*specials, *moduli_bits]
    need: Dict[int, int] = {}
    for w in order:
        need[w] = need.get(w, 0) + 1
    pools = {w: list(hm.gen_ntt_primes(w, c, dimension)) for w, c in need.items()}
    picked = [pools[w].pop(0) for w in order]
    special = picked[: len(specials)]
    chain = tuple(picked[len(specials):])
    scale = (
        float(initial_scaling_factor)
        if initial_scaling_factor is not None
        else float(2.0 ** moduli_bits[-1])
    )
    return CkksParams(
        dimension=dimension,
        moduli=chain,
        special_mod=tuple(special) if len(special) != 1 else special[0],
        initial_scaling_factor=scale,
    )


def create_bgv_params(
    dimension: int,
    plain_bits: int = 17,
    num_levels: int = 3,
    num_special: int = 1,
    plain_modulus: Optional[int] = None,
    use_security_budget: bool = True,
) -> BgvParams:
    """BGV parameter selection: 30-bit ciphertext primes + a plaintext
    modulus — an NTT prime of `plain_bits` bits by default, or any explicit
    `plain_modulus` in [2, 2^58) coprime to the chain (composite, large
    prime, or non-NTT values all work; SIMD needs NTT-friendly factors).

    The 128-bit-security log(QP) budget is enforced by default, exactly as
    for CKKS; pass use_security_budget=False to build KNOWINGLY-INSECURE
    test parameters (mandatory for toy dimensions below 1024)."""
    if use_security_budget:
        budget = STD_LOGQP_BUDGET.get(dimension)
        if budget is None:
            raise ValueError(
                f"no standard security budget for dimension {dimension}; "
                "pass use_security_budget=False to opt out explicitly"
            )
        if 30 * (num_levels + num_special) > budget:
            raise ValueError(
                f"{num_levels} levels exceed the 128-bit-security budget "
                f"({budget} bits) for dimension {dimension}"
            )
    primes = hm.gen_ntt_primes(30, num_levels + num_special, dimension)
    t = plain_modulus or hm.gen_ntt_primes(plain_bits, 1, dimension)[0]
    return BgvParams(
        dimension=dimension,
        moduli=tuple(primes[num_special:]),
        special_mod=tuple(primes[:num_special]) if num_special != 1 else primes[0],
        plain_modulus=int(t),
    )


# ---------------------------------------------------------------------------
# Precomputed tables
# ---------------------------------------------------------------------------


def _bitrev_indices(n: int) -> np.ndarray:
    logn = n.bit_length() - 1
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros(n, dtype=np.uint32)
    for b in range(logn):
        rev |= ((idx >> b) & 1) << (logn - 1 - b)
    return rev


@functools.lru_cache(maxsize=None)
def _psi_power_table(q: int, n: int, inverse: bool) -> np.ndarray:
    """psis[j] = ψ^{±bitrev(j, log n)} mod q, uint32 [n]."""
    psi = hm.negacyclic_psi(q, n)
    if inverse:
        psi = hm.modinv(psi, q)
    powers = np.empty(n, dtype=np.uint64)
    acc = 1
    for j in range(n):
        powers[j] = acc
        acc = acc * psi % q
    rev = _bitrev_indices(n)
    return powers[rev].astype(np.uint32)


def _shoup_np(w: np.ndarray, q: int) -> np.ndarray:
    return ((w.astype(U64) << U64(32)) // U64(q)).astype(U32)


class ModulusTables:
    """Per-modulus constants + twiddle tables for one prime q."""

    def __init__(self, q: int, n: int):
        self.q = U32(q)
        self.two_q = U32(2 * q)
        self.neg_qinv = U32((-hm.modinv(q, 1 << 32)) % (1 << 32))
        r = (1 << 32) % q
        self.r_mod_q = U32(r)
        self.r_shoup = U32(hm.shoup(r, q))
        self.r2_mod_q = U32(r * r % q)
        # forward / inverse twiddles (bit-reversed-power layout)
        self.tw_fwd = _psi_power_table(q, n, inverse=False)
        self.tw_fwd_sh = _shoup_np(self.tw_fwd, q)
        tw_inv = _psi_power_table(q, n, inverse=True).astype(np.uint64)
        n_inv = hm.modinv(n, q)
        # fold n^-1 into the single twiddle consumed by the last inverse stage
        tw_inv_scaled = tw_inv.copy()
        tw_inv_scaled[1] = tw_inv[1] * n_inv % q
        self.tw_inv = tw_inv.astype(U32)
        self.tw_inv_sh = _shoup_np(self.tw_inv, q)
        self.tw_inv_last = tw_inv_scaled[1].astype(U32)
        self.tw_inv_last_sh = U32(hm.shoup(int(tw_inv_scaled[1]), q))
        self.n_inv = U32(n_inv)
        self.n_inv_sh = U32(hm.shoup(n_inv, q))


class Context:
    """Immutable table bundle for a parameter set.

    Arrays are host numpy; scheme ops slice them at trace time so they enter
    XLA programs as constants. Identity-hashable so it can be a jit static arg.
    """

    def __init__(self, params: RlweParams):
        self.params = params
        n = params.dimension
        mods = list(params.moduli) + list(params.special_mods)
        self.mod_list: Tuple[int, ...] = tuple(mods)
        n_sp = len(params.special_mods)
        self.special_index = len(params.moduli) if n_sp else None
        self.special_indices: Tuple[int, ...] = tuple(
            range(len(params.moduli), len(mods))
        )
        self.num_special = n_sp
        tabs = [ModulusTables(q, n) for q in mods]

        def col(attr):  # [M, 1] for broadcasting against [..., M, n]
            return np.asarray([getattr(t, attr) for t in tabs], dtype=U32)[:, None]

        self.q = col("q")
        self.two_q = col("two_q")
        self.neg_qinv = col("neg_qinv")
        self.r_mod_q = col("r_mod_q")
        self.r_shoup = col("r_shoup")
        self.r2_mod_q = col("r2_mod_q")
        self.n_inv = col("n_inv")
        self.n_inv_sh = col("n_inv_sh")
        self.tw_inv_last = col("tw_inv_last")
        self.tw_inv_last_sh = col("tw_inv_last_sh")
        self.tw_fwd = np.stack([t.tw_fwd for t in tabs])  # [M, n]
        self.tw_fwd_sh = np.stack([t.tw_fwd_sh for t in tabs])
        self.tw_inv = np.stack([t.tw_inv for t in tabs])
        self.tw_inv_sh = np.stack([t.tw_inv_sh for t in tabs])
        for a in vars(self).values():
            if isinstance(a, np.ndarray):
                a.setflags(write=False)

        # BGV: per-factor tables for the plaintext modulus t. A factor gets
        # device NTT tables when it is a prime ≡ 1 mod 2n below the 30-bit
        # lane bound; larger NTT-friendly primes use the host u64 NTT
        # (hostmath.ntt_host_u64); other factors have no SIMD packing.
        self.plain_fact_tables: Optional[list] = None
        if isinstance(params, BgvParams):
            tabs = []
            for f in params.plain_factors:
                (p, e), = hm.factorize(f)
                if e == 1 and p % (2 * n) == 1 and p < (1 << 29):
                    tabs.append(ModulusTables(p, n))
                else:
                    tabs.append(None)
            self.plain_fact_tables = tabs

    # -- static limb gathers (host-side, trace-time) ------------------------

    def rows(self, name: str, limb_ids: Tuple[int, ...]) -> np.ndarray:
        arr = getattr(self, name)
        return arr[np.asarray(limb_ids, dtype=np.int64)]

    def moduli_of(self, limb_ids: Tuple[int, ...]) -> Tuple[int, ...]:
        return tuple(self.mod_list[i] for i in limb_ids)

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


@functools.lru_cache(maxsize=None)
def make_context(params: RlweParams) -> Context:
    return Context(params)
