"""Host-side exact number theory (Python ints / numpy).

This module replaces the reference's hand-maintained prime tables
(/root/reference/src/fhe/common/primelists.cpp, which contain known data bugs
at :176 and :184) with programmatic, verified prime generation, and provides
the exact big-integer CRT helpers used at the host boundary (decode oracles,
Shoup-constant precomputation).

Everything here runs on the host with exact arithmetic; nothing in this module
is traced by JAX.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# Primality testing (deterministic Miller-Rabin for < 2^64)
# ---------------------------------------------------------------------------

_MR_BASES_64 = (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37)


def is_prime(n: int) -> bool:
    """Deterministic Miller-Rabin, exact for all n < 2^64."""
    if n < 2:
        return False
    for p in _MR_BASES_64:
        if n % p == 0:
            return n == p
    d = n - 1
    r = 0
    while d % 2 == 0:
        d //= 2
        r += 1
    for a in _MR_BASES_64:
        x = pow(a, d, n)
        if x == 1 or x == n - 1:
            continue
        for _ in range(r - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


@functools.lru_cache(maxsize=None)
def gen_ntt_primes(bits: int, count: int, n: int) -> Tuple[int, ...]:
    """Generate `count` distinct primes q with q ≡ 1 (mod 2n) and
    2^(bits-1) <= q < 2^bits, searching downward from 2^bits.

    These admit primitive 2n-th roots of unity, enabling the negacyclic NTT
    over Z_q[X]/(X^n + 1)  (role of /root/reference/src/fhe/common/
    primelists.cpp, but generated and verified programmatically).
    """
    if bits > 31:
        raise ValueError(
            f"TPU-native limbs are uint32; moduli must be < 2^31 (got {bits} bits)"
        )
    step = 2 * n
    primes: List[int] = []
    # largest candidate ≡ 1 mod 2n below 2^bits
    q = (1 << bits) - ((1 << bits) - 1) % step
    lo = 1 << (bits - 1)
    while len(primes) < count and q > lo:
        if is_prime(q):
            primes.append(q)
        q -= step
    if len(primes) < count:
        raise ValueError(f"not enough {bits}-bit NTT primes for n={n}")
    return tuple(primes)


# ---------------------------------------------------------------------------
# Roots of unity
# ---------------------------------------------------------------------------


def _factorize(n: int) -> List[int]:
    fs = []
    d = 2
    while d * d <= n:
        if n % d == 0:
            fs.append(d)
            while n % d == 0:
                n //= d
        d += 1
    if n > 1:
        fs.append(n)
    return fs


@functools.lru_cache(maxsize=None)
def primitive_root(q: int) -> int:
    """Smallest generator of Z_q^* (q prime)."""
    phi = q - 1
    factors = _factorize(phi)
    g = 2
    while True:
        if all(pow(g, phi // f, q) != 1 for f in factors):
            return g
        g += 1


@functools.lru_cache(maxsize=None)
def root_of_unity(q: int, order: int) -> int:
    """A primitive `order`-th root of unity mod prime q (order | q-1)."""
    if (q - 1) % order != 0:
        raise ValueError(f"{order} does not divide {q}-1")
    g = primitive_root(q)
    w = pow(g, (q - 1) // order, q)
    assert pow(w, order, q) == 1 and pow(w, order // 2, q) != 1
    return w


def negacyclic_psi(q: int, n: int) -> int:
    """Primitive 2n-th root ψ mod q with ψ^n ≡ -1 (mod q)."""
    psi = root_of_unity(q, 2 * n)
    assert pow(psi, n, q) == q - 1
    return psi


# ---------------------------------------------------------------------------
# Modular / CRT helpers (exact)
# ---------------------------------------------------------------------------


def modinv(x: int, q: int) -> int:
    return pow(x, -1, q)


def shoup(w: int, q: int) -> int:
    """Shoup companion floor(w * 2^32 / q) for a constant w < q < 2^31."""
    if not 0 <= w < q:
        raise ValueError(f"shoup constant must be strictly reduced: {w} vs {q}")
    return (w << 32) // q


def shoup_pair_arrays(ws: Sequence[int], qs: Sequence[int]):
    """(w, w_shoup) as uint32 numpy arrays for per-limb constants."""
    ws = [int(w) % int(q) for w, q in zip(ws, qs)]
    sh = [shoup(w, q) for w, q in zip(ws, qs)]
    return (
        np.asarray(ws, dtype=np.uint32),
        np.asarray(sh, dtype=np.uint32),
    )


def crt_compose(residues: Sequence[Sequence[int]], moduli: Sequence[int]) -> List[int]:
    """Exact CRT composition: residues[k][i] mod moduli[k] -> integers in [0, Q).

    Host oracle used by decode and by the rescale/mod-switch exactness tests
    (role of UBInt/CRTComposer, /root/reference/src/fhe/common/bigint.h:19-130).
    """
    Q = 1
    for m in moduli:
        Q *= int(m)
    punctured = [Q // int(m) for m in moduli]
    garners = [modinv(p % int(m), int(m)) for p, m in zip(punctured, moduli)]
    n = len(residues[0])
    out = []
    for i in range(n):
        acc = 0
        for k, m in enumerate(moduli):
            acc += int(residues[k][i]) * garners[k] % int(m) * punctured[k]
        out.append(acc % Q)
    return out


def to_signed(x: int, Q: int) -> int:
    """Map [0, Q) to the centered representative in [-Q/2, Q/2)."""
    return x - Q if x >= (Q + 1) // 2 else x


def decompose_rns(values: Sequence[int], moduli: Sequence[int]) -> np.ndarray:
    """Integers -> RNS residue matrix [L, n] (uint32). Negative values allowed."""
    out = np.empty((len(moduli), len(values)), dtype=np.uint32)
    for k, m in enumerate(moduli):
        out[k] = np.asarray([int(v) % int(m) for v in values], dtype=np.uint32)
    return out
