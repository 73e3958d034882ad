"""BGV demo: exact modular SIMD arithmetic, including the ct-ct multiply
with relinearization the reference declares but never exercises
(≙ /root/reference/tests/bgv_t.cpp:193-226, commented out there).

Computes slot-wise (a + b)·c mod t over encrypted vectors and verifies
exactness — BGV is exact arithmetic, so the check is equality, not a
noise-tolerant comparison.

Usage: python examples/bgv_example.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from hehub_tpu.core.context import create_bgv_params, make_context
from hehub_tpu.models import bgv
from hehub_tpu.rlwe import keys as keys_mod
from hehub_tpu.rlwe import rlwe as rlwe_mod


def main():
    params = create_bgv_params(4096, plain_bits=17, num_levels=2)
    ctx = make_context(params)
    t = params.plain_modulus
    n = params.dimension

    root = jax.random.key(11)
    k_sk, k_rlk, k1, k2, k3 = jax.random.split(root, 5)
    sk = rlwe_mod.keygen(ctx, k_sk)
    # BGV key-switching keys carry noise lifted by t (≙ the lift in
    # get_rlwe_sample_lift_noise, bgv/basics.cpp:63-78)
    rlk = keys_mod.relin_key(ctx, sk, k_rlk, noise_scale=t)

    rng = np.random.default_rng(0)
    a = rng.integers(0, t, n, dtype=np.uint64)
    b = rng.integers(0, t, n, dtype=np.uint64)
    c = rng.integers(0, t, n, dtype=np.uint64)

    ct_a = bgv.encrypt(ctx, bgv.simd_encode(ctx, a), sk, k1)
    ct_b = bgv.encrypt(ctx, bgv.simd_encode(ctx, b), sk, k2)
    ct_c = bgv.encrypt(ctx, bgv.simd_encode(ctx, c), sk, k3)

    ct_sum = bgv.add(ctx, ct_a, ct_b)
    ct_prod = bgv.mult(ctx, ct_sum, ct_c, rlk)          # ct-ct mult + relin
    ct_prod = bgv.mod_switch(ctx, ct_prod)              # manage noise growth

    got = bgv.simd_decode(ctx, bgv.decrypt(ctx, ct_prod, sk))
    want = (a + b) * c % t
    exact = np.array_equal(got.astype(np.uint64), want)
    print(f"BGV (a+b)*c mod {t}: exact={exact}, n={n} slots")
    assert exact
    return exact


if __name__ == "__main__":
    main()
