"""Basel-series demo — the reference's flagship example
(≙ /root/reference/examples/ckks_example.cpp:9-28) done the TPU-native way.

The reference encodes/encrypts 10,000 scalars ONE ciphertext at a time and
squares each sequentially. Here the same 10,000 values are packed into SIMD
slots of a small *batch* of ciphertexts, the square (ct-ct mult + relinearize
+ rescale) runs once, jitted, over the whole batch, and the slot total is
folded with log2(slots) rotations — the batching/rotation pattern every real
CKKS workload uses on accelerators.

Computes sum_{i=1..N} 1/i^2 -> pi^2/6.

Usage: python examples/ckks_example.py [N]   (default 10000)
"""

import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from hehub_tpu.core.context import create_ckks_params, make_context
from hehub_tpu.models import ckks
from hehub_tpu.ops import modarith as ma
from hehub_tpu.rlwe import keys as keys_mod
from hehub_tpu.rlwe import rlwe as rlwe_mod


def main(total: int = 10000) -> float:
    # n=4096, 2 levels + 1 special = 90 bits, inside the 109-bit 128-bit-
    # security budget for this dimension — the budget check stays ON
    params = create_ckks_params(4096, scaling_bits=28, num_levels=2)
    ctx = make_context(params)
    n = params.dimension
    slots = n // 2

    root = jax.random.key(2024)
    k_sk, k_rlk, k_enc, k_rot = jax.random.split(root, 4)
    sk = rlwe_mod.keygen(ctx, k_sk)
    rlk = keys_mod.relin_key(ctx, sk, k_rlk)

    # Pack 1/1, 1/2, ..., 1/N into the slots of ceil(N/slots) ciphertexts.
    vals = np.zeros(((total + slots - 1) // slots) * slots)
    vals[:total] = 1.0 / np.arange(1, total + 1)
    batch = len(vals) // slots
    t0 = time.perf_counter()
    pts = [ckks.encode(vals[b * slots:(b + 1) * slots], params) for b in range(batch)]
    cts = [
        ckks.encrypt(ctx, pt, sk, k)
        for pt, k in zip(pts, jax.random.split(k_enc, batch))
    ]

    # One jitted step: square every ciphertext in the batch, then tree-add the
    # batch into a single ciphertext of per-slot partial sums.
    import jax.numpy as jnp

    from hehub_tpu.core import rns

    ids = cts[0].c0.limb_ids
    scale = cts[0].scaling_factor

    def square_and_fold(c0, c1):
        ct = ckks.CkksCt(rns.RnsPoly(c0, rns.NTT, ids),
                         rns.RnsPoly(c1, rns.NTT, ids), scale)
        sq = ckks.rescale(ctx, ckks.mult(ctx, ct, ct, rlk))
        two_q = ctx.rows("two_q", sq.c0.limb_ids)
        return (ma.reduce_add_lazy(sq.c0.data, 0, two_q),
                ma.reduce_add_lazy(sq.c1.data, 0, two_q))

    c0 = jnp.stack([ct.c0.data for ct in cts])
    c1 = jnp.stack([ct.c1.data for ct in cts])
    s0, s1 = jax.jit(square_and_fold)(c0, c1)
    sq_ids = ids[:-1]
    ct_sum = ckks.CkksCt(rns.RnsPoly(s0, rns.NTT, sq_ids),
                         rns.RnsPoly(s1, rns.NTT, sq_ids),
                         scale * scale / ctx.mod_list[len(sq_ids)])

    # Fold slots: log2(slots) rotate+add steps bring the total into every slot.
    step = 1
    while step < slots:
        rk = keys_mod.rot_key(ctx, sk, step, jax.random.fold_in(k_rot, step))
        ct_sum = ckks.add(ctx, ct_sum, ckks.rotate(ctx, ct_sum, rk, step))
        step *= 2
    jax.block_until_ready(ct_sum.c0.data)
    elapsed = time.perf_counter() - t0

    recovered = ckks.decode(ckks.decrypt(ctx, ct_sum, sk), params, count=1)
    result = float(np.real(recovered[0]))
    target = math.pi * math.pi / 6
    print(f"({result:.6f}, {target:.6f})  "
          f"[N={total}, batch={batch} cts x {slots} slots, {elapsed:.2f}s]")
    return result


if __name__ == "__main__":
    n_terms = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    res = main(n_terms)
    expect = sum(1.0 / i**2 for i in range(1, n_terms + 1))
    # noise budget: 28-bit scale, one squaring + log2(slots) chained rotation
    # key-switches at 30-bit RNS digits -> ~1e-2 absolute error
    assert abs(res - expect) < 5e-2, f"{res} vs {expect}"
