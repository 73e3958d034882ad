"""Measure XLA stage-chain vs Pallas NTT at SMALL n, LARGE row counts
(the TFHE blind-rotation regime: n=2048, thousands of rows — the r3
crossover was measured at bench-like shapes, ~448 rows of n=16384, where
XLA wins below n=16384; at high row counts the chain's per-stage HBM
passes should lose to the VMEM-resident kernel).

Usage: python scripts/probe_ntt_batch.py [n=2048] [rows...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    import bench
    from hehub_tpu.core.context import RlweParams, make_context
    from hehub_tpu.ops import ntt as nttmod
    from hehub_tpu.ops.pallas import ntt_pallas
    from hehub_tpu.utils import hostmath as hm
    from hehub_tpu.utils import profiling

    bench._enable_compile_cache()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    rows_list = [int(r) for r in sys.argv[2:]] or [64, 640, 2560, 5120]
    primes = hm.gen_ntt_primes(30, 1, n)
    ctx = make_context(RlweParams(dimension=n, moduli=tuple(primes)))
    ids = (0,)
    q = int(primes[0])
    rng = np.random.default_rng(0)
    for rows in rows_list:
        x = rng.integers(0, 2 * q, (rows, 1, n)).astype(np.uint32)
        f_xla = jax.jit(lambda d: nttmod.ntt_fwd(
            d, ctx.rows("tw_fwd", ids), ctx.rows("tw_fwd_sh", ids),
            ctx.rows("q", ids), ctx.rows("two_q", ids)))
        f_pal = jax.jit(ntt_pallas.get_ntt(ctx, ids, inverse=False))
        a = np.asarray(f_xla(x))
        b = np.asarray(f_pal(x))
        assert np.array_equal(a % q, b % q), "pallas != xla"
        tx = profiling.device_time(f_xla, (x,), iters=10)
        tp = profiling.device_time(f_pal, (x,), iters=10)
        print(f"n={n} rows={rows}: xla {tx*1e6:.1f} us  pallas "
              f"{tp*1e6:.1f} us  ({tx/tp:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
