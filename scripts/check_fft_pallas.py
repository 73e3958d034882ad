"""On-chip verification of the fused df64 Pallas FFT kernel
(ops/pallas/fft_pallas.py): Mosaic compile, accuracy vs the float64 DFT
(including BATCHED rows — the case XLA:CPU mis-rounds, see
ops/df64.two_sum), and device time vs the XLA stage chain.

Usage: python scripts/check_fft_pallas.py [m=8192]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from hehub_tpu.ops import df64
from hehub_tpu.ops.pallas import fft_pallas
from hehub_tpu.utils import profiling


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    print(f"[check] backend: {jax.default_backend()}", flush=True)
    rng = np.random.default_rng(7)
    br = df64.bitrev_perm(m)
    for batch in ((), (8,)):
        x = rng.uniform(-1, 1, (*batch, m)) + 1j * rng.uniform(
            -1, 1, (*batch, m))
        x4 = tuple(jnp.asarray(p) for p in df64.cfrom_c128(x[..., br]))
        exact = np.fft.fft(x, axis=-1)
        scale = np.abs(exact).max()

        t0 = time.perf_counter()
        pal = jax.jit(lambda a: fft_pallas.fft(a, m))(x4)
        jax.block_until_ready(pal)
        print(f"[check] batch={batch}: pallas compiled+ran in "
              f"{time.perf_counter()-t0:.1f}s", flush=True)
        gc = df64.cto_c128(*(np.asarray(p) for p in pal))
        err_p = np.abs(gc - exact).max() / scale

        xla = jax.jit(lambda a: df64.fft_xla(a, m))(x4)
        rc = df64.cto_c128(*(np.asarray(p) for p in xla))
        err_x = np.abs(rc - exact).max() / scale
        print(f"[check] batch={batch}: rel err pallas {err_p:.3e} "
              f"xla {err_x:.3e}", flush=True)
        assert err_p < 1e-11, f"pallas df64 FFT inaccurate on device: {err_p}"

        if batch:
            f_p = jax.jit(lambda a: fft_pallas.fft(a, m))
            f_x = jax.jit(lambda a: df64.fft_xla(a, m))
            jax.block_until_ready(f_p(x4)); jax.block_until_ready(f_x(x4))
            tp = profiling.device_time(f_p, (x4,), iters=20)
            tx = profiling.device_time(f_x, (x4,), iters=20)
            print(f"[check] m={m} batch={batch}: device time "
                  f"pallas {tp*1e6:.1f} us, xla chain {tx*1e6:.1f} us "
                  f"({tx/tp:.1f}x)", flush=True)
    print("[check] OK", flush=True)


if __name__ == "__main__":
    main()
