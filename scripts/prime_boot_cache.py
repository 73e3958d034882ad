"""Prime the persistent XLA compilation cache with the jitted CKKS
bootstrap refresh, so `python bench.py` (the driver's run) replays the
compile from cache in seconds instead of tens of minutes.

Usage: python scripts/prime_boot_cache.py [n] [timeout-note]
Run from the repo root (package path + axon plugin requirement).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    t0 = time.perf_counter()
    ms, err = bench.bench_bootstrap(n=n)
    print(f"primed n={n}: {ms:.1f} ms/refresh, max err {err:.2e}, "
          f"wall {time.perf_counter()-t0:.0f}s", flush=True)
