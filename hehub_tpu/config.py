"""Global runtime configuration.

use_pallas: None = auto (fused Pallas kernels on TPU backends, XLA stage
chains elsewhere); True/False forces. The Pallas and XLA paths are bitwise
identical (tests/test_pallas.py)."""

from __future__ import annotations

from typing import Optional

use_pallas: Optional[bool] = None

# df64 on-device CKKS encode/decode FFT (ops/df64.py): None = auto
# (selected per call from the measured batch crossover below, TPU only);
# True/False forces. models/ckks.py additionally gates per call on the
# coefficient-magnitude precision bound and falls back to the float64 host
# pipeline.
use_df64_codec: Optional[bool] = None

# Measured crossover on TPU v5e at n=16384 (scripts/measure_df64_crossover,
# round-5 host, with the fused Pallas df64 FFT kernel engaged):
#   batch | host enc | df64 enc | host dec | df64 dec   (ms/call)
#       1 |    0.451 |    0.404 |    0.291 |    0.626
#       2 |    0.703 |    0.313 |    0.511 |    0.366
#       8 |    1.603 |    0.814 |    1.437 |    1.003
#      32 |    9.534 |    3.311 |    4.855 |    4.913
# Encode: the device path wins from batch 1 (the host float64 FFT is the
# bottleneck on this host). Decode: ambiguous at batch 1 (bench.py's
# in-flow measurement has the df64 path at 0.60 vs 0.88 ms for host,
# while this script's isolated host path measured 0.29 — host-cache
# sensitive), clearly df64 from batch 2 — select df64 throughout for
# consistency with the bench flow. Re-run the script after a host
# change — round 4's thresholds (4/8) were calibrated on a ~3x faster
# host core.
df64_auto_min_batch_encode: int = 1
df64_auto_min_batch_decode: int = 1


# Upper bound (MiB) on a single Pallas kernel family's host-expanded
# twiddle tables. None = unlimited (local TPU runtimes). Remote-compile
# environments that ship serialized HLO over HTTP reject programs whose
# embedded table constants exceed the request body limit (HTTP 413 at
# ~50-100 MB through the axon tunnel helper) — bench.py sets this to 30
# so oversized configurations (e.g. n=32768 at full depth: 51 MiB per
# direction) fall back to the XLA stage chains instead of failing to
# compile.
pallas_table_budget_mb: Optional[float] = None


def pallas_tables_fit(limbs: int, n: int) -> bool:
    """Would a Pallas kernel family's twiddle tables for `limbs` RNS limbs
    at ring dimension `n` fit the configured budget? (Footprint model:
    limbs x log2(n) stages x n lanes x 4 B x 2 for the Shoup companions —
    matches ntt_pallas._full_tables and extprod_pallas's per-limb
    expansions.)"""
    if pallas_table_budget_mb is None:
        return True
    logn = max(n.bit_length() - 1, 1)
    return limbs * logn * n * 8 / (1 << 20) <= pallas_table_budget_mb


def pallas_enabled() -> bool:
    if use_pallas is not None:
        return use_pallas
    import jax

    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _on_tpu() -> bool:
    import jax

    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def df64_encode_selected(batch: int = 1) -> bool:
    """Should this encode call take the df64 on-device FFT path?"""
    if use_df64_codec is not None:
        return use_df64_codec
    return batch >= df64_auto_min_batch_encode and _on_tpu()


def df64_decode_selected(batch: int = 1) -> bool:
    """Should this decode call take the df64 on-device FFT path?"""
    if use_df64_codec is not None:
        return use_df64_codec
    return batch >= df64_auto_min_batch_decode and _on_tpu()
