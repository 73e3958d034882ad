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

# Measured crossover on TPU v5e at n=16384 (BENCH_r04 vs BENCH_r03): the
# df64 device FFT costs ~0.39/0.62 ms encode/decode nearly flat in batch,
# while the host float64 pocketfft pipeline costs ~0.16/0.08 ms PER VECTOR
# of single-core host time (plus a small batched device stage). Auto mode
# therefore picks df64 only for batched codec calls — where the device FFT
# amortizes and the host path would scale linearly — and keeps the faster
# host pipeline for the single-vector case (the round-4 default of
# "always df64" regressed the single-vector headline ~2x).
df64_auto_min_batch_encode: int = 4
df64_auto_min_batch_decode: int = 8


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
