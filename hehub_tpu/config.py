"""Global runtime configuration.

use_pallas: None = auto (fused Pallas kernels on TPU backends, XLA stage
chains elsewhere); True/False forces. The Pallas and XLA paths are bitwise
identical (tests/test_pallas.py)."""

from __future__ import annotations

from typing import Optional

use_pallas: Optional[bool] = None

# df64 on-device CKKS encode/decode FFT (ops/df64.py): None = auto (on for
# TPU backends, off elsewhere — the host pocketfft path is faster than an
# XLA-CPU double-float chain); True/False forces. models/ckks.py
# additionally gates per call on the coefficient-magnitude precision bound
# and falls back to the float64 host pipeline.
use_df64_codec: Optional[bool] = None


def pallas_enabled() -> bool:
    if use_pallas is not None:
        return use_pallas
    import jax

    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def df64_codec_enabled() -> bool:
    if use_df64_codec is not None:
        return use_df64_codec
    import jax

    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
