"""Global runtime configuration.

use_pallas: None = auto (fused Pallas kernels on TPU backends, XLA stage
chains elsewhere); True/False forces. The Pallas and XLA paths are bitwise
identical (tests/test_pallas.py)."""

from __future__ import annotations

from typing import Optional

use_pallas: Optional[bool] = None


def pallas_enabled() -> bool:
    if use_pallas is not None:
        return use_pallas
    import jax

    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
