"""Per-op timing and roofline accounting (new TPU-native subsystem; the
reference has no tracing/profiling infrastructure — SURVEY.md §5, and
BASELINE.json demands roofline numbers for the NTT and modmul kernels).

`time_op` measures steady-state wall time of a jitted function;
`ntt_roofline` / `modmul_roofline` convert that into achieved bytes/s and
int-op/s against the kernels' minimum memory traffic, the quantity that
bounds both (they are memory-bound on TPU: arithmetic intensity of the fused
NTT is ~1.5·log2(n) int-ops/byte, far below the VPU-to-HBM ratio only for
small n).

Also exposes `trace` — a thin wrapper over jax.profiler for capturing device
traces viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Callable, Dict, Optional

import jax


def time_op(fn: Callable, args: tuple, warmup: int = 2, iters: int = 10) -> float:
    """Steady-state seconds per call of `fn(*args)` (jit-compiled outside)."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def device_time(
    fn: Callable, args: tuple, iters: int = 4, name: Optional[str] = None
) -> float:
    """TRUE device seconds per call, from a jax.profiler trace.

    Wall clocks lie on remote-tunnel backends: block_until_ready can return
    at enqueue time and device-to-host fetches carry tens of ms of RPC
    latency. The profiler's device timeline is the only honest measurement
    there, so this captures a trace around `iters` calls and sums the
    device-side `jit_*` executable durations. Falls back to wall clock when
    no device events appear (CPU backend).

    `name`: restrict the sum to events named `jit_<name>*` so concurrent jit
    work on the same device cannot pollute the measurement. Defaults to the
    wrapped function's own name when discoverable (jax.jit of a named
    function); pass explicitly for lambdas."""
    import glob
    import gzip
    import json
    import tempfile

    if name is None:
        cand = getattr(fn, "__name__", None)  # jax.jit functools-wraps
        if cand and cand != "<lambda>":
            name = cand
    prefix = f"jit_{name}" if name else "jit_"

    out = fn(*args)
    jax.block_until_ready(out)
    with tempfile.TemporaryDirectory() as td:
        t0 = time.perf_counter()
        jax.profiler.start_trace(td)
        try:
            for _ in range(iters):
                out = fn(*args)
            jax.block_until_ready(out)
        finally:
            jax.profiler.stop_trace()
        wall = (time.perf_counter() - t0) / iters
        traces = sorted(glob.glob(f"{td}/plugins/profile/*/*.trace.json.gz"))
        if not traces:
            return wall
        with gzip.open(traces[-1]) as f:
            data = json.load(f)
        events = data.get("traceEvents", [])
        pids = {
            e["pid"]: str(e["args"].get("name", ""))
            for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"
        }
        total = 0.0
        for e in events:
            if (
                e.get("ph") == "X"
                and "dur" in e
                and "TPU" in pids.get(e["pid"], "")
                and str(e.get("name", "")).startswith(prefix)
            ):
                total += e["dur"]
        if total == 0.0:
            return wall
        return total / iters / 1e6


@dataclasses.dataclass
class Roofline:
    seconds: float
    bytes_moved: int  # minimum HBM traffic of the op
    int_ops: int  # 32-bit integer lane operations

    @property
    def gbytes_per_s(self) -> float:
        return self.bytes_moved / self.seconds / 1e9

    @property
    def gops_per_s(self) -> float:
        return self.int_ops / self.seconds / 1e9

    @property
    def arithmetic_intensity(self) -> float:
        return self.int_ops / self.bytes_moved

    def report(self, name: str, hbm_gbps: Optional[float] = None) -> str:
        s = (
            f"{name}: {self.seconds*1e6:.1f} us | {self.gbytes_per_s:.1f} GB/s"
            f" | {self.gops_per_s:.1f} Gint-op/s | AI={self.arithmetic_intensity:.1f}"
        )
        if hbm_gbps:
            s += f" | {100*self.gbytes_per_s/hbm_gbps:.0f}% of {hbm_gbps:.0f} GB/s HBM"
        return s


# Shoup mulmod = 4 half-word mults + ~8 adds/shifts ≈ 12 lane ops;
# a butterfly adds 2 lazy add/sub chains ≈ 6 more.
_OPS_PER_BUTTERFLY = 18
_OPS_PER_MULMOD = 20  # montgomery: 2 wide mults + reduce


def ntt_roofline(seconds: float, n: int, transforms: int) -> Roofline:
    """Fused-kernel NTT: one read + one write of the polynomial per
    transform (twiddles amortized across the row batch)."""
    logn = n.bit_length() - 1
    return Roofline(
        seconds=seconds,
        bytes_moved=transforms * 2 * 4 * n,
        int_ops=transforms * logn * (n // 2) * _OPS_PER_BUTTERFLY,
    )


def modmul_roofline(seconds: float, n_elements: int) -> Roofline:
    """Elementwise dynamic*dynamic mulmod: 2 reads + 1 write per element."""
    return Roofline(
        seconds=seconds,
        bytes_moved=n_elements * 3 * 4,
        int_ops=n_elements * _OPS_PER_MULMOD,
    )


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler device trace under `logdir`."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def op_counters() -> Dict[str, float]:
    """Live device memory stats for the default device (bytes)."""
    dev = jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    return dict(stats or {})
