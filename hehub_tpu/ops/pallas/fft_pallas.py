"""Fused df64 complex FFT as a single Pallas TPU kernel.

The XLA stage-chain in ops/df64.fft issues ~8 elementwise ops per butterfly
stage (13 stages at m=8192), each a separate tiny HBM round trip with
lane-relayout interleaves — launch overhead dominates (~0.5 ms of the
0.62 ms device decode at n=16384, BENCH_r05 work). This kernel keeps the
four f32 planes of a row block resident in VMEM for the whole transform,
mirroring the roll-based structure of ntt_pallas.py: every butterfly reads
its partner through a cyclic `pltpu.roll` of the whole tile and blends
lo/hi outputs with an iota mask, so there are ZERO per-stage relayouts.

Layout: a row of length m is the [G, B] matrix (G = m/128 sublanes,
B = 128 lanes). The FFT is in-order DIT over a pre-bit-reversed input
(span t = 2^s grows), so the early stages (t < B) pair along the LANE
axis and the late stages (t >= B) along sublanes — the same tail-first
traversal as the inverse NTT kernel. Twiddle tables are host-expanded
full width (stage twiddle at HI positions, zero at LO) in natural [G, B]
order, one [4, log m, m] f32 array for the four df64 planes.

Same error-free-transform arithmetic as ops/df64.py (imported), same
stage order. Outputs agree with the XLA chain bitwise on the hi planes;
the lo (residual) planes may differ at ulp level because compilers are
free to contract two_prod's mul+add chains into FMAs (which tightens the
residuals) differently per schedule — precision, not bit pattern, is the
contract (tests/test_df64.py::test_pallas_fft_matches_xla).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from hehub_tpu.ops import df64

B = 128  # lane width


@functools.lru_cache(maxsize=None)
def _kernel_tables(m: int) -> np.ndarray:
    """[4, log m, m] f32: per-stage forward-DFT twiddles e^{-iπ j/t} at HI
    positions (bit s of the index set), zero at LO — full-width for the
    roll-based butterfly, natural order."""
    logm = m.bit_length() - 1
    tab = np.zeros((4, logm, m), np.float32)
    idx = np.arange(m)
    for s in range(logm):
        t = 1 << s
        hi = (idx >> s) & 1 == 1
        w = np.exp(-1j * np.pi * (idx & (t - 1)) / t)
        w4 = df64.cfrom_c128(np.where(hi, w, 0.0))
        for p in range(4):
            tab[p, s] = w4[p]
    tab.setflags(write=False)
    return tab


def _fft_kernel(m: int, bb: int, tw_ref, rh_ref, rl_ref, ih_ref, il_ref,
                orh_ref, orl_ref, oih_ref, oil_ref):
    from jax.experimental.pallas import tpu as pltpu

    logm = m.bit_length() - 1
    G = m // B
    logb = B.bit_length() - 1
    s_tail = min(logb, logm)
    x = tuple(r[...].reshape(bb, G, B)
              for r in (rh_ref, rl_ref, ih_ref, il_ref))
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, B), 2)
    g_ids = jax.lax.broadcasted_iota(jnp.int32, (1, G, 1), 1)
    for s in range(logm):
        t = 1 << s
        w4 = tuple(tw_ref[p, s].reshape(G, B) for p in range(4))
        bw = df64.cmul(x, w4)  # = w·b at HI positions (table is 0 at LO)
        if s < s_tail:  # pair along lanes
            axis, size, shift = 2, B, t
            is_hi = ((lane_ids >> s) & 1) == 1
        else:  # pair along sublanes
            axis, size, shift = 1, G, t >> logb
            is_hi = ((g_ids >> (s - logb)) & 1) == 1
        down_bw = tuple(pltpu.roll(p, size - shift, axis) for p in bw)
        up_x = tuple(pltpu.roll(p, shift, axis) for p in x)
        lo_out = df64.cadd(x, down_bw)   # a + w·b (valid at LO)
        hi_out = df64.csub(up_x, bw)     # a − w·b (valid at HI)
        x = tuple(jnp.where(is_hi, h, l) for h, l in zip(hi_out, lo_out))
    for ref, p in zip((orh_ref, orl_ref, oih_ref, oil_ref), x):
        ref[...] = p.reshape(bb, m)


@functools.lru_cache(maxsize=None)
def _build(m: int, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    logm = m.bit_length() - 1
    assert m >= 2 * B and m == 1 << logm, "pallas FFT requires m = 2^k >= 256"
    tab = _kernel_tables(m)

    def run(x4):
        lead = x4[0].shape[:-1]
        R = max(int(np.prod(lead)), 1)
        planes = [p.reshape(R, m) for p in x4]
        pad = (-R) % 8 if R > 8 else 0
        if pad:
            planes = [
                jnp.concatenate([p, jnp.zeros((pad, m), jnp.float32)])
                for p in planes
            ]
        Rp = R + pad
        bb = min(8, Rp)
        body = functools.partial(_fft_kernel, m, bb)
        spec = pl.BlockSpec((bb, m), lambda r: (r, 0))
        out = pl.pallas_call(
            body,
            grid=(Rp // bb,),
            in_specs=[pl.BlockSpec((4, logm, m), lambda r: (0, 0, 0))]
            + [spec] * 4,
            out_specs=(spec,) * 4,
            out_shape=(jax.ShapeDtypeStruct((Rp, m), jnp.float32),) * 4,
            compiler_params=None
            if interpret
            else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(jnp.asarray(tab), *planes)
        return tuple(p[:R].reshape(*lead, m) for p in out)

    return run


def fft(x4, m: int, interpret: bool = False):
    """Drop-in Pallas replacement for df64.fft (same contract: pre-permuted
    bit-reversed input, natural-order forward DFT out)."""
    return _build(m, interpret)(x4)
