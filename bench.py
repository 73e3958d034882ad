"""Benchmark harness — prints ONE JSON line with the primary metric.

Primary: forward negacyclic NTT throughput at N=16384 (transforms/s/chip),
vs the reference's 142 us single-core time (/root/reference/README.md:76,
BASELINE.md -> 7042 transforms/s).

Secondary metrics (stderr): INTT throughput, CKKS ct-ct mult+relin+rescale
ops/s at N=16384 — the north-star op (BASELINE.json), CKKS encode+encrypt.
"""

import json
import os
import sys
import time

import numpy as np


def _timeit(fn, args, warmup=2, iters=8):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    small = os.environ.get("BENCH_SMALL") == "1"
    n = 2048 if small else 16384
    levels = 3 if small else 7
    batch = 4 if small else 16

    import jax

    from hehub_tpu.core import rns
    from hehub_tpu.core.context import create_ckks_params, make_context
    from hehub_tpu.models import ckks
    from hehub_tpu.ops import ntt as nttmod
    from hehub_tpu.rlwe import keys as keys_mod
    from hehub_tpu.rlwe import rlwe as rlwe_mod

    dev = jax.devices()[0]
    print(f"[bench] device: {dev} platform={dev.platform}", file=sys.stderr)

    params = create_ckks_params(
        n, scaling_bits=28, num_levels=levels, use_security_budget=False
    )
    ctx = make_context(params)
    ids = tuple(range(len(params.moduli)))
    L = len(ids)
    qs = np.asarray(ctx.moduli_of(ids), np.uint32)[:, None]
    rng = np.random.default_rng(3)

    data = jax.device_put(
        rng.integers(0, 1 << 31, (batch, L, n)).astype(np.uint32) % (2 * qs)
    )

    # ---- NTT forward/inverse ------------------------------------------------
    fwd = jax.jit(lambda x: nttmod.ntt(ctx, x, ids))
    inv = jax.jit(lambda x: nttmod.intt(ctx, x, ids))
    t_fwd = _timeit(fwd, (data,))
    t_inv = _timeit(inv, (data,))
    ntt_per_sec = batch * L / t_fwd
    intt_per_sec = batch * L / t_inv
    print(
        f"[bench] NTT n={n}: {t_fwd*1e6/(batch*L):.1f} us/transform "
        f"({ntt_per_sec:.0f}/s); INTT {t_inv*1e6/(batch*L):.1f} us "
        f"({intt_per_sec:.0f}/s)",
        file=sys.stderr,
    )

    # ---- CKKS ct-ct mult + relin + rescale (north-star op) ------------------
    sk = rlwe_mod.keygen(ctx, jax.random.key(0))
    rlk = keys_mod.relin_key(ctx, sk, jax.random.key(1))
    rlk_host = type(rlk)(np.asarray(rlk.data), rlk.limb_ids)
    scale = params.initial_scaling_factor

    def mult_step(c0a, c1a, c0b, c1b):
        mk = lambda d: rns.RnsPoly(d, rns.NTT, ids)
        out = ckks.rescale(
            ctx,
            ckks.mult(
                ctx,
                ckks.CkksCt(mk(c0a), mk(c1a), scale),
                ckks.CkksCt(mk(c0b), mk(c1b), scale),
                type(rlk)(rlk_host.data, rlk.limb_ids),
            ),
        )
        return out.c0.data, out.c1.data

    cts = tuple(
        jax.device_put(
            rng.integers(0, 1 << 31, (batch, L, n)).astype(np.uint32) % (2 * qs)
        )
        for _ in range(4)
    )
    mult_jit = jax.jit(mult_step)
    t_mult = _timeit(mult_jit, cts, warmup=1, iters=4)
    mult_per_sec = batch / t_mult
    print(
        f"[bench] CKKS mult+relin+rescale n={n} L={L}: "
        f"{t_mult*1e3/batch:.2f} ms/op ({mult_per_sec:.1f}/s)",
        file=sys.stderr,
    )

    # ---- CKKS encode+encrypt (host encode + device encrypt) -----------------
    vec = rng.uniform(-1, 1, n // 2)
    enc_key = jax.random.key(2)

    def encode_encrypt():
        pt = ckks.encode(vec, params)
        return ckks.encrypt(ctx, pt, sk, enc_key)

    out = encode_encrypt()
    jax.block_until_ready(out.c0.data)
    t0 = time.perf_counter()
    for _ in range(4):
        out = encode_encrypt()
    jax.block_until_ready(out.c0.data)
    t_ee = (time.perf_counter() - t0) / 4
    print(f"[bench] CKKS encode+encrypt n={n}: {t_ee*1e3:.2f} ms", file=sys.stderr)

    extra = {
        "ntt_fwd_us_per_transform": t_fwd * 1e6 / (batch * L),
        "intt_us_per_transform": t_inv * 1e6 / (batch * L),
        "intt_per_sec": intt_per_sec,
        "ckks_mult_relin_rescale_per_sec": mult_per_sec,
        "ckks_mult_ms_per_op": t_mult * 1e3 / batch,
        "ckks_encode_encrypt_ms": t_ee * 1e3,
        "n": n,
        "limbs": L,
        "batch": batch,
        "device": str(dev),
    }
    print(f"[bench] extra: {json.dumps(extra)}", file=sys.stderr)

    baseline_ntt_per_sec = 1e6 / 142.0  # README.md:76, N=16384 forward
    print(
        json.dumps(
            {
                "metric": "ntt_fwd_n16384_transforms_per_sec",
                "value": round(ntt_per_sec, 1),
                "unit": "transforms/s",
                "vs_baseline": round(ntt_per_sec / baseline_ntt_per_sec, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
