"""Measure the df64-vs-host codec crossover on the real TPU.

For each batch size, times CKKS encode+encrypt and decrypt+decode through
BOTH pipelines at n=16384 (headline shape):
  host : float64 pocketfft + digit split on host, decomposition on device
  df64 : on-device double-float32 FFT fused with decompose/Garner
The numbers calibrate config.df64_auto_min_batch_{encode,decode}.

Usage: python scripts/measure_df64_crossover.py [batches...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    import bench
    from hehub_tpu import config as hcfg
    from hehub_tpu.core import basecnv, rns
    from hehub_tpu.core.context import create_ckks_params, make_context
    from hehub_tpu.models import ckks
    from hehub_tpu.ops import df64
    from hehub_tpu.rlwe import rlwe as rlwe_mod
    from hehub_tpu.utils import profiling

    bench._enable_compile_cache()
    batches = [int(b) for b in sys.argv[1:]] or [1, 2, 4, 8, 16, 32]
    n = 16384
    params = create_ckks_params(n, scaling_bits=28, num_levels=7)
    ctx = make_context(params)
    ids = tuple(range(len(params.moduli)))
    mods = ctx.moduli_of(ids)
    scale0 = params.initial_scaling_factor
    K = ckks.decode_limb_count(scale0, ids, mods)
    half = n // 2
    sk = rlwe_mod.keygen(ctx, jax.random.key(0))
    enc_key = jax.random.key(2)
    rng = np.random.default_rng(1)
    iters = 8

    enc_core = ckks._encode_device_jit(ctx, ids)
    dec_core = ckks._decode_device_jit(ctx, ids, K, half, K < len(ids))

    @jax.jit
    def df64_encrypt(s4, sh, sl, key):
        resid = enc_core(s4, sh, sl)
        ct = rlwe_mod.encrypt_core(
            ctx, rns.RnsPoly(resid, rns.COEFF, ids), sk, key
        )
        return ct.c0.data, ct.c1.data

    @jax.jit
    def df64_decrypt(c0d, c1d, ih, il):
        c = rlwe_mod.RlweCt(
            rns.RnsPoly(c0d, rns.NTT, ids), rns.RnsPoly(c1d, rns.NTT, ids)
        )
        poly = rlwe_mod.decrypt_core(ctx, c, sk)
        return dec_core(poly.data, ih, il)

    @jax.jit
    def host_encrypt(digits, neg, key):
        pt_poly = ckks.decompose_digits(ctx, digits, neg, ids)
        ct = rlwe_mod.encrypt_core(ctx, pt_poly, sk, key)
        return ct.c0.data, ct.c1.data

    @jax.jit
    def host_decrypt(c0d, c1d):
        c = rlwe_mod.RlweCt(
            rns.RnsPoly(c0d, rns.NTT, ids), rns.RnsPoly(c1d, rns.NTT, ids)
        )
        poly = rlwe_mod.decrypt_core(ctx, c, sk)
        return basecnv.to_mixed_radix(ctx, poly.data, ids, K)

    print("batch | host enc ms (h+d) | df64 enc ms (h+d) | "
          "host dec ms (d+h) | df64 dec ms (d+h)", flush=True)
    for B in batches:
        vec = rng.uniform(-1, 1, (B, half))
        data = vec.astype(np.complex128)

        # host pipeline
        t0 = time.perf_counter()
        for _ in range(iters):
            digits, neg = ckks._encode_host(data, n, scale0)
        he_h = (time.perf_counter() - t0) / iters
        he_d = profiling.device_time(
            host_encrypt, (digits, neg, enc_key), iters=iters
        )
        c0, c1 = host_encrypt(digits, neg, enc_key)
        hd_d = profiling.device_time(host_decrypt, (c0, c1), iters=iters)
        dig = np.asarray(host_decrypt(c0, c1))
        t0 = time.perf_counter()
        for _ in range(iters):
            coeffs = ckks._mixed_radix_to_float(dig, mods[:K])
            out = ckks._decode_host(coeffs, n, scale0, half)
        hd_h = (time.perf_counter() - t0) / iters
        assert np.allclose(np.real(out), vec, atol=2**-12)

        # df64 pipeline
        sh, sl = df64.from_f64(float(scale0))
        ih, il = df64.from_f64(1.0 / float(scale0))
        t0 = time.perf_counter()
        for _ in range(iters):
            s4 = df64.cfrom_c128(data)
        de_h = (time.perf_counter() - t0) / iters
        de_d = profiling.device_time(
            df64_encrypt, (s4, sh, sl, enc_key), iters=iters
        )
        c0, c1 = df64_encrypt(s4, sh, sl, enc_key)
        dd_d = profiling.device_time(
            df64_decrypt, (c0, c1, ih, il), iters=iters
        )
        rh, rl, ii_h, ii_l, flag = df64_decrypt(c0, c1, ih, il)
        assert not bool(flag)
        planes = tuple(np.asarray(p) for p in (rh, rl, ii_h, ii_l))
        t0 = time.perf_counter()
        for _ in range(iters):
            out2 = df64.cto_c128(*planes)
        dd_h = (time.perf_counter() - t0) / iters
        assert np.allclose(np.real(out2), vec, atol=2**-12)

        print(
            f"{B:5d} | {1e3*(he_h+he_d):7.3f} ({1e3*he_h:.2f}+{1e3*he_d:.2f})"
            f" | {1e3*(de_h+de_d):7.3f} ({1e3*de_h:.2f}+{1e3*de_d:.2f})"
            f" | {1e3*(hd_d+hd_h):7.3f} ({1e3*hd_d:.2f}+{1e3*hd_h:.2f})"
            f" | {1e3*(dd_d+dd_h):7.3f} ({1e3*dd_d:.2f}+{1e3*dd_h:.2f})",
            flush=True,
        )


if __name__ == "__main__":
    main()
