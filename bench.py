"""Benchmark harness — prints ONE JSON line with the primary metric.

Primary: forward negacyclic NTT throughput at N=16384 (transforms/s/chip),
vs the reference's 142 us single-core time (/root/reference/README.md:76,
BASELINE.md -> 7042 transforms/s).

Secondary metrics (stderr): INTT throughput, CKKS ct-ct mult+relin+rescale
ops/s at N=16384 — the north-star op (BASELINE.json), CKKS encode+encrypt,
and rooflines for the NTT and modmul kernels.

Env:
  BENCH_SMALL=1  tiny shapes (quick smoke run)
  BENCH_TABLE=1  additionally print the full README-parity table
                 (N=1024..32768 NTT/INTT/encode+encrypt/decrypt+decode)
  BENCH_GRID=1   additionally run the reference's bench grid (LOGN 12-15 x
                 scaling 36/43/48/55: rotation + mult, benchmarks.cpp:21-22)
  BENCH_BUDGET   overall wall budget in seconds (default 1350). The primary
                 JSON line is printed right after the headline metrics; the
                 slow extras (full-depth, TFHE, CKKS bootstrap) only run
                 while budget remains, so the bench NEVER exceeds the
                 driver's timeout with an unparsed result.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.abspath(__file__))


def _enable_compile_cache():
    """Persistent XLA compilation cache (works through the axon tunnel's
    remote compile helper — verified: 8.2 s cold / 0.37 s warm). The CKKS
    bootstrap's ~10^4-op jitted refresh compiles in tens of minutes cold;
    with the cache primed (scripts/prime_boot_cache.py, run during
    development) the driver's bench run replays it in seconds."""
    import jax

    from hehub_tpu import config as _cfg

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    # The tunnel's remote-compile helper rejects serialized programs with
    # embedded constants beyond its HTTP body limit (413 observed between
    # ~48 and ~102 MB of twiddle tables). 30 MiB per kernel family keeps
    # every measured-working configuration (full-depth n=16384 L=13 =
    # 24 MiB) on the Pallas kernels and sends oversized ones (n=32768
    # full-depth: 51 MiB) to the XLA chains.
    _cfg.pallas_table_budget_mb = 30


def _timeit(fn, args, warmup=2, iters=8):
    """TRUE device time per call via a profiler trace — wall clocks lie on
    the remote-tunnel TPU backend (block_until_ready returns at enqueue)."""
    from hehub_tpu.utils import profiling

    return profiling.device_time(fn, args, iters=iters)


def _err(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_ntt(ctx, params, batch, ids):
    import jax

    from hehub_tpu.ops import ntt as nttmod
    from hehub_tpu.utils import profiling

    n = params.dimension
    L = len(ids)
    qs = np.asarray(ctx.moduli_of(ids), np.uint32)[:, None]
    rng = np.random.default_rng(3)
    data = jax.device_put(
        rng.integers(0, 1 << 31, (batch, L, n)).astype(np.uint32) % (2 * qs)
    )

    def ntt_fwd_bench(x):
        return nttmod.ntt(ctx, x, ids)

    def ntt_inv_bench(x):
        return nttmod.intt(ctx, x, ids)

    fwd = jax.jit(ntt_fwd_bench)
    inv = jax.jit(ntt_inv_bench)
    t_fwd = _timeit(fwd, (data,))
    t_inv = _timeit(inv, (data,))
    rl = profiling.ntt_roofline(t_fwd, n, batch * L)
    _err(f"[bench] {rl.report(f'NTT n={n} x{batch*L}')}")
    return t_fwd, t_inv, data


def bench_encode_decode(ctx, params, ids, sk, vec, enc_key, iters=8):
    """encode+encrypt and decrypt+decode timings.

    df64 codec path (default on TPU): the slot FFT runs ON DEVICE in
    double-float32 (ops/df64.py) fused with the residue decomposition,
    encrypt NTTs / Garner digits — the host does only the complex128 <->
    f32-pair splits. Fallback (HEHUB_DF64=0 semantics via config): host
    float64 FFT + digit split, device decomposition."""
    import jax

    from hehub_tpu import config as hcfg
    from hehub_tpu.core import basecnv, rns
    from hehub_tpu.models import ckks
    from hehub_tpu.rlwe import rlwe as rlwe_mod

    n = params.dimension
    scale0 = params.initial_scaling_factor
    mods = ctx.moduli_of(ids)
    K = ckks.decode_limb_count(scale0, ids, mods)

    # mirror the library's per-call selection (config.df64_*_selected plus
    # ckks.encode's coefficient-magnitude gate) for a single-vector call —
    # auto mode picks the host pipeline here (faster below the measured
    # batch crossover); HEHUB-forced df64 (config.use_df64_codec=True)
    # exercises the device path
    max_abs = float(np.abs(vec).max(initial=0.0))
    if (
        hcfg.df64_encode_selected(1)
        and scale0 * max(max_abs, 1.0) <= ckks._DF64_COEFF_BOUND
        and K <= 3
    ):
        from hehub_tpu.ops import df64

        half = n // 2
        enc_core = ckks._encode_device_jit(ctx, ids)
        dec_core = ckks._decode_device_jit(ctx, ids, K, half, K < len(ids))

        @jax.jit
        def encrypt_dev(s4, sh, sl, key):
            resid = enc_core(s4, sh, sl)
            pt_poly = rns.RnsPoly(resid, rns.COEFF, ids)
            ct = rlwe_mod.encrypt_core(ctx, pt_poly, sk, key)
            return ct.c0.data, ct.c1.data

        @jax.jit
        def decrypt_dev(c0d, c1d, ih, il):
            c = rlwe_mod.RlweCt(
                rns.RnsPoly(c0d, rns.NTT, ids), rns.RnsPoly(c1d, rns.NTT, ids)
            )
            poly = rlwe_mod.decrypt_core(ctx, c, sk)
            return dec_core(poly.data, ih, il)

        data = np.atleast_1d(vec.astype(np.complex128))
        if data.shape[-1] < half:
            padded = np.zeros((*data.shape[:-1], half), np.complex128)
            padded[..., : data.shape[-1]] = data
            data = padded
        sh, sl = df64.from_f64(float(scale0))
        ih, il = df64.from_f64(1.0 / float(scale0))
        t0 = time.perf_counter()
        for _ in range(iters):
            s4 = df64.cfrom_c128(data)
        t_enc_host = (time.perf_counter() - t0) / iters
        t_enc_dev = _timeit(encrypt_dev, (s4, sh, sl, enc_key), iters=iters)
        c0, c1 = encrypt_dev(s4, sh, sl, enc_key)
        t_dec_dev = _timeit(decrypt_dev, (c0, c1, ih, il), iters=iters)
        rh, rl, ii_h, ii_l, flag = decrypt_dev(c0, c1, ih, il)
        assert not bool(flag), "df64 decode sentinel fired in bench"
        # D2H excluded (as in the host-path timing below): the tunnel's
        # ~24 ms RPC fetch latency is not a pipeline cost
        planes = tuple(
            np.asarray(p) for p in (rh, rl, ii_h, ii_l)
        )
        t0 = time.perf_counter()
        for _ in range(iters):
            out = df64.cto_c128(*planes)
        t_dec_host = (time.perf_counter() - t0) / iters
        assert np.allclose(np.real(out[: len(vec)]), vec, atol=2**-12), \
            "df64 round trip failed"
        t_ee = t_enc_host + t_enc_dev
        t_dd = t_dec_host + t_dec_dev
        enc_parts = (
            f"enc host {t_enc_host*1e3:.2f} + dev {t_enc_dev*1e3:.2f} ms"
            f" [df64 on-device FFT]"
        )
        dec_parts = (
            f"dec dev {t_dec_dev*1e3:.2f} + host {t_dec_host*1e3:.2f} ms"
            f" [df64 on-device FFT]"
        )
        return t_ee, t_dd, enc_parts, dec_parts

    @jax.jit
    def encrypt_dev(digits, neg, key):
        pt_poly = ckks.decompose_digits(ctx, digits, neg, ids)
        ct = rlwe_mod.encrypt_core(ctx, pt_poly, sk, key)
        return ct.c0.data, ct.c1.data

    @jax.jit
    def decrypt_dev(c0d, c1d):
        c = rlwe_mod.RlweCt(
            rns.RnsPoly(c0d, rns.NTT, ids), rns.RnsPoly(c1d, rns.NTT, ids)
        )
        poly = rlwe_mod.decrypt_core(ctx, c, sk)
        return basecnv.to_mixed_radix(ctx, poly.data, ids, K)

    # host half of encode
    digits, neg = ckks._encode_host(
        np.atleast_1d(vec.astype(np.complex128)), n, scale0)
    t0 = time.perf_counter()
    for _ in range(iters):
        digits, neg = ckks._encode_host(
            np.atleast_1d(vec.astype(np.complex128)), n, scale0)
    t_enc_host = (time.perf_counter() - t0) / iters
    t_enc_dev = _timeit(encrypt_dev, (digits, neg, enc_key), iters=iters)
    c0, c1 = encrypt_dev(digits, neg, enc_key)

    t_dec_dev = _timeit(decrypt_dev, (c0, c1), iters=iters)
    dig = np.asarray(decrypt_dev(c0, c1))
    t0 = time.perf_counter()
    for _ in range(iters):
        coeffs = ckks._mixed_radix_to_float(dig, mods[:K])
        out = ckks._decode_host(coeffs, n, scale0, n // 2)
    t_dec_host = (time.perf_counter() - t0) / iters
    assert np.allclose(np.real(out), vec, atol=2**-12), "round trip failed"
    t_ee = t_enc_host + t_enc_dev
    t_dd = t_dec_host + t_dec_dev
    enc_parts = (
        f"enc host {t_enc_host*1e3:.2f} + dev {t_enc_dev*1e3:.2f} ms"
        f" [float64 host FFT]"
    )
    dec_parts = (
        f"dec dev {t_dec_dev*1e3:.2f} + host {t_dec_host*1e3:.2f} ms"
        f" [float64 host FFT]"
    )
    return t_ee, t_dd, enc_parts, dec_parts


def bench_bootstrap(n=4096, num_levels=28, degree=63, split=None):
    """Full CKKS bootstrap on device: returns ms per refresh (trace-based
    device time). Uses the production recipe: two-limb working scale,
    Δ_in=2^26, arcsine correction (circuits/bootstrap.py).

    Default split=True compiles C2S / EvalMod / S2C as three independent
    jitted programs (bitwise-equal to the monolithic refresh) and reports
    the SUM of their device times — each stage is its own persistent-cache
    entry, so an interrupted warm-up keeps the stages that finished and a
    per-stage compile is minutes where the whole refresh is tens of
    minutes through the remote compile helper. BENCH_BOOT_SPLIT=0 times
    the monolithic single-program refresh instead. The keys are derived
    from fixed PRNG seeds so the traced programs are byte-identical across
    processes (a cache-hit requirement).

    AOT artifact: the first successful split-mode run exports the four
    stage programs + keys + plans to .boot_cache/ (boot_artifact.py);
    later runs load them and skip the three circuit tracings (~13 min of
    single-core Python at n=4096), going straight to compile-from-cache +
    execute. The correctness check still runs end-to-end every time."""
    import jax

    _enable_compile_cache()

    from hehub_tpu.circuits import boot_artifact
    from hehub_tpu.circuits import bootstrap as bs
    from hehub_tpu.core.context import make_context
    from hehub_tpu.models import ckks
    from hehub_tpu.rlwe import keys as keys_mod
    from hehub_tpu.rlwe import rlwe as rlwe_mod
    from hehub_tpu.utils import profiling

    if split is None:
        split = os.environ.get("BENCH_BOOT_SPLIT", "1") == "1"
    art_path = os.path.join(
        _REPO, ".boot_cache", f"boot_n{n}_L{num_levels}_d{degree}_s3.pkl"
    )

    # THREE special primes (P ≈ 2^90): the r4 zero-noise diagnosis showed
    # the refresh error was key-switch noise — C2S rotation noise ~2e-5
    # amplified by S2C's operator norm sqrt(n/2) and the q0/Δ_in
    # reinterpretation to 2e-2. P 2^60 → 2^90 crushes it to the ~1e-5
    # quantization floor.
    params = bs.make_boot_params(n, num_levels=num_levels, num_special=3)
    ctx = make_context(params)
    sk = rlwe_mod.keygen(ctx, jax.random.key(0), hamming_weight=8)

    rng = np.random.default_rng(3)
    v = rng.uniform(-1, 1, n // 2)
    d_in = 2.0**26

    if split and os.path.exists(art_path) \
            and os.environ.get("BENCH_BOOT_ARTIFACT", "1") == "1":
        t0 = time.perf_counter()
        refresh = boot_artifact.load(art_path)
        _err(f"[bench] bootstrap artifact loaded in "
             f"{time.perf_counter()-t0:.1f}s ({art_path})")
        pt = ckks.encode(v, params, scaling_factor=d_in,
                         level=len(params.moduli) - 1)
        ct = ckks.encrypt(ctx, pt, sk, jax.random.key(7))
        return _time_boot_stages(refresh, ct, ctx, params, sk, v)

    rlk = keys_mod.relin_key(ctx, sk, jax.random.key(1))
    # n >= 16384: trace the refresh with the XLA NTT chain. The Pallas
    # kernel's full-width twiddle tables ([L, stages, n] x4 ~ 113 MB at
    # n=16384 L=31) are jaxpr constants, and the remote-compile helper
    # rejects the serialized stage programs with HTTP 413. A tunnel
    # payload limit, not a design one — the Pallas kernel itself is
    # benched at this n in the headline NTT section.
    from hehub_tpu import config as _hcfg

    prev_pallas = _hcfg.use_pallas
    if n >= 16384:
        _hcfg.use_pallas = False
    # factored (radix) C2S/S2C at production dims: fewer rotation keys (52
    # vs 94 at n=4096) and ~100x less plan storage than dense BSGS, at 2
    # extra levels per transform (accuracy stays well under 1e-3)
    lt_stages = 3 if n >= 2048 else 0
    t0 = time.perf_counter()
    rot_keys = {
        st: keys_mod.rot_key(ctx, sk, st, jax.random.key(100 + st))
        for st in bs.bootstrap_rotation_steps(params, lt_stages)
    }
    ck = keys_mod.conj_key(ctx, sk, jax.random.key(5))
    _err(f"[bench] bootstrap keygen: {len(rot_keys)} rotation keys in "
         f"{time.perf_counter()-t0:.1f}s")
    pt = ckks.encode(v, params, scaling_factor=d_in,
                     level=len(params.moduli) - 1)
    ct = ckks.encrypt(ctx, pt, sk, jax.random.key(7))
    booter = bs.Bootstrapper(ctx, params, rlk, rot_keys, ck, k_bound=5,
                             degree=degree, arcsine=True,
                             lt_stages=lt_stages)

    # The refresh is jitted with keys and plan plaintexts as jit
    # PARAMETERS — baked constants would put hundreds of MB into the
    # serialized HLO, which the remote-compile endpoint rejects (HTTP 413).
    t0 = time.perf_counter()
    refresh = bs.CompiledBootstrapper(booter, ct, split=split)
    _err(f"[bench] bootstrap plan discovery+materialize: "
         f"{time.perf_counter()-t0:.1f}s (split={split}; "
         + ", ".join(f"{k}={v:.1f}s" for k, v in refresh.timings.items())
         + ")")
    t0 = time.perf_counter()
    out_ct = refresh(ct)
    jax.block_until_ready(out_ct.c0.data)
    _err(f"[bench] bootstrap trace+compile+run: {time.perf_counter()-t0:.1f}s")
    if split and os.environ.get("BENCH_BOOT_ARTIFACT", "1") == "1":
        from hehub_tpu.circuits import boot_artifact

        os.makedirs(os.path.dirname(art_path), exist_ok=True)
        t0 = time.perf_counter()
        boot_artifact.save(refresh, art_path)
        _err(f"[bench] bootstrap artifact saved+primed in "
             f"{time.perf_counter()-t0:.1f}s ({art_path})")
    _hcfg.use_pallas = prev_pallas
    if not split:
        got = np.real(ckks.decode(ckks.decrypt(ctx, out_ct, sk), params))
        err = float(np.abs(got - v).max())
        _err(f"[bench] bootstrap correctness: max err {err:.3e}")
        t = profiling.device_time(
            refresh._fn,
            (ct.c0.data, ct.c1.data, refresh._key_data, refresh._plan_pts),
            iters=2, name="refresh",
        )
        return t * 1e3, err
    return _time_boot_stages(refresh, ct, ctx, params, sk, v)


def _time_boot_stages(refresh, ct, ctx, params, sk, v):
    """Correctness check + per-stage device timing of a split-mode refresh
    (CompiledBootstrapper or boot_artifact.LoadedBootstrapper). The stages
    are sequentially dependent, so ms/refresh = the sum."""
    import jax

    from hehub_tpu.models import ckks
    from hehub_tpu.utils import profiling

    out_ct = refresh(ct)
    jax.block_until_ready(out_ct.c0.data)
    got = np.real(ckks.decode(ckks.decrypt(ctx, out_ct, sk), params))
    err = float(np.abs(got - v).max())
    _err(f"[bench] bootstrap correctness: max err {err:.3e}")
    kd, pp = refresh._key_data, refresh._plan_pts
    fa, fb_re, fb_im, fc = (f for _, f in refresh.stage_fns())
    a = fa(ct.c0.data, ct.c1.data, kd, pp)
    wre = fb_re(a[0], a[1], kd, pp)
    wim = fb_im(a[2], a[3], kd, pp)
    total = 0.0
    for name, fn, args in (
        ("c2s", fa, (ct.c0.data, ct.c1.data, kd, pp)),
        ("evalmod_re", fb_re, (a[0], a[1], kd, pp)),
        ("evalmod_im", fb_im, (a[2], a[3], kd, pp)),
        ("s2c", fc, (wre[0], wre[1], wim[0], wim[1], kd, pp)),
    ):
        # name="": match every jit event — each stage is its own jitted
        # program and runs ALONE during its trace window, and the artifact
        # path's deserialized callables carry unhelpful __name__s
        ts = profiling.device_time(fn, args, iters=2, name="")
        _err(f"[bench] bootstrap stage {name}: {ts*1e3:.2f} ms")
        total += ts
    return total * 1e3, err


def _bootstrap_subprocess(n: int, timeout_s: float):
    """Run bench_bootstrap in a child process under a hard timeout, so a
    cold compile cache degrades to boot_ms=null instead of hanging the
    whole bench. Returns (ms, max_err) or (None, None)."""
    code = (
        "import bench, json; ms, err = bench.bench_bootstrap(n=%d); "
        "print('BOOT_RESULT ' + json.dumps([ms, err]))" % n
    )
    try:
        p = subprocess.run(
            [sys.executable, "-c", code], cwd=_REPO, capture_output=True,
            text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired as e:
        for chunk in (e.stderr or b"", e.stdout or b""):
            if isinstance(chunk, bytes):
                chunk = chunk.decode(errors="replace")
            sys.stderr.write(chunk)
        _err(f"[bench] bootstrap subprocess exceeded {timeout_s:.0f}s "
             f"(cold compile cache?) — reporting null")
        return None, None
    sys.stderr.write(p.stderr)
    if p.returncode != 0:
        _err(f"[bench] bootstrap subprocess failed (rc={p.returncode})")
        return None, None
    for line in p.stdout.splitlines():
        if line.startswith("BOOT_RESULT "):
            ms, err = json.loads(line[len("BOOT_RESULT "):])
            return ms, err
    return None, None


def bench_full_depth_ops(n: int, batch: int):
    """mult+relin+rescale and rotate at the FULL standard security budget
    for dimension n (num_levels=None fills it — ≙ the reference's
    create_params, basics.cpp:40-64). Returns (t_mult, t_rot, L)."""
    import jax

    from hehub_tpu.core import rns
    from hehub_tpu.core.context import create_ckks_params, make_context
    from hehub_tpu.models import ckks
    from hehub_tpu.rlwe import keys as keys_mod
    from hehub_tpu.rlwe import rlwe as rlwe_mod

    params = create_ckks_params(n, scaling_bits=28)
    ctx = make_context(params)
    ids = tuple(range(len(params.moduli)))
    L = len(ids)
    qs = np.asarray(ctx.moduli_of(ids), np.uint32)[:, None]
    sk = rlwe_mod.keygen(ctx, jax.random.key(0))
    rlk = keys_mod.relin_key(ctx, sk, jax.random.key(1))
    rk = keys_mod.rot_key(ctx, sk, 1, jax.random.key(2))
    scale = params.initial_scaling_factor
    rng = np.random.default_rng(5)
    cts = tuple(
        jax.device_put(
            rng.integers(0, 1 << 31, (batch, L, n)).astype(np.uint32)
            % (2 * qs)
        )
        for _ in range(4)
    )
    mk = lambda d: rns.RnsPoly(d, rns.NTT, ids)

    def mult_step(c0a, c1a, c0b, c1b):
        out = ckks.rescale(
            ctx,
            ckks.mult(ctx, ckks.CkksCt(mk(c0a), mk(c1a), scale),
                      ckks.CkksCt(mk(c0b), mk(c1b), scale), rlk),
        )
        return out.c0.data, out.c1.data

    def rotate_step(c0d, c1d):
        out = ckks.rotate(ctx, ckks.CkksCt(mk(c0d), mk(c1d), scale), rk, 1)
        return out.c0.data, out.c1.data

    t_mult = _timeit(jax.jit(mult_step), cts, warmup=1, iters=4)
    t_rot = _timeit(jax.jit(rotate_step), cts[:2], iters=4)
    return t_mult, t_rot, L


def rotation_grid():
    """The reference's runnable benchmark grid: LOGN 12-15 x scaling bits
    36/43/48/55 (/root/reference/bench/benchmarks.cpp:21-22), measuring
    CKKS rotation (its only live benchmark) plus mult+relin+rescale."""
    import jax

    from hehub_tpu.core import rns
    from hehub_tpu.core.context import create_ckks_params, make_context
    from hehub_tpu.models import ckks
    from hehub_tpu.rlwe import keys as keys_mod
    from hehub_tpu.rlwe import rlwe as rlwe_mod

    _err("[grid] logn | scale bits | L | rotate ms/op | mult ms/op")
    for logn in (12, 13, 14, 15):
        n = 1 << logn
        for bits in (36, 43, 48, 55):
            # reference-equivalent depth: fill the standard security budget
            # (basics.cpp:40-64). Cells whose budget can't hold the scale
            # (logn=12 at 48/55 bits) fall back to the minimum viable depth,
            # marked insecure — the reference builds those insecurely too.
            try:
                params = create_ckks_params(n, scaling_bits=bits)
                secure = True
            except ValueError:
                levels = max((bits + 12) // 29 + 2, 4)
                params = create_ckks_params(
                    n, scaling_bits=bits, num_levels=levels,
                    use_security_budget=False,
                )
                secure = False
            ctx = make_context(params)
            ids = tuple(range(len(params.moduli)))
            L = len(ids)
            qs = np.asarray(ctx.moduli_of(ids), np.uint32)[:, None]
            sk = rlwe_mod.keygen(ctx, jax.random.key(0))
            rk = keys_mod.rot_key(ctx, sk, 1, jax.random.key(1))
            rlk = keys_mod.relin_key(ctx, sk, jax.random.key(2))
            scale = params.initial_scaling_factor
            batch = 8
            rng = np.random.default_rng(5)
            cts = tuple(
                jax.device_put(
                    rng.integers(0, 1 << 31, (batch, L, n)).astype(np.uint32)
                    % (2 * qs)
                )
                for _ in range(4)
            )
            mk = lambda d: rns.RnsPoly(d, rns.NTT, ids)

            def rot_step(c0d, c1d):
                out = ckks.rotate(ctx, ckks.CkksCt(mk(c0d), mk(c1d), scale),
                                  rk, 1)
                return out.c0.data, out.c1.data

            def mult_step(c0a, c1a, c0b, c1b):
                out = ckks.rescale_auto(
                    ctx,
                    ckks.mult(ctx, ckks.CkksCt(mk(c0a), mk(c1a), scale),
                              ckks.CkksCt(mk(c0b), mk(c1b), scale), rlk),
                )
                return out.c0.data, out.c1.data

            t_rot = _timeit(jax.jit(rot_step), cts[:2], iters=2)
            t_mul = _timeit(jax.jit(mult_step), cts, iters=2)
            _err(
                f"[grid] {logn:4d} | {bits:10d} | {L} | "
                f"{t_rot*1e3/batch:12.3f} | {t_mul*1e3/batch:10.3f}"
                f"{'' if secure else '  (insecure fallback depth)'}"
            )


def full_table():
    """README-parity dimensions (/root/reference/README.md:67-77)."""
    import jax

    from hehub_tpu.core.context import (
        STD_LOGQP_BUDGET, create_ckks_params, make_context,
    )
    from hehub_tpu.models import ckks
    from hehub_tpu.rlwe import rlwe as rlwe_mod

    _err("[table] N | NTT us | INTT us | enc+encrypt ms | decrypt+decode ms")
    for n in (1024, 2048, 4096, 8192, 16384, 32768):
        # unsafe levels at small n: the README table's dimensions, not a
        # secure parameter recommendation (n<=2048 cannot hold a 2^28 scale
        # within the 128-bit budget)
        params = create_ckks_params(
            n, scaling_bits=28,
            num_levels=max(STD_LOGQP_BUDGET[n] // 30 - 1, 2),
            use_security_budget=False,
        )
        ctx = make_context(params)
        ids = tuple(range(len(params.moduli)))
        batch = max(2048 // n * 8, 8)
        t_fwd, t_inv, _ = bench_ntt(ctx, params, batch, ids)
        from hehub_tpu.core import rns

        k = batch * len(ids)
        sk = rlwe_mod.keygen(ctx, jax.random.key(0))
        vec = np.random.default_rng(1).uniform(-1, 1, n // 2)
        enc_key = jax.random.key(2)
        scale0 = params.initial_scaling_factor
        t_ee, t_dd, enc_parts, dec_parts = bench_encode_decode(
            ctx, params, ids, sk, vec, enc_key
        )
        _err(
            f"[table] {n:6d} | {t_fwd*1e6/k:7.1f} | {t_inv*1e6/k:7.1f} | "
            f"{t_ee*1e3:8.2f} | {t_dd*1e3:8.2f}   ({enc_parts}; {dec_parts})"
        )


def main():
    small = os.environ.get("BENCH_SMALL") == "1"
    n = 2048 if small else 16384
    levels = 3 if small else 7
    batch = 4 if small else 64

    # Overall wall budget. The round-3 driver run was killed (rc=124)
    # before the final JSON line was printed, losing the whole run's
    # result. Two defenses now: (1) the primary JSON metric is printed
    # IMMEDIATELY after the headline section, before any slow extras;
    # (2) the slow extras (full-depth, TFHE, bootstrap) respect the
    # remaining budget and are skipped rather than overrunning.
    t_bench_start = time.perf_counter()
    budget_s = float(os.environ.get("BENCH_BUDGET", "1350"))

    def _remaining():
        return budget_s - (time.perf_counter() - t_bench_start)

    import jax

    # Persistent compile cache for EVERY jit in the bench (not just the
    # bootstrap): through the remote-compile tunnel a cold headline run
    # spends tens of minutes in compiles; warm it replays in seconds.
    _enable_compile_cache()

    from hehub_tpu.core import rns
    from hehub_tpu.core.context import create_ckks_params, make_context
    from hehub_tpu.models import ckks
    from hehub_tpu.ops import modarith as ma
    from hehub_tpu.rlwe import keys as keys_mod
    from hehub_tpu.rlwe import rlwe as rlwe_mod
    from hehub_tpu.utils import profiling

    dev = jax.devices()[0]
    _err(f"[bench] device: {dev} platform={dev.platform}")

    # n=16384 with 7+1 limbs is 240 bits <= the 438-bit 128-bit-security
    # budget: the headline benchmark runs SECURE parameters (small mode is
    # a toy-dimension smoke run)
    params = create_ckks_params(
        n, scaling_bits=28, num_levels=levels, use_security_budget=not small
    )
    ctx = make_context(params)
    ids = tuple(range(len(params.moduli)))
    L = len(ids)
    qs = np.asarray(ctx.moduli_of(ids), np.uint32)[:, None]
    rng = np.random.default_rng(3)

    # ---- NTT forward/inverse (+ roofline) -----------------------------------
    t_fwd, t_inv, data = bench_ntt(ctx, params, batch, ids)
    ntt_per_sec = batch * L / t_fwd
    intt_per_sec = batch * L / t_inv
    _err(
        f"[bench] NTT n={n}: {t_fwd*1e6/(batch*L):.1f} us/transform "
        f"({ntt_per_sec:.0f}/s); INTT {t_inv*1e6/(batch*L):.1f} us "
        f"({intt_per_sec:.0f}/s)"
    )

    # ---- raw modmul roofline ------------------------------------------------
    def modmul_bench(a, b):
        return ma.mul_mod_lazy(
            a, b, ctx.rows("q", ids), ctx.rows("neg_qinv", ids),
            ctx.rows("r_mod_q", ids), ctx.rows("r_shoup", ids),
        )

    mm = jax.jit(modmul_bench)
    data2 = jax.device_put(
        rng.integers(0, 1 << 31, (batch, L, n)).astype(np.uint32) % (2 * qs)
    )
    t_mm = _timeit(mm, (data, data2))
    rl_mm = profiling.modmul_roofline(t_mm, batch * L * n)
    _err(f"[bench] {rl_mm.report(f'modmul {batch*L*n} elems')}")

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
    _err(
        f"[bench] CKKS mult+relin+rescale n={n} L={L}: "
        f"{t_mult*1e3/batch:.2f} ms/op ({mult_per_sec:.1f}/s)"
    )

    # ---- CKKS encode+encrypt / decrypt+decode (device-side pipeline) --------
    vec = rng.uniform(-1, 1, n // 2)
    enc_key = jax.random.key(2)
    t_ee, t_dd, enc_parts, dec_parts = bench_encode_decode(
        ctx, params, ids, sk, vec, enc_key
    )
    _err(f"[bench] CKKS encode+encrypt n={n}: {t_ee*1e3:.2f} ms ({enc_parts})")
    _err(f"[bench] CKKS decrypt+decode n={n}: {t_dd*1e3:.2f} ms ({dec_parts})")

    # ---- CKKS rotation — the reference's only live benchmark ----------------
    # (/root/reference/bench/benchmarks.cpp:20-37: rotate = Galois map +
    # key switch + rescale of the special prime)
    rk = keys_mod.rot_key(ctx, sk, 1, jax.random.key(12))
    rk_host = type(rk)(np.asarray(rk.data), rk.limb_ids, rk.alpha)

    def rotate_step(c0d, c1d):
        mk = lambda d: rns.RnsPoly(d, rns.NTT, ids)
        out = ckks.rotate(
            ctx, ckks.CkksCt(mk(c0d), mk(c1d), scale),
            type(rk)(rk_host.data, rk.limb_ids, rk.alpha), 1,
        )
        return out.c0.data, out.c1.data

    rot_jit = jax.jit(rotate_step)
    t_rot = _timeit(rot_jit, cts[:2], iters=4)
    rotate_per_sec = batch / t_rot
    _err(
        f"[bench] CKKS rotate n={n} L={L}: {t_rot*1e3/batch:.2f} ms/op "
        f"({rotate_per_sec:.1f}/s)"
    )

    # ---- PRIMARY METRIC (driver contract: ONE JSON line on stdout) -----------
    # Printed here, before the slow extras, so a driver timeout during the
    # extras still leaves a parsed result. Reference forward-NTT times per
    # N (/root/reference/README.md:70-77); BENCH_SMALL's n=2048 run still
    # reports a meaningful ratio while the metric key stays stable.
    baseline_ntt_us = {1024: 7, 2048: 14, 4096: 30, 8192: 68, 16384: 142,
                       32768: 330}
    baseline_ntt_per_sec = 1e6 / baseline_ntt_us[n]
    print(
        json.dumps(
            {
                "metric": "ntt_fwd_transforms_per_sec",
                "value": round(ntt_per_sec, 1),
                "unit": "transforms/s",
                "vs_baseline": round(ntt_per_sec / baseline_ntt_per_sec, 2),
            }
        ),
        flush=True,
    )

    # ---- CKKS bootstrap at production shape (n=4096) -------------------------
    # FIRST among the extras (round-4 lesson: running it last left it only
    # 363 s of budget and the driver artifact got null four rounds running).
    # On by default (BENCH_BOOT=0 disables). Runs in a subprocess under a
    # hard timeout capped by the remaining bench budget: with the AOT
    # artifact + compile cache primed it takes ~2 min; on a cold cache the
    # subprocess is killed and the bench still completes with
    # boot_ms = null rather than blowing the driver's budget.
    boot_ms = None
    boot_err = None
    if os.environ.get("BENCH_BOOT", "0" if small else "1") == "1" \
            and _remaining() > 180:
        boot_n = int(os.environ.get("BENCH_BOOT_N", "4096"))
        budget = min(
            float(os.environ.get("BENCH_BOOT_TIMEOUT", "1500")),
            _remaining() - 120,
        )
        boot_ms, boot_err = _bootstrap_subprocess(boot_n, budget)
        if boot_ms is not None:
            _err(f"[bench] CKKS bootstrap n={boot_n}: {boot_ms:.1f} "
                 f"ms/refresh (device time, whole pipeline jitted; "
                 f"max err {boot_err:.2e})")

    # ---- CKKS bootstrap at the reference's flagship dimension (n=16384) ------
    # Runs ONLY when its AOT artifact is on disk (a cold trace at this size
    # is ~an hour of single-core Python — never inside the driver budget).
    # The Pallas NTT engages end-to-end at this dimension (ops/ntt.py).
    boot16_ms = boot16_err = None
    boot16_n = 16384
    art16 = os.path.join(
        _REPO, ".boot_cache", f"boot_n{boot16_n}_L28_d63_s3.pkl"
    )
    if os.environ.get("BENCH_BOOT_16K", "0" if small else "1") == "1" \
            and os.path.exists(art16) and _remaining() > 300:
        boot16_ms, boot16_err = _bootstrap_subprocess(
            boot16_n, _remaining() - 120
        )
        if boot16_ms is not None:
            _err(f"[bench] CKKS bootstrap n={boot16_n}: {boot16_ms:.1f} "
                 f"ms/refresh (device time; max err {boot16_err:.2e})")

    # ---- north-star ops at REFERENCE-EQUIVALENT depth ------------------------
    # The reference's create_params fills the whole per-dimension security
    # budget (438 bits at n=16384 -> L=13+1 here, basics.cpp:40-64); the
    # L=7 headline above leaves 198 bits unused. Measure mult+rotate at the
    # full budget too — the honest figure for a freshly-encrypted ct.
    t_mult_fd = t_rot_fd = None
    L_fd = 0
    if not small and _remaining() > 120:
        t_mult_fd, t_rot_fd, L_fd = bench_full_depth_ops(n, batch)
        _err(
            f"[bench] CKKS FULL-DEPTH mult+relin+rescale n={n} L={L_fd}: "
            f"{t_mult_fd*1e3/batch:.2f} ms/op ({batch/t_mult_fd:.1f}/s); "
            f"rotate {t_rot_fd*1e3/batch:.2f} ms/op ({batch/t_rot_fd:.1f}/s)"
        )

    # ---- TFHE bootstrapped gate throughput (batched blind rotation) ----------
    # BENCH_TFHE_BATCHES: comma-separated batch sizes to sweep; the
    # reported gates/s is the BEST batch (VERDICT r4 #5: find the
    # throughput knee — the blind rotation's monomial-table gathers and
    # the int8-MXU key switch should keep scaling past 64).
    gates_per_sec = None
    best_gate_batch = None
    # default = measured-best batch on v5e (updated from the r5 sweep run;
    # override with BENCH_TFHE_BATCHES=64,256,512,1024 to re-sweep)
    default_batches = "64"
    if _remaining() > 120:
        from hehub_tpu.models import tfhe

        # named presets with documented security estimates (models/tfhe.py):
        # the headline gate runs the ~128-bit set, small mode the toy set
        tparams = tfhe.PRESET_GATE_128 if not small else tfhe.TfheParams(
            rlwe_dimension=512, lwe_dimension=64
        )
        _err(
            f"[bench] TFHE preset security ≈ {tparams.security_bits():.0f} "
            f"bits (N={tparams.rlwe_dimension}, m={tparams.lwe_dimension}; "
            f"HEstd-anchored estimator, utils/security.py)"
        )
        tkeys = tfhe.keygen(tparams, jax.random.key(9))
        nand = tfhe.make_nand(tparams, tkeys)
        batches = [
            int(b) for b in os.environ.get(
                "BENCH_TFHE_BATCHES", default_batches
            ).split(",")
        ]
        for gate_batch in batches:
            if _remaining() < 60:
                _err("[bench] TFHE sweep truncated: budget exhausted")
                break
            bits = rng.integers(0, 2, (2, gate_batch)).astype(np.uint32)
            ct1 = tfhe.lwe_encrypt(
                tparams, tfhe.encode_bit(tparams, bits[0]), tkeys.lwe_s,
                jax.random.key(10),
            )
            ct2 = tfhe.lwe_encrypt(
                tparams, tfhe.encode_bit(tparams, bits[1]), tkeys.lwe_s,
                jax.random.key(11),
            )
            # keys + monomial tables enter as jit parameters (make_nand
            # docstring)
            out = nand(ct1, ct2)
            got = np.asarray(tfhe.lwe_decrypt_bit(tparams, out, tkeys.lwe_s))
            assert np.array_equal(got, 1 - (bits[0] & bits[1])), \
                "NAND incorrect"
            t_gate = _timeit(nand.fn, (ct1.a, ct1.b, ct2.a, ct2.b, nand.big),
                             iters=2)
            gps = gate_batch / t_gate
            _err(
                f"[bench] TFHE bootstrapped NAND "
                f"(N={tparams.rlwe_dimension}, m={tparams.lwe_dimension}): "
                f"{t_gate*1e3/gate_batch:.2f} ms/gate ({gps:.0f} gates/s "
                f"batched x{gate_batch})"
            )
            if gates_per_sec is None or gps > gates_per_sec:
                gates_per_sec = gps
                best_gate_batch = gate_batch
    else:
        _err("[bench] TFHE skipped: bench budget exhausted")

    extra = {
        "ckks_bootstrap_ms": boot_ms,
        "ckks_bootstrap_max_err": boot_err,
        "ckks_bootstrap_n": int(os.environ.get("BENCH_BOOT_N", "4096")),
        "ckks_bootstrap_16384_ms": boot16_ms,
        "ckks_bootstrap_16384_max_err": boot16_err,
        "tfhe_gates_per_sec": gates_per_sec,
        "tfhe_gate_batch": best_gate_batch,
        "ntt_fwd_us_per_transform": t_fwd * 1e6 / (batch * L),
        "intt_us_per_transform": t_inv * 1e6 / (batch * L),
        "intt_per_sec": intt_per_sec,
        "ckks_mult_relin_rescale_per_sec": mult_per_sec,
        "ckks_mult_ms_per_op": t_mult * 1e3 / batch,
        "ckks_mult_full_depth_ms_per_op": (
            t_mult_fd * 1e3 / batch if t_mult_fd else None
        ),
        "ckks_rotate_full_depth_ms_per_op": (
            t_rot_fd * 1e3 / batch if t_rot_fd else None
        ),
        "full_depth_limbs": L_fd,
        "ckks_rotate_per_sec": rotate_per_sec,
        "ckks_rotate_ms_per_op": t_rot * 1e3 / batch,
        "ckks_encode_encrypt_ms": t_ee * 1e3,
        "ckks_decrypt_decode_ms": t_dd * 1e3,
        "modmul_gops": rl_mm.gops_per_s,
        "n": n,
        "limbs": L,
        "batch": batch,
        "device": str(dev),
    }
    _err(f"[bench] extra: {json.dumps(extra)}")

    if os.environ.get("BENCH_TABLE") == "1":
        full_table()
    if os.environ.get("BENCH_GRID") == "1":
        rotation_grid()


if __name__ == "__main__":
    main()
