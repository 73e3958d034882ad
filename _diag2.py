"""TEMPORARY diag #2 (n=4096 factored bootstrap, TPU):
1. constructs with the MERGED single-pass discovery (validates restructure)
2. saves + loads the AOT artifact, checks bitwise agreement, times stages
3. permutation-insensitive C2S error: sorted fractional parts of the slots
   must match the sorted fractional parts of the raised poly's coefficients
4. swaps in ZERO-NOISE keys (same compiled programs — keys are parameters)
   to split the 2e-2 into key-switch noise vs approximation/quantization.
Deleted after the investigation."""

import os
import time

import numpy as np
import jax

import bench

bench._enable_compile_cache()

from hehub_tpu.circuits import boot_artifact
from hehub_tpu.circuits import bootstrap as bs
from hehub_tpu.core import rns
from hehub_tpu.core.context import make_context
from hehub_tpu.models import ckks
from hehub_tpu.rlwe import keys as keys_mod
from hehub_tpu.rlwe import rlwe as rlwe_mod

n = 4096
half = n // 2
params = bs.make_boot_params(n, num_levels=28, num_special=2)
ctx = make_context(params)
sk = rlwe_mod.keygen(ctx, jax.random.key(0), hamming_weight=8)
rlk = keys_mod.relin_key(ctx, sk, jax.random.key(1))
lt_stages = 3
steps = bs.bootstrap_rotation_steps(params, lt_stages)
t0 = time.perf_counter()
rot_keys = {st: keys_mod.rot_key(ctx, sk, st, jax.random.key(100 + st))
            for st in steps}
ck = keys_mod.conj_key(ctx, sk, jax.random.key(5))
print(f"keygen {time.perf_counter()-t0:.0f}s", flush=True)

rng = np.random.default_rng(3)
v = rng.uniform(-1, 1, half)
d_in = 2.0**26
pt = ckks.encode(v, params, scaling_factor=d_in,
                 level=len(params.moduli) - 1)
ct = ckks.encrypt(ctx, pt, sk, jax.random.key(7))
booter = bs.Bootstrapper(ctx, params, rlk, rot_keys, ck, k_bound=5,
                         degree=63, arcsine=True, lt_stages=lt_stages)
t0 = time.perf_counter()
refresh = bs.CompiledBootstrapper(booter, ct, split=True)
print(f"construct {time.perf_counter()-t0:.0f}s  timings={refresh.timings}",
      flush=True)

t0 = time.perf_counter()
out1 = refresh(ct)
jax.block_until_ready(out1.c0.data)
print(f"trace+compile+run {time.perf_counter()-t0:.0f}s", flush=True)
got = np.real(ckks.decode(ckks.decrypt(ctx, out1, sk), params))
print(f"normal-keys total err: {np.abs(got - v).max():.3e}", flush=True)

# ---- artifact round trip ----------------------------------------------------
os.makedirs(".boot_cache", exist_ok=True)
path = ".boot_cache/boot_n4096_L28_d63.pkl"
t0 = time.perf_counter()
boot_artifact.save(refresh, path)
print(f"artifact save+prime {time.perf_counter()-t0:.0f}s "
      f"({os.path.getsize(path)/1e6:.0f} MB)", flush=True)
t0 = time.perf_counter()
loaded = boot_artifact.load(path)
print(f"artifact load {time.perf_counter()-t0:.0f}s", flush=True)
t0 = time.perf_counter()
out2 = loaded(ct)
bit_eq = np.array_equal(np.asarray(out1.c0.data), np.asarray(out2.c0.data))
print(f"artifact first run {time.perf_counter()-t0:.0f}s; "
      f"bitwise-equal={bit_eq}", flush=True)

# ---- permutation-insensitive C2S check -------------------------------------
q0 = int(ctx.mod_list[ct.c0.limb_ids[0]])


def _coef(data, ids):
    return np.asarray(
        jax.jit(lambda d: rns.to_coeff(ctx, rns.RnsPoly(d, rns.NTT, ids)).data)(data)
    )[0].astype(np.int64)


s_signed = sk.coeffs.astype(np.int64)


def true_fracs(some_ct):
    c0c = _coef(some_ct.c0.data, some_ct.c0.limb_ids) % q0
    c1c = _coef(some_ct.c1.data, some_ct.c1.limb_ids) % q0
    t_int = c0c.copy()
    for k in np.nonzero(s_signed)[0]:
        cv = int(s_signed[k])
        rolled = np.concatenate([-c1c[n - k:], c1c[: n - k]])
        t_int += cv * rolled
    f = (t_int % q0).astype(np.float64) / q0
    return np.where(f > 0.5, f - 1.0, f)


frac_true = true_fracs(ct)

kd, pp = refresh._key_data, refresh._plan_pts
a = refresh._fn_a(ct.c0.data, ct.c1.data, kd, pp)
(re_key, im_key) = refresh._meta["a"]


def dec(c0d, c1d, ids, scale):
    cc = ckks.CkksCt(rns.RnsPoly(c0d, rns.NTT, ids),
                     rns.RnsPoly(c1d, rns.NTT, ids), scale)
    return ckks.decode(ckks.decrypt(ctx, cc, sk), params)


def frac_err(a_tuple, tag, truth):
    z_re = np.real(dec(a_tuple[0], a_tuple[1], re_key[0], re_key[1]))
    z_im = np.real(dec(a_tuple[2], a_tuple[3], im_key[0], im_key[1]))
    zf = np.concatenate([z_re, z_im])
    zf = zf - np.round(zf)
    err = np.abs(np.sort(zf) - np.sort(truth)).max()
    print(f"{tag} C2S sorted-frac err: {err:.3e}", flush=True)


frac_err(a, "normal", frac_true)

# ---- zero-noise keys through the SAME compiled programs ---------------------
t0 = time.perf_counter()
rlk0 = keys_mod.relin_key(ctx, sk, jax.random.key(1), debug_zero_e=True)
rot0 = {st: keys_mod.rot_key(ctx, sk, st, jax.random.key(100 + st),
                             debug_zero_e=True) for st in steps}
ck0 = keys_mod.conj_key(ctx, sk, jax.random.key(5), debug_zero_e=True)
kd0 = {"rlk": rlk0.data, "conj": ck0.data,
       "rot": {st: rk.data for st, rk in rot0.items()}}
pt0 = ckks.encode(v, params, scaling_factor=d_in,
                  level=len(params.moduli) - 1)
ct0 = ckks.encrypt(ctx, pt0, sk, jax.random.key(7), debug_zero_e=True,
                   debug_zero_c1=True)
print(f"zero-noise keygen {time.perf_counter()-t0:.0f}s", flush=True)

a0 = refresh._fn_a(ct0.c0.data, ct0.c1.data, kd0, pp)
frac_err(a0, "zero-noise", true_fracs(ct0))
wre0 = refresh._fn_b[re_key](a0[0], a0[1], kd0, pp)
wim0 = refresh._fn_b[im_key](a0[2], a0[3], kd0, pp)
o0 = refresh._fn_c(wre0[0], wre0[1], wim0[0], wim0[1], kd0, pp)
ids_o, scale_o = refresh._out_meta
got0 = np.real(dec(o0[0], o0[1], tuple(ids_o), scale_o))
print(f"zero-noise total err: {np.abs(got0 - v).max():.3e}", flush=True)
