"""TEMPORARY diagnostic: per-stage error decomposition of the n=4096
factored-chain bootstrap (bench recipe measured 2e-2 end-to-end on TPU;
the n=1024 dense-path CI test reaches 3e-6). Reuses bench_bootstrap's
exact seeds/construction so the warm compile cache replays.

Per stage, compares the decrypted output against truth computed from the
PREVIOUS stage's measured values, isolating which stage injects the error.
Deleted after the investigation.
"""

import time

import numpy as np
import jax

import bench

bench._enable_compile_cache()

from hehub_tpu.circuits import bootstrap as bs
from hehub_tpu.core import rns
from hehub_tpu.core.context import make_context
from hehub_tpu.models import ckks
from hehub_tpu.models.ckks import _slots_to_read
from hehub_tpu.rlwe import keys as keys_mod
from hehub_tpu.rlwe import rlwe as rlwe_mod

n = 4096
num_levels = 28
degree = 63
half = n // 2

params = bs.make_boot_params(n, num_levels=num_levels, num_special=2)
ctx = make_context(params)
sk = rlwe_mod.keygen(ctx, jax.random.key(0), hamming_weight=8)
rlk = keys_mod.relin_key(ctx, sk, jax.random.key(1))
lt_stages = 3
t0 = time.perf_counter()
rot_keys = {
    st: keys_mod.rot_key(ctx, sk, st, jax.random.key(100 + st))
    for st in bs.bootstrap_rotation_steps(params, lt_stages)
}
ck = keys_mod.conj_key(ctx, sk, jax.random.key(5))
print(f"keygen {time.perf_counter()-t0:.0f}s", flush=True)
rng = np.random.default_rng(3)
v = rng.uniform(-1, 1, half)
d_in = 2.0**26
pt = ckks.encode(v, params, scaling_factor=d_in,
                 level=len(params.moduli) - 1)
ct = ckks.encrypt(ctx, pt, sk, jax.random.key(7))
booter = bs.Bootstrapper(ctx, params, rlk, rot_keys, ck, k_bound=5,
                         degree=degree, arcsine=True, lt_stages=lt_stages)
t0 = time.perf_counter()
refresh = bs.CompiledBootstrapper(booter, ct, split=True)
print(f"construct {time.perf_counter()-t0:.0f}s  timings={refresh.timings}",
      flush=True)

# run once (compiles from warm cache), then save the AOT artifact
out_probe = refresh(ct)
jax.block_until_ready(out_probe.c0.data)
try:
    import os

    from hehub_tpu.circuits import boot_artifact

    os.makedirs(".boot_cache", exist_ok=True)
    t0 = time.perf_counter()
    boot_artifact.save(refresh, ".boot_cache/boot_n4096_L28_d63.pkl")
    print(f"artifact saved+primed {time.perf_counter()-t0:.0f}s", flush=True)
except Exception as e:
    import traceback

    traceback.print_exc()
    print(f"artifact save FAILED: {e}", flush=True)

# ---- exact host value of the raised ciphertext -----------------------------
# t' = c0 + c1*s over Z (negacyclic), |t'| <= ~(h+1)/2 * q0: this is the
# EXACT integer the mod-raised ciphertext encrypts.
q0 = int(ctx.mod_list[ct.c0.limb_ids[0]])
def _coef(data, ids):
    return np.asarray(
        jax.jit(
            lambda d: rns.to_coeff(ctx, rns.RnsPoly(d, rns.NTT, ids)).data
        )(data)
    )[0].astype(np.int64)


c0_coef = _coef(ct.c0.data, ct.c0.limb_ids) % q0
c1_coef = _coef(ct.c1.data, ct.c1.limb_ids) % q0
s_signed = sk.coeffs.astype(np.int64)  # host ternary, already signed
# negacyclic convolution c1*s via O(h n) shifts (h nonzeros)
t_int = c0_coef.copy()
nz = np.nonzero(s_signed)[0]
for k in nz:
    cv = int(s_signed[k])
    rolled = np.concatenate([-c1_coef[n - k:], c1_coef[: n - k]])
    t_int += cv * rolled
print(f"|t|/q0 max {np.abs(t_int).max()/q0:.3f} (h nonzeros={len(nz)})",
      flush=True)

# slots of t'/q0 (the raised ct's slot values)
s_t = _slots_to_read(t_int.astype(np.float64), n, half) / q0

c2s_r, c2s_im, s2c_r, s2c_im = bs._merged_chain_matrices(n, lt_stages)


def chain_apply(mats, vec):
    for M in mats:
        vec = M @ vec
    return vec


u_re = chain_apply(c2s_r, s_t)
u_im = chain_apply(c2s_im, s_t)
z_re_true = u_re + np.conj(u_re)
z_im_true = u_im + np.conj(u_im)

# ---- run stages, decrypting between ----------------------------------------
kd, pp = refresh._key_data, refresh._plan_pts
a = refresh._fn_a(ct.c0.data, ct.c1.data, kd, pp)
(re_key, im_key) = refresh._meta["a"]


def dec(c0d, c1d, ids, scale, count=half):
    cc = ckks.CkksCt(rns.RnsPoly(c0d, rns.NTT, ids),
                     rns.RnsPoly(c1d, rns.NTT, ids), scale)
    return ckks.decode(ckks.decrypt(ctx, cc, sk), params, count=count)


z_re = dec(a[0], a[1], re_key[0], re_key[1])
z_im = dec(a[2], a[3], im_key[0], im_key[1])
errA_re = np.abs(z_re - z_re_true).max()
errA_im = np.abs(z_im - z_im_true).max()
print(f"stage A (C2S): err_re {errA_re:.3e}  err_im {errA_im:.3e}  "
      f"|z| max {np.abs(z_re_true).max():.3f}", flush=True)

wre = refresh._fn_b[re_key](a[0], a[1], kd, pp)
wim = refresh._fn_b[im_key](a[2], a[3], kd, pp)
bre_ids, bre_scale = refresh._meta[("b",) + re_key]
bim_ids, bim_scale = refresh._meta[("b",) + im_key]
w_re = dec(wre[0], wre[1], bre_ids, bre_scale)
w_im = dec(wim[0], wim[1], bim_ids, bim_scale)
w_re_true = z_re - np.round(np.real(z_re))  # frac of the MEASURED z
w_im_true = z_im - np.round(np.real(z_im))
errB_re = np.abs(w_re - w_re_true).max()
errB_im = np.abs(w_im - w_im_true).max()
print(f"stage B (EvalMod vs frac(z_meas)): err_re {errB_re:.3e}  "
      f"err_im {errB_im:.3e}", flush=True)

out = refresh._fn_c(wre[0], wre[1], wim[0], wim[1], kd, pp)
out_ids, out_scale = refresh._out_meta
final = dec(out[0], out[1], out_ids, out_scale)

# S2C truth from the MEASURED w halves
coeffs_true = chain_apply(s2c_r, w_re) + chain_apply(s2c_im, w_im)
# those are the output COEFFS at value-scale 1 (values ~ t/q0); the final
# decode reads slots at Delta_out = Delta_w * d_in / q0, i.e. the final
# slot values are slots(coeffs)*(q0/d_in)
final_true = _slots_to_read(
    np.concatenate([np.real(coeffs_true), np.imag(coeffs_true)]), n, half
) * (q0 / d_in)
errC_iso = np.abs(final - final_true).max()
errC_tot = np.abs(np.real(final) - v).max()
print(f"stage C (S2C vs numpy on w_meas): err {errC_iso:.3e}", flush=True)
print(f"TOTAL refresh err: {errC_tot:.3e}", flush=True)
# upstream contributions pushed through the ideal downstream pipeline
w_true_of_true_z = z_re_true - np.round(np.real(z_re_true))
w_im_true_of_true = z_im_true - np.round(np.real(z_im_true))
coeffs_ideal = chain_apply(s2c_r, w_true_of_true_z) + chain_apply(
    s2c_im, w_im_true_of_true)
final_ideal = _slots_to_read(
    np.concatenate([np.real(coeffs_ideal), np.imag(coeffs_ideal)]), n, half
) * (q0 / d_in)
print(f"ideal-pipeline residual vs v (math-only): "
      f"{np.abs(np.real(final_ideal) - v).max():.3e}", flush=True)
