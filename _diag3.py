"""TEMPORARY diag #3: decisive A/B on the n=4096 s3 artifact.
The P 2^60->2^90 bump did NOT move the 2.02e-2 error, so the dominant
term is not KSK e-noise/P. Disentangle the r4 zero-noise confound (it
zeroed key noise AND trivialized the input ct):
  A: normal keys, normal ct        -> expect 2.02e-2 (sanity)
  B: zero-e keys,  normal ct       -> key-noise contribution
  C: normal keys,  zero-c1/e ct    -> input-interaction contribution
Uses the artifact's compiled programs; keys swap as flat leaves."""

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
params = bs.make_boot_params(n, num_levels=28, num_special=3)
ctx = make_context(params)
sk = rlwe_mod.keygen(ctx, jax.random.key(0), hamming_weight=8)
steps = bs.bootstrap_rotation_steps(params, 3)

t0 = time.perf_counter()
loaded = boot_artifact.load(".boot_cache/boot_n4096_L28_d63_s3.pkl")
print(f"load {time.perf_counter()-t0:.0f}s", flush=True)

rng = np.random.default_rng(3)
v = rng.uniform(-1, 1, half)
d_in = 2.0**26
pt = ckks.encode(v, params, scaling_factor=d_in,
                 level=len(params.moduli) - 1)
ct = ckks.encrypt(ctx, pt, sk, jax.random.key(7))
ct0 = ckks.encrypt(ctx, pt, sk, jax.random.key(7), debug_zero_e=True,
                   debug_zero_c1=True)


def run(tag, some_ct):
    t1 = time.perf_counter()
    out = loaded(some_ct)
    got = np.real(ckks.decode(ckks.decrypt(ctx, out, sk), params))
    print(f"{tag}: err {np.abs(got - v).max():.3e} "
          f"({time.perf_counter()-t1:.0f}s)", flush=True)


run("A normal keys + normal ct ", ct)

t0 = time.perf_counter()
rlk0 = keys_mod.relin_key(ctx, sk, jax.random.key(1), debug_zero_e=True)
rot0 = {st: keys_mod.rot_key(ctx, sk, st, jax.random.key(100 + st),
                             debug_zero_e=True) for st in steps}
ck0 = keys_mod.conj_key(ctx, sk, jax.random.key(5), debug_zero_e=True)
kd0 = {"rlk": rlk0.data, "conj": ck0.data,
       "rot": {st: rk.data for st, rk in rot0.items()}}
print(f"zero-noise keygen {time.perf_counter()-t0:.0f}s", flush=True)

# swap key leaves in the loaded artifact (plan pts unchanged)
import jax as _jax

normal_leaves = list(loaded._leaves)
kd0_dev = _jax.device_put(kd0)
zleaves, ztd = _jax.tree.flatten((kd0_dev, loaded._plan_pts))
loaded._leaves = zleaves
run("B zero-e keys  + normal ct ", ct)

loaded._leaves = normal_leaves
run("C normal keys  + zero ct   ", ct0)
