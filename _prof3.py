import time, numpy as np, jax
from hehub_tpu.core import rns
from hehub_tpu.core.context import create_ckks_params, make_context
from hehub_tpu.models import ckks
from hehub_tpu.rlwe import keys as keys_mod, rlwe as rlwe_mod

n, levels = 16384, 7
params = create_ckks_params(n, scaling_bits=28, num_levels=levels, use_security_budget=False)
ctx = make_context(params)
ids = tuple(range(len(params.moduli)))
L = len(ids)
qs = np.asarray(ctx.moduli_of(ids), np.uint32)[:, None]
rng = np.random.default_rng(3)
sk = rlwe_mod.keygen(ctx, jax.random.key(0))
rlk = keys_mod.relin_key(ctx, sk, jax.random.key(1))
rlk_host = type(rlk)(np.asarray(rlk.data), rlk.limb_ids)
scale = params.initial_scaling_factor
mk = lambda d: rns.RnsPoly(d, rns.NTT, ids)

def mult_step(c0a, c1a, c0b, c1b):
    out = ckks.rescale(ctx, ckks.mult(
        ctx,
        ckks.CkksCt(mk(c0a), mk(c1a), scale),
        ckks.CkksCt(mk(c0b), mk(c1b), scale),
        type(rlk_host)(rlk_host.data, rlk_host.limb_ids)))
    return out.c0.data, out.c1.data

mult_jit = jax.jit(mult_step)

for batch in (4, 16, 64):
    cts = tuple(jax.device_put(
        rng.integers(0, 1 << 31, (batch, L, n)).astype(np.uint32) % (2*qs))
        for _ in range(4))
    out = mult_jit(*cts); jax.block_until_ready(out)
    t0 = time.perf_counter()
    iters = 6
    for _ in range(iters): out = mult_jit(*cts)
    jax.block_until_ready(out)
    dt = (time.perf_counter()-t0)/iters
    print(f"[p3] batch={batch}: {dt*1e3:.2f} ms/call, {dt*1e3/batch:.3f} ms/op, {batch/dt:.0f} ops/s", flush=True)
