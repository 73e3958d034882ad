import jax, numpy as np, jax.numpy as jnp
from hehub_tpu.core.context import create_ckks_params, make_context
from hehub_tpu.ops import ntt as nttmod
from hehub_tpu.ops.pallas import ntt_pallas as nk
from hehub_tpu.utils import profiling

for n, levels, batch in ((16384, 7, 64), (32768, 4, 16)):
    params = create_ckks_params(n, scaling_bits=28, num_levels=levels-1, use_security_budget=False)
    ctx = make_context(params)
    ids = tuple(range(levels)); L = len(ids)
    qs = np.asarray(ctx.moduli_of(ids), np.uint32)[:, None]
    rng = np.random.default_rng(3)
    data = jax.device_put(rng.integers(0, 1 << 31, (batch, L, n)).astype(np.uint32) % (2*qs))
    fwd = jax.jit(nk.get_ntt(ctx, ids, inverse=False))
    inv = jax.jit(nk.get_ntt(ctx, ids, inverse=True))
    # XLA stage-chain oracle
    f_ref = jax.jit(lambda x: nttmod.ntt_fwd(x, ctx.rows("tw_fwd", ids), ctx.rows("tw_fwd_sh", ids), ctx.rows("q", ids), ctx.rows("two_q", ids)))
    i_ref = jax.jit(lambda x: nttmod.ntt_inv(x, ctx.rows("tw_inv", ids), ctx.rows("tw_inv_sh", ids), ctx.rows("q", ids), ctx.rows("two_q", ids), ctx.rows("tw_inv_last", ids), ctx.rows("tw_inv_last_sh", ids), ctx.rows("n_inv", ids), ctx.rows("n_inv_sh", ids)))
    of, orf = np.asarray(fwd(data)), np.asarray(f_ref(data))
    oi, ori = np.asarray(inv(data)), np.asarray(i_ref(data))
    print(f"n={n}: fwd eq={np.array_equal(of % qs, orf % qs)} bitwise={np.array_equal(of, orf)}; inv eq={np.array_equal(oi % qs, ori % qs)}")
    # round trip
    rt = np.asarray(inv(fwd(data)))
    print(f"n={n}: roundtrip eq={np.array_equal(rt % qs, np.asarray(data) % qs)}; lazy_ok fwd={of.max() < 2*qs.max()} inv={oi.max() < 2*qs.max()}")
    k = batch * L
    tf = profiling.device_time(fwd, (data,), iters=8, name="")
    ti = profiling.device_time(inv, (data,), iters=8, name="")
    print(f"n={n}: fwd {tf*1e6/k:.2f} us/tf, inv {ti*1e6/k:.2f} us/tf")
