"""Multi-device sharding: genuine 8-device execution on the forced CPU mesh
(SURVEY.md §4 — the JAX equivalent of multi-node tests without a cluster).

Checks that (batch, limb)-sharded execution is bitwise identical to
single-device execution for the NTT and for the full CKKS
mult+relin+rescale step, i.e. the collectives GSPMD inserts for the
external product's cross-limb digit broadcast do not change the math."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from hehub_tpu.core import rns
from hehub_tpu.core.context import create_ckks_params, make_context
from hehub_tpu.models import ckks
from hehub_tpu.ops import ntt as nttmod
from hehub_tpu.parallel import mesh as pmesh
from hehub_tpu.rlwe import keys as keys_mod
from hehub_tpu.rlwe import rlwe as rlwe_mod


@pytest.fixture(scope="module")
def setup():
    params = create_ckks_params(256, scaling_bits=28, num_levels=4,
                                use_security_budget=False)
    ctx = make_context(params)
    sk = rlwe_mod.keygen(ctx, jax.random.key(0))
    rlk = keys_mod.relin_key(ctx, sk, jax.random.key(1))
    rlk = type(rlk)(np.asarray(rlk.data), rlk.limb_ids)
    return params, ctx, sk, rlk


def _mult_step(ctx, ids, scale, rlk):
    def step(c0a, c1a, c0b, c1b):
        mk = lambda d: rns.RnsPoly(d, rns.NTT, ids)
        ca = ckks.CkksCt(mk(c0a), mk(c1a), scale)
        cb = ckks.CkksCt(mk(c0b), mk(c1b), scale)
        out = ckks.rescale(ctx, ckks.mult(ctx, ca, cb, rlk))
        return out.c0.data, out.c1.data
    return step


def test_mesh_helpers():
    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"
    mesh = pmesh.make_mesh(4, 2)
    assert mesh.devices.shape == (4, 2)
    assert pmesh.ct_pspec(1, True) == P(pmesh.BATCH_AXIS, pmesh.LIMB_AXIS, None)
    with pytest.raises(ValueError):
        pmesh.make_mesh(8, 2)


@pytest.mark.parametrize("batch_ways,limb_ways", [(8, 1), (4, 2), (2, 4)])
def test_sharded_mult_matches_single_device(setup, batch_ways, limb_ways):
    params, ctx, sk, rlk = setup
    ids = tuple(range(len(params.moduli)))
    scale = params.initial_scaling_factor
    n, L = params.dimension, len(ids)
    batch = 2 * batch_ways
    rng = np.random.default_rng(42)
    qs = np.asarray(ctx.moduli_of(ids), np.uint32)[:, None]
    host_args = [
        rng.integers(0, 1 << 31, (batch, L, n)).astype(np.uint32) % (2 * qs)
        for _ in range(4)
    ]

    step = _mult_step(ctx, ids, scale, rlk)
    want = jax.jit(step)(*host_args)

    mesh = pmesh.make_mesh(batch_ways, limb_ways)
    shard = NamedSharding(mesh, P(pmesh.BATCH_AXIS, pmesh.LIMB_AXIS, None))
    dev_args = [jax.device_put(a, shard) for a in host_args]
    got = jax.jit(step, in_shardings=(shard,) * 4)(*dev_args)

    np.testing.assert_array_equal(np.asarray(want[0]), np.asarray(got[0]))
    np.testing.assert_array_equal(np.asarray(want[1]), np.asarray(got[1]))


def test_limb_sharded_ntt_roundtrip(setup):
    params, ctx, _, _ = setup
    ids = tuple(range(len(params.moduli)))
    n, L = params.dimension, len(ids)
    rng = np.random.default_rng(7)
    qs = np.asarray(ctx.moduli_of(ids), np.uint32)[:, None]
    x = rng.integers(0, 1 << 31, (8, L, n)).astype(np.uint32) % (2 * qs)

    mesh = pmesh.make_mesh(2, 4)
    shard = NamedSharding(mesh, P(pmesh.BATCH_AXIS, pmesh.LIMB_AXIS, None))
    xd = jax.device_put(x, shard)

    fwd = jax.jit(lambda v: nttmod.ntt(ctx, v, ids))
    inv = jax.jit(lambda v: nttmod.intt(ctx, v, ids))
    got = np.asarray(inv(fwd(xd)))
    want = np.asarray(inv(fwd(x)))
    np.testing.assert_array_equal(got, want)


def test_batch_sharded_keygen_independent(setup):
    """Sharded inputs do not perturb key material: decrypt a sharded
    encrypt-mult round trip."""
    params, ctx, sk, rlk = setup
    slots = params.dimension // 2
    rng = np.random.default_rng(3)
    vals = rng.uniform(-1, 1, slots)
    pt = ckks.encode(vals, params)
    ct = ckks.encrypt(ctx, pt, sk, jax.random.key(5))

    mesh = pmesh.make_mesh(1, 4)
    shard = NamedSharding(mesh, P(None, pmesh.LIMB_AXIS, None))
    c0 = jax.device_put(ct.c0.data[None], shard)[0]
    c1 = jax.device_put(ct.c1.data[None], shard)[0]
    ct_sharded = ckks.CkksCt(
        ct.c0.with_data(c0), ct.c1.with_data(c1), ct.scaling_factor
    )
    prod = ckks.rescale(ctx, ckks.mult(ctx, ct_sharded, ct_sharded, rlk))
    got = ckks.decode(ckks.decrypt(ctx, prod, sk), params)
    np.testing.assert_allclose(np.real(got), vals * vals, atol=2e-4)


@pytest.mark.parametrize("D", [2, 4, 8])
def test_intra_transform_sharded_ntt(D):
    """One polynomial's butterflies spread across D devices (ppermute
    cross-stages + local stages) == the single-device kernel, bitwise."""
    from hehub_tpu.core.context import RlweParams
    from hehub_tpu.parallel import ntt_sharded
    from hehub_tpu.utils import hostmath as hm

    n = 2048
    primes = hm.gen_ntt_primes(30, 2, n)
    ctx = make_context(RlweParams(dimension=n, moduli=tuple(primes)))
    ids = (0, 1)
    qs = np.asarray(ctx.moduli_of(ids), np.uint32)[:, None]
    rng = np.random.default_rng(D)
    x = rng.integers(0, 1 << 31, (2, 2, n)).astype(np.uint32) % (2 * qs)
    mesh = jax.sharding.Mesh(np.asarray(jax.devices()[:D]), ("seq",))
    shard = NamedSharding(mesh, P(None, None, "seq"))
    xd = jax.device_put(x, shard)
    fwd = jax.jit(ntt_sharded.make_sharded_ntt(ctx, ids, mesh, "seq"))
    inv = jax.jit(ntt_sharded.make_sharded_ntt(ctx, ids, mesh, "seq",
                                               inverse=True))
    got_f = np.asarray(fwd(xd))
    ref_f = np.asarray(nttmod.ntt(ctx, x, ids))
    np.testing.assert_array_equal(got_f, ref_f)
    got_i = np.asarray(inv(jax.device_put(got_f, shard)))
    ref_i = np.asarray(nttmod.intt(ctx, ref_f, ids))
    np.testing.assert_array_equal(got_i, ref_i)


def test_pipeline_parallel_squaring_chain():
    """Pipeline-parallel analog (SURVEY §2.6 row 4): a depth-3 squaring
    chain staged across 3 devices, GPipe-scheduled over 5 microbatches,
    bitwise-equal to the sequential single-device chain."""
    import jax

    from hehub_tpu.models import ckks
    from hehub_tpu.parallel.pipeline import PipelinedSquaringChain
    from hehub_tpu.rlwe import keys as keys_mod
    from hehub_tpu.rlwe import rlwe as rlwe_mod

    params = create_ckks_params(256, scaling_bits=28, num_levels=4,
                                use_security_budget=False)
    ctx = make_context(params)
    sk = rlwe_mod.keygen(ctx, jax.random.key(0))
    rlk = keys_mod.relin_key(ctx, sk, jax.random.key(1))
    rng = np.random.default_rng(9)
    top = len(params.moduli)
    depth = 3
    cts = []
    for m in range(5):
        v = rng.uniform(-1, 1, params.dimension // 2) * 0.9
        cts.append(ckks.encrypt(ctx, ckks.encode(v, params), sk,
                                jax.random.key(50 + m)))

    pipe = PipelinedSquaringChain(ctx, rlk, depth, top,
                                  devices=jax.devices()[:depth])
    outs = pipe.run(cts)

    rlk_host = type(rlk)(np.asarray(rlk.data), rlk.limb_ids, rlk.alpha)
    for m, ct in enumerate(cts):
        seq = ct
        for _ in range(depth):
            seq = ckks.rescale(ctx, ckks.mult(ctx, seq, seq, rlk_host))
        np.testing.assert_array_equal(
            np.asarray(outs[m].c0.data), np.asarray(seq.c0.data))
        np.testing.assert_array_equal(
            np.asarray(outs[m].c1.data), np.asarray(seq.c1.data))
        assert abs(outs[m].scaling_factor - seq.scaling_factor) < 1e-3


def test_pipeline_parallel_heterogeneous_stages():
    """VERDICT r2 item 8: the generalized Pipeline takes arbitrary per-stage
    functions. A 3-stage mixed circuit (square -> rotate -> mult_plain+
    rescale) across 3 devices is bitwise-equal to the sequential chain."""
    import jax

    from hehub_tpu.models import ckks
    from hehub_tpu.parallel.pipeline import Pipeline
    from hehub_tpu.rlwe import keys as keys_mod
    from hehub_tpu.rlwe import rlwe as rlwe_mod

    params = create_ckks_params(256, scaling_bits=28, num_levels=4,
                                use_security_budget=False)
    ctx = make_context(params)
    sk = rlwe_mod.keygen(ctx, jax.random.key(0))
    rlk = keys_mod.relin_key(ctx, sk, jax.random.key(1))
    rk = keys_mod.rot_key(ctx, sk, 3, jax.random.key(2))
    rlk_h = type(rlk)(np.asarray(rlk.data), rlk.limb_ids, rlk.alpha)
    rk_h = type(rk)(np.asarray(rk.data), rk.limb_ids, rk.alpha)
    half = np.full(params.dimension // 2, 0.5)

    def sq(c, ct):
        return ckks.rescale(c, ckks.mult(c, ct, ct, rlk_h))

    def rot(c, ct):
        return ckks.rotate(c, ct, rk_h, 3)

    def halve(c, ct):
        pt = ckks.encode(half, c.params, level=len(c.params.moduli)
                         - ct.c0.limb_count)
        return ckks.rescale(c, ckks.mult_plain(c, ct, pt))

    stages = [sq, rot, halve]
    rng = np.random.default_rng(9)
    cts = [
        ckks.encrypt(ctx, ckks.encode(
            rng.uniform(-1, 1, params.dimension // 2) * 0.9, params),
            sk, jax.random.key(60 + m))
        for m in range(4)
    ]
    outs = Pipeline(ctx, stages, devices=jax.devices()[:3]).run(cts)
    for m, ct in enumerate(cts):
        seq = ct
        for fn in stages:
            seq = fn(ctx, seq)
        np.testing.assert_array_equal(
            np.asarray(outs[m].c0.data), np.asarray(seq.c0.data))
        np.testing.assert_array_equal(
            np.asarray(outs[m].c1.data), np.asarray(seq.c1.data))
        assert abs(outs[m].scaling_factor - seq.scaling_factor) < 1e-3


@pytest.mark.skipif(os.environ.get("HEHUB_SLOW") != "1",
                    reason="two full-refresh compiles take ~0.5h on CPU; "
                           "HEHUB_SLOW=1")
def test_batch_sharded_bootstrap():
    """The flagship circuit under data parallelism: a batch of 8 CKKS
    refreshes sharded over the 8-device mesh is BITWISE equal to the same
    compiled program on one device. The bootstrap is batch-local (Galois
    gathers act on the slot axis, keys are replicated), so GSPMD needs no
    collectives — this checks the whole pipeline (mod-raise, BSGS linear
    transforms, Chebyshev EvalMod) really is embarrassingly parallel over
    the batch axis (SURVEY §2.6 rows 1/5; ckks_boot.h is empty upstream)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from hehub_tpu.circuits import bootstrap as bs
    from hehub_tpu.models import ckks
    from hehub_tpu.rlwe import keys as keys_mod
    from hehub_tpu.rlwe import rlwe as rlwe_mod

    n, batch = 128, 8
    params = bs.make_boot_params(n, num_levels=16, two_limb_scale=False)
    ctx = make_context(params)
    sk = rlwe_mod.keygen(ctx, jax.random.key(0), hamming_weight=8)
    rlk = keys_mod.relin_key(ctx, sk, jax.random.key(1))
    rot_keys = {st: keys_mod.rot_key(ctx, sk, st, jax.random.key(100 + st))
                for st in bs.bootstrap_rotation_steps(params)}
    ck = keys_mod.conj_key(ctx, sk, jax.random.key(5))
    rng = np.random.default_rng(3)
    v = rng.uniform(-1, 1, (batch, n // 2))
    pt = ckks.encode(v, params, scaling_factor=2.0**22,
                     level=len(params.moduli) - 1)
    ct = ckks.encrypt(ctx, pt, sk, jax.random.key(7))

    # degree 63 covers the 11 sine periods of k_bound=5 (degree 31 is
    # enough only for the bitwise-equality half of this test, not decode)
    booter = bs.Bootstrapper(ctx, params, rlk, rot_keys, ck, k_bound=5,
                             degree=63)
    compiled = bs.CompiledBootstrapper(booter, ct)
    ref = compiled(ct)

    mesh = pmesh.make_mesh(batch, 1)
    sh = NamedSharding(mesh, P(pmesh.BATCH_AXIS, None, None))
    ct_sh = ckks.CkksCt(
        rns.RnsPoly(jax.device_put(ct.c0.data, sh), rns.NTT, ct.c0.limb_ids),
        rns.RnsPoly(jax.device_put(ct.c1.data, sh), rns.NTT, ct.c1.limb_ids),
        ct.scaling_factor,
    )
    out = compiled(ct_sh)
    assert len(out.c0.data.sharding.device_set) == batch
    np.testing.assert_array_equal(np.asarray(out.c0.data),
                                  np.asarray(ref.c0.data))
    np.testing.assert_array_equal(np.asarray(out.c1.data),
                                  np.asarray(ref.c1.data))
    got = np.real(ckks.decode(ckks.decrypt(ctx, out, sk), params))
    assert np.abs(got - v).max() < 5e-2
