"""AOT bootstrap artifacts: ship a traced bootstrap, not a tracing step.

A `CompiledBootstrapper(split=True)` holds four stage programs (C2S,
EvalMod x2, S2C) plus their weights (rotation/relin/conj keys, linear-
transform plan plaintexts) and inter-stage metadata. Constructing one
traces the refresh circuit three times (discovery `eval_shape`, per-stage
`eval_shape`, `jit`) — ~13 minutes of single-core Python at n=4096 —
even when the XLA persistent compile cache is warm, because tracing is a
per-process cost the compile cache cannot absorb.

This module serializes the whole thing to disk with `jax.export`
(StableHLO for the programs, numpy for the weights, a small header for
the metadata), so a later process — a serving deployment, or the driver's
benchmark run — goes straight to compile-from-cache + execute. This is
the TPU-native analog of shipping a compiled model artifact; the
reference has no counterpart (its bootstrap is the empty
/root/reference/src/circuits/ckks_boot.h).

Determinism: programs and weights derive from fixed PRNG seeds and static
parameters, so an artifact is byte-stable across processes; `save` also
executes the deserialized path once so the persistent compile cache is
primed for exactly what `load` will compile.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, Tuple

import numpy as np

from hehub_tpu.core import rns
from hehub_tpu.models import ckks

_FORMAT_VERSION = 1


def _stage_input_shapes(refresh):
    """ShapeDtypeStructs for (c0, c1, key_data, plan_pts) of each stage."""
    import jax
    import jax.numpy as jnp

    n = refresh.b.params.dimension
    batch = refresh._batch_shape
    key_sh = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype),
        refresh._key_data,
    )
    plan_sh = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype),
        refresh._plan_pts,
    )
    ct_sh = jax.ShapeDtypeStruct((*batch, len(refresh.ids_in), n),
                                 jnp.uint32)

    def half_sh(key):
        ids, _ = key
        return jax.ShapeDtypeStruct((*batch, len(ids), n), jnp.uint32)

    (re_key, im_key) = refresh._meta["a"]
    wre = refresh._meta[("b",) + re_key]
    wim = refresh._meta[("b",) + im_key]
    w_sh = jax.ShapeDtypeStruct((*batch, len(wre[0]), n), jnp.uint32)
    w_sh_im = jax.ShapeDtypeStruct((*batch, len(wim[0]), n), jnp.uint32)
    return {
        "a": (ct_sh, ct_sh, key_sh, plan_sh),
        "b_re": (half_sh(re_key), half_sh(re_key), key_sh, plan_sh),
        "b_im": (half_sh(im_key), half_sh(im_key), key_sh, plan_sh),
        "c": (w_sh, w_sh, w_sh_im, w_sh_im, key_sh, plan_sh),
    }


def _flat_wrapper(fn, n_data: int, treedef):
    """jax.export only serializes pytrees with string dict keys; the key
    tree is keyed by integer rotation steps. Export a wrapper over FLAT
    leaves instead: (data_args..., *leaves) -> fn(data_args..., key_data,
    plan_pts)."""
    import jax

    def wrapped(*args):
        data, leaves = args[:n_data], args[n_data:]
        kd, pp = jax.tree.unflatten(treedef, list(leaves))
        return fn(*data, kd, pp)

    return jax.jit(wrapped)


def save(refresh, path: str) -> None:
    """Serialize a split-mode CompiledBootstrapper to `path` (one pickle).

    Exports each stage program as StableHLO (Pallas custom calls allowed),
    stores key/plan tensors as numpy, and runs the deserialized programs
    once so the persistent XLA compile cache is primed for `load`."""
    import jax
    from jax import export

    if not refresh.split:
        raise ValueError("artifact save requires CompiledBootstrapper(split=True)")
    shapes = _stage_input_shapes(refresh)
    disabled = [export.DisabledSafetyCheck.custom_call("tpu_custom_call")]
    (re_key, im_key) = refresh._meta["a"]
    leaves_sh, treedef = jax.tree.flatten(
        (shapes["a"][2], shapes["a"][3])
    )

    def exp(fn, data_shapes):
        w = _flat_wrapper(fn, len(data_shapes), treedef)
        return export.export(w, disabled_checks=disabled)(
            *data_shapes, *leaves_sh
        ).serialize()

    blobs = {
        "a": exp(refresh._fn_a, shapes["a"][:2]),
        "b_re": exp(refresh._fn_b[re_key], shapes["b_re"][:2]),
        "c": exp(refresh._fn_c, shapes["c"][:4]),
    }
    if im_key != re_key:
        blobs["b_im"] = exp(refresh._fn_b[im_key], shapes["b_im"][:2])
    header = {
        "version": _FORMAT_VERSION,
        "n": refresh.b.params.dimension,
        "batch": tuple(refresh._batch_shape),
        "treedef": str(treedef),
        "ids_in": refresh.ids_in,
        "scale_in": refresh.scale_in,
        "meta_a": refresh._meta["a"],
        "meta_b": {
            "re": refresh._meta[("b",) + re_key],
            "im": refresh._meta[("b",) + im_key],
        },
        "out_meta": refresh._out_meta,
    }
    key_np = _tree_numpy(refresh._key_data)
    plan_np = _tree_numpy(refresh._plan_pts)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(
            {"header": header, "blobs": blobs, "key_data": key_np,
             "plan_pts": plan_np},
            f, protocol=4,
        )
    os.replace(tmp, path)
    # prime the persistent compile cache for exactly what load() compiles.
    # Best-effort: with the LIVE refresh's weights still resident, loading
    # a second full copy can exhaust HBM at large n (seen at n=16384:
    # 2 x ~7 GB on a 16 GB chip) — the artifact is already valid, and a
    # fresh process (the driver's subprocess flow) completes the priming,
    # so an exec failure here only costs that first run's compile time.
    import jax

    try:
        loaded = LoadedBootstrapper(path)
        ct0 = _zero_ct(loaded)
        jax.block_until_ready(loaded(ct0).c0.data)
    except jax.errors.JaxRuntimeError as e:  # pragma: no cover
        import sys

        print(f"[boot_artifact] save-time prime run failed ({e!r}) — "
              f"artifact saved; a fresh process will finish compiling",
              file=sys.stderr, flush=True)


def _zero_ct(lb: "LoadedBootstrapper") -> ckks.CkksCt:
    z = np.zeros((*lb.batch_shape, len(lb.ids_in), lb.n), np.uint32)
    return ckks.CkksCt(
        rns.RnsPoly(z, rns.NTT, lb.ids_in),
        rns.RnsPoly(z, rns.NTT, lb.ids_in),
        lb.scale_in,
    )


def _tree_numpy(tree):
    import jax

    return jax.tree.map(np.asarray, tree)


class LoadedBootstrapper:
    """A refresh loaded from an artifact: call-compatible with
    CompiledBootstrapper (split mode) but constructed without tracing the
    circuit — deserialize + compile(-from-cache) only."""

    def __init__(self, path: str):
        import jax
        from jax import export

        with open(path, "rb") as f:
            d = pickle.load(f)
        h = d["header"]
        if h["version"] != _FORMAT_VERSION:
            raise ValueError(f"artifact version {h['version']} != "
                             f"{_FORMAT_VERSION}")
        self.n = h["n"]
        self.batch_shape = tuple(h.get("batch", ()))
        self.ids_in = tuple(h["ids_in"])
        self.scale_in = float(h["scale_in"])
        self._meta_a = h["meta_a"]
        self._meta_b = h["meta_b"]
        self._out_meta = h["out_meta"]
        # weights live on device once; calls pass device handles, not hosts
        self._key_data = jax.device_put(d["key_data"])
        self._plan_pts = jax.device_put(d["plan_pts"])
        leaves, treedef = jax.tree.flatten(
            (self._key_data, self._plan_pts)
        )
        if str(treedef) != h["treedef"]:
            raise ValueError("artifact key/plan tree structure drifted")
        self._leaves = leaves
        blobs = d["blobs"]

        def mk(blob):
            call = jax.jit(export.deserialize(blob).call)

            def run(*args):
                # call-compatible with CompiledBootstrapper stages: the
                # trailing (key_data, plan_pts) pytree args are replaced by
                # the artifact's device-resident flat leaves
                return call(*args[:-2], *self._leaves)

            return run

        self._fn_a = mk(blobs["a"])
        fb_re = mk(blobs["b_re"])
        fb_im = mk(blobs["b_im"]) if "b_im" in blobs else fb_re
        self._fn_b_re, self._fn_b_im = fb_re, fb_im
        self._fn_c = mk(blobs["c"])

    def stage_fns(self):
        return [
            ("c2s", self._fn_a),
            ("evalmod_re", self._fn_b_re),
            ("evalmod_im", self._fn_b_im),
            ("s2c", self._fn_c),
        ]

    def __call__(self, ct: ckks.CkksCt) -> ckks.CkksCt:
        if abs(ct.scaling_factor - self.scale_in) > 1e-6 * self.scale_in:
            raise ValueError("artifact built for a different input scale")
        kd, pp = self._key_data, self._plan_pts
        re0, re1, im0, im1 = self._fn_a(ct.c0.data, ct.c1.data, kd, pp)
        wre = self._fn_b_re(re0, re1, kd, pp)
        wim = self._fn_b_im(im0, im1, kd, pp)
        o0, o1 = self._fn_c(wre[0], wre[1], wim[0], wim[1], kd, pp)
        ids, scale = self._out_meta
        return ckks.CkksCt(
            rns.RnsPoly(o0, rns.NTT, tuple(ids)),
            rns.RnsPoly(o1, rns.NTT, tuple(ids)),
            scale,
        )


def load(path: str) -> LoadedBootstrapper:
    return LoadedBootstrapper(path)
