"""Pipeline parallelism for deep leveled circuits — the last §2.6 analog
(SURVEY.md: "stage deep leveled circuits (mult→relin→rescale chains) across
mesh slices"; the reference has no parallelism of any kind).

An FHE mult chain is a natural pipeline: stage s runs the level-(L−s)
mult+relin+rescale, whose shapes SHRINK with depth — so unlike shard_map
SPMD (which needs one uniform program), each stage is its own jitted
computation pinned to its own device by data placement. The host enqueues a
GPipe schedule; because JAX dispatch is asynchronous, consecutive
microbatches execute CONCURRENTLY on different devices, and the
device-to-device handoffs are direct transfers (ICI on a real slice).

Keys are host constants baked into every stage's program (CLAUDE.md
invariant), so no key distribution step exists.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import numpy as np

from hehub_tpu.core import rns
from hehub_tpu.core.context import Context
from hehub_tpu.models import ckks
from hehub_tpu.rlwe import rgsw as rgsw_mod


class PipelinedSquaringChain:
    """Iterated squaring ct ↦ ct^(2^depth) staged across `devices`.

    Stage s (device s) consumes a ciphertext at level L−s and emits one at
    L−s−1 (mult + relinearize + rescale). `run` executes a GPipe schedule
    over a list of microbatches: with D stages and M microbatches the
    pipeline finishes in M + D − 1 ticks, with up to D microbatches in
    flight at once.
    """

    def __init__(
        self,
        ctx: Context,
        rlk: rgsw_mod.RgswCt,
        depth: int,
        top_level: int,
        devices: Optional[Sequence] = None,
    ):
        self.ctx = ctx
        self.depth = depth
        self.top_level = top_level
        devs = list(devices if devices is not None else jax.devices())
        if depth > len(devs):
            raise ValueError(f"need {depth} devices, have {len(devs)}")
        self.devices = devs[:depth]
        rlk_host = type(rlk)(np.asarray(rlk.data), rlk.limb_ids, rlk.alpha)
        self._stage_fns = []
        for s in range(depth):
            level = top_level - s
            ids = tuple(range(level))

            def stage(c0d, c1d, scale, _ids=ids):
                ct = ckks.CkksCt(
                    rns.RnsPoly(c0d, rns.NTT, _ids),
                    rns.RnsPoly(c1d, rns.NTT, _ids),
                    float(scale),
                )
                out = ckks.rescale(
                    self.ctx, ckks.mult(self.ctx, ct, ct, rlk_host)
                )
                return out.c0.data, out.c1.data

            # scale is a static argument: it changes the traced constants
            # (compensation-free squaring keeps it data-independent)
            self._stage_fns.append(jax.jit(stage, static_argnums=(2,)))

    def run(self, cts: List[ckks.CkksCt]) -> List[ckks.CkksCt]:
        """GPipe schedule: microbatch m enters stage 0 at tick m; stage s
        processes microbatch m at tick m+s. All dispatches are async — the
        host never blocks inside the schedule."""
        depth, devs = self.depth, self.devices
        n_micro = len(cts)
        state = [None] * depth  # (c0, c1, scale, idx) currently held per stage
        done: List[Optional[ckks.CkksCt]] = [None] * n_micro
        feed = [
            (
                jax.device_put(ct.c0.data, devs[0]),
                jax.device_put(ct.c1.data, devs[0]),
                ct.scaling_factor,
                i,
            )
            for i, ct in enumerate(cts)
        ]
        for tick in range(n_micro + depth - 1):
            new_state = [None] * depth
            for s in reversed(range(depth)):
                if s == 0:
                    inp = feed[tick] if tick < n_micro else None
                else:
                    inp = state[s - 1]
                if inp is None:
                    continue
                c0, c1, scale, idx = inp
                o0, o1 = self._stage_fns[s](c0, c1, scale)
                # output scale: squared, then divided by the dropped modulus
                lvl = self.top_level - s
                out_scale = scale * scale / self.ctx.mod_list[lvl - 1]
                if s + 1 < depth:
                    nxt = devs[s + 1]
                    new_state[s] = (
                        jax.device_put(o0, nxt),
                        jax.device_put(o1, nxt),
                        out_scale,
                        idx,
                    )
                else:
                    ids = tuple(range(lvl - 1))
                    done[idx] = ckks.CkksCt(
                        rns.RnsPoly(o0, rns.NTT, ids),
                        rns.RnsPoly(o1, rns.NTT, ids),
                        out_scale,
                    )
            state = new_state
        return done
