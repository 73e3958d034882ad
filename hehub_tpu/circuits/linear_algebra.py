"""Homomorphic linear algebra: plaintext-matrix × encrypted-vector product by
the rotation-diagonal method (≙ /root/reference/src/circuits/
linear_algebra.h:27-135), TPU-native.

The host loop over diagonals traces into one jit-able computation: each step
is mult_plain + rotate (gather + key-switch contraction), which XLA fuses
across diagonals."""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np

from hehub_tpu.core.context import CkksParams, Context
from hehub_tpu.models import ckks
from hehub_tpu.rlwe import rgsw as rgsw_mod


def mv_mul_requiring_steps(slot_count: int, matrix_width: int):
    """Which rotation keys a narrow matrix-vector product needs
    (≙ mv_mul_requiring_steps, linear_algebra.h:27-35)."""
    steps = []
    for step in range(1, matrix_width):
        steps.append(step)
        steps.append(step + slot_count - matrix_width)
    return steps


def matrix_vector_mul(
    ctx: Context,
    params: CkksParams,
    mat: np.ndarray,
    ct_vec: ckks.CkksCt,
    rot_keys: Dict[int, rgsw_mod.RgswCt],
) -> ckks.CkksCt:
    """Short-matrix (height <= slots) diagonal-method product
    (≙ matrix_vector_mul_short, linear_algebra.h:49-135).

    mat: [height, width] real or complex; rot_keys: step -> rotation key,
    covering mv_mul_requiring_steps(slots, width) (or {1} when width==slots).
    """
    n = params.dimension
    slots = n // 2
    mat = np.asarray(mat)
    height, width = mat.shape
    if height > slots:
        raise ValueError("matrix too tall for one ciphertext")
    if width > slots:
        raise ValueError("matrix too wide; choose larger parameters")
    if slots // 2 < width < slots:
        raise ValueError(
            "matrix width must equal the slot count or be <= half of it"
        )

    full_width = width == slots
    level = len(params.moduli) - ct_vec.level
    scale = ct_vec.scaling_factor

    # Narrow path: all rotations act on the ORIGINAL ct_vec, so one hoisted
    # digit decomposition (ckks.hoisted_rotations) serves every step — the
    # reference's loop re-runs the full key switch per rotation
    # (linear_algebra.h:104-123). The full-width path stays a sequential
    # rotate-by-1 chain: it needs (and the API promises) only rot_keys[1].
    rotated = {}
    if not full_width and width > 1:
        steps = mv_mul_requiring_steps(slots, width)
        rotated = ckks.hoisted_rotations(ctx, ct_vec, rot_keys, steps)

    ct_rotating = ct_vec
    acc = None
    for i in range(width):
        diag = np.zeros(slots, dtype=np.complex128)
        for j in range(height):
            diag[j] = mat[j][(j + width - i) % width]
        pt = ckks.encode(diag, params, scaling_factor=scale, level=level)
        term = ckks.mult_plain(ctx, ct_rotating, pt)
        acc = term if acc is None else ckks.add(ctx, acc, term)
        if i != width - 1:
            if full_width:
                ct_rotating = ckks.rotate(ctx, ct_rotating, rot_keys[1], 1)
            else:
                s = i + 1
                s2 = s + slots - width
                ct_rotating = ckks.add(ctx, rotated[s], rotated[s2])
    return ckks.rescale(ctx, acc)
