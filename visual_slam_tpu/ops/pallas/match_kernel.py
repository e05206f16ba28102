"""Pallas TPU kernel: brute-force 256-bit descriptor matching.

One kernel invocation computes the full K1 x K2 Hamming-distance matrix on
the MXU (via the ±1 dot-product identity), then reduces top-2 distances,
best index, ratio/absolute gates, and the mutual-nearest-neighbor cross
check — all while the distance matrix lives in VMEM. The XLA fallback
(ops.match.match_ratio_test) materializes the matrix in HBM between the
matmul and the top-k; here it never leaves the chip.

Replaces the reference's cv2.BFMatcher.knnMatch(k=2) + Lowe ratio
(src/v2/frame.py:16-49) — identified as a hot loop in SURVEY.md §3.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import descriptor as desc_mod


def _match_kernel(a_ref, b_ref, v1_ref, v2_ref, ratio_ref, maxd_ref,
                  idx_ref, dist_ref, good_ref):
    a = a_ref[:]  # (K1,256) ±1
    b = b_ref[:]  # (K2,256) ±1
    nbits = a.shape[-1]
    dot = jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (K1,K2)
    D = 0.5 * (nbits - dot)
    big = jnp.float32(1e9)
    valid = v1_ref[:][:, None] * v2_ref[:][None, :]  # (K1,K2) 0/1
    D = jnp.where(valid > 0, D, big)
    # Row-wise best and second-best.
    d1 = jnp.min(D, axis=1)
    idx = jnp.argmin(D, axis=1)
    k2 = D.shape[1]
    cols = jax.lax.broadcasted_iota(jnp.int32, D.shape, 1)
    D2 = jnp.where(cols == idx[:, None], big, D)
    d2 = jnp.min(D2, axis=1)
    # Column-wise best row (for the mutual check).
    best_row_for_col = jnp.argmin(D, axis=0)  # (K2,)
    rows = jax.lax.broadcasted_iota(jnp.int32, D.shape, 0)
    # mutual[i] = best_row_for_col[idx[i]] == i, evaluated without a gather:
    # one-hot select over the matrix (VPU-friendly).
    sel = (cols == idx[:, None]).astype(jnp.float32)  # one-hot of idx per row
    brfc = jnp.sum(best_row_for_col[None, :].astype(jnp.float32) * sel, axis=1)
    mutual = brfc == rows[:, 0].astype(jnp.float32)
    good = (
        (d1 < ratio_ref[0, 0] * d2)
        & (d1 < maxd_ref[0, 0])
        & (v1_ref[:] > 0)
        & mutual
    )
    idx_ref[:] = idx.astype(jnp.int32)
    dist_ref[:] = d1
    good_ref[:] = good.astype(jnp.int32)


@partial(jax.jit, static_argnames=("interpret",))
def match_ratio_test_pallas(
    desc1: jnp.ndarray,
    desc2: jnp.ndarray,
    valid1: jnp.ndarray,
    valid2: jnp.ndarray,
    ratio: float = 0.8,
    max_distance: float = 96.0,
    interpret: bool = False,
):
    """Drop-in Pallas version of ops.match.match_ratio_test (cross_check=True).

    Returns (idx2 (K1,), dist (K1,), good (K1,) bool).
    """
    a = desc_mod.unpack_pm1(desc1, dtype=jnp.bfloat16)
    b = desc_mod.unpack_pm1(desc2, dtype=jnp.bfloat16)
    K1 = a.shape[0]
    idx, dist, good = pl.pallas_call(
        _match_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((K1,), jnp.int32),
            jax.ShapeDtypeStruct((K1,), jnp.float32),
            jax.ShapeDtypeStruct((K1,), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(
        a,
        b,
        valid1.astype(jnp.float32),
        valid2.astype(jnp.float32),
        jnp.asarray([[ratio]], jnp.float32),
        jnp.asarray([[max_distance]], jnp.float32),
    )
    return idx, dist, good.astype(bool)
