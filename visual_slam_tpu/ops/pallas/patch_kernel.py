"""Pallas TPU kernel: per-keypoint patch extraction by dynamic-slice copies.

The descriptor sampler needs 512 bilinear samples around each of K
keypoints. XLA lowers that to a giant dynamic gather whose compiled quality
is unreliable on this backend (measured 0.02 ms .. 20 ms for identical HLO
across compiles). This kernel sidesteps gathers entirely: the image lives in
VMEM and each grid step copies one window with scalar dynamic starts
(`pl.ds` with SMEM-prefetched corners) — plain vector loads at a dynamic
base, deterministic codegen.

TPU alignment: Mosaic requires dynamic vector-load starts to be 8-aligned in
the sublane (row) dimension and 128-aligned in the lane (column) dimension.
So the kernel copies an ALIGNED (40, 160) window that is guaranteed to
contain the desired 32x32 patch; the (<=7, <=127) residual offsets are
returned and the exact 32x32 window is cut out downstream with one-hot
selection matmuls (ops.descriptor_mxu) — still no gathers.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PATCH = 32  # patch side; keypoint pattern fits a 31x31 window + bilinear +1
WIN_H = PATCH + 8  # aligned window: rows 8-aligned
WIN_W = PATCH + 128  # aligned window: cols 128-aligned


def _patch_kernel(y0_ref, x0_ref, img_ref, out_ref):
    i = pl.program_id(0)
    y0 = pl.multiple_of(y0_ref[i], 8)
    x0 = pl.multiple_of(x0_ref[i], 128)
    out_ref[0] = img_ref[pl.ds(y0, WIN_H), pl.ds(x0, WIN_W)]


@partial(jax.jit, static_argnames=("interpret",))
def extract_windows(
    img: jnp.ndarray, uv: jnp.ndarray, interpret: bool = False
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Copy an aligned (WIN_H, WIN_W) window around each keypoint.

    Args:
      img: (H,W) float32 (pre-blurred).
      uv: (K,2) float pixel coords.
    Returns:
      windows (K,WIN_H,WIN_W) float32,
      ry (K,) int32 in [0,8)   — patch top row inside the window,
      rx (K,) int32 in [0,128) — patch left col inside the window.
    """
    H, W = img.shape
    K = uv.shape[0]
    half = PATCH // 2
    corner = jnp.floor(uv) - (half - 1)
    cx = jnp.clip(corner[:, 0], 0, W - PATCH).astype(jnp.int32)
    cy = jnp.clip(corner[:, 1], 0, H - PATCH).astype(jnp.int32)
    y0 = (cy // 8) * 8
    x0 = (cx // 128) * 128
    ry = cy - y0
    rx = cx - x0
    # Pad so aligned windows never run off the edge.
    H_pad = ((H - PATCH) // 8) * 8 + WIN_H
    W_pad = ((W - PATCH) // 128) * 128 + WIN_W
    img_p = jnp.pad(img, ((0, max(0, H_pad - H)), (0, max(0, W_pad - W))))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(K,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (1, WIN_H, WIN_W), lambda i, y0, x0: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    windows = pl.pallas_call(
        _patch_kernel,
        out_shape=jax.ShapeDtypeStruct((K, WIN_H, WIN_W), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(y0, x0, img_p.astype(jnp.float32))
    return windows, ry, rx


def cut_patches(windows: jnp.ndarray, ry: jnp.ndarray, rx: jnp.ndarray) -> jnp.ndarray:
    """(K,WIN_H,WIN_W) aligned windows -> (K,PATCH,PATCH) exact patches via
    one-hot selection matmuls (gather-free, MXU-friendly)."""
    K = windows.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (WIN_H, PATCH), 0)
    prow = jax.lax.broadcasted_iota(jnp.int32, (WIN_H, PATCH), 1)
    # My[k, a, b] = 1 where a == ry[k] + b.
    My = (rows[None] == ry[:, None, None] + prow[None]).astype(windows.dtype)
    cols = jax.lax.broadcasted_iota(jnp.int32, (WIN_W, PATCH), 0)
    pcol = jax.lax.broadcasted_iota(jnp.int32, (WIN_W, PATCH), 1)
    Mx = (cols[None] == rx[:, None, None] + pcol[None]).astype(windows.dtype)
    hi = jax.lax.Precision.HIGHEST  # selection is exact 0/1 — keep f32 bits
    tmp = jnp.einsum("kab,kaw->kbw", My, windows,
                     preferred_element_type=jnp.float32, precision=hi)
    return jnp.einsum("kbw,kwj->kbj", tmp, Mx,
                      preferred_element_type=jnp.float32, precision=hi)


@partial(jax.jit, static_argnames=("interpret",))
def extract_patches(
    img: jnp.ndarray, uv: jnp.ndarray, interpret: bool = False
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(H,W) image + (K,2) keypoints -> (K,PATCH,PATCH) patches (+(K,2) frac).

    Composition of the aligned-window kernel and the one-hot cut.
    """
    H, W = img.shape
    windows, ry, rx = extract_windows(img, uv, interpret=interpret)
    patches = cut_patches(windows, ry, rx)
    half = PATCH // 2
    corner = jnp.floor(uv) - (half - 1)
    cx = jnp.clip(corner[:, 0], 0, W - PATCH)
    cy = jnp.clip(corner[:, 1], 0, H - PATCH)
    frac = uv - jnp.stack([cx, cy], axis=-1)
    return patches, frac
