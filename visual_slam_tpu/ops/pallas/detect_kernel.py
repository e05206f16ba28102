"""Pallas TPU kernel: fused Shi-Tomasi corner response + non-max suppression.

The whole detection pre-stage runs in one VMEM residency: Sobel gradients
(shift-and-add on the VPU — no conv machinery), structure-tensor box sums,
min-eigenvalue response, border suppression, and (2r+1)^2 NMS via shifted
maxima. The image is loaded from HBM once and only the peak map is written
back; top-k selection stays in XLA (jax.lax.top_k is already fast).

Replaces the corner stage of cv2.goodFeaturesToTrack (reference:
src/v2/frame.py:10-14).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift(x, dy, dx):
    """Shift with zero padding (static offsets).

    Per-axis rolls, skipping zero shifts: Mosaic lowers roll to
    concatenated slices and rejects the zero-size slice a 0-shift creates.
    """
    H, W = x.shape
    if dy:
        x = jnp.roll(x, dy, axis=0)
    if dx:
        x = jnp.roll(x, dx, axis=1)
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    ok = jnp.ones((H, W), jnp.bool_)
    if dy > 0:
        ok &= ys >= dy
    elif dy < 0:
        ok &= ys < H + dy
    if dx > 0:
        ok &= xs >= dx
    elif dx < 0:
        ok &= xs < W + dx
    return jnp.where(ok, x, 0.0)


def _box3(x):
    """3x3 box sum via separable shifts."""
    h = _shift(x, 0, -1) + x + _shift(x, 0, 1)
    return _shift(h, -1, 0) + h + _shift(h, 1, 0)


def _detect_kernel(img_ref, out_ref, *, nms_radius: int, border: int):
    img = img_ref[:]
    H, W = img.shape
    # Sobel gradients (VPU shift-and-add), /8 normalization as in ops.detect.
    tl, t, tr = _shift(img, 1, 1), _shift(img, 1, 0), _shift(img, 1, -1)
    bl, b, br = _shift(img, -1, 1), _shift(img, -1, 0), _shift(img, -1, -1)
    l, r = _shift(img, 0, 1), _shift(img, 0, -1)
    ix = (tr + 2 * r + br - tl - 2 * l - bl) * 0.125
    iy = (bl + 2 * b + br - tl - 2 * t - tr) * 0.125
    ixx = _box3(ix * ix) * (1.0 / 9.0)
    iyy = _box3(iy * iy) * (1.0 / 9.0)
    ixy = _box3(ix * iy) * (1.0 / 9.0)
    tr_h = 0.5 * (ixx + iyy)
    det_part = jnp.sqrt(jnp.maximum((0.5 * (ixx - iyy)) ** 2 + ixy * ixy, 0.0))
    resp = tr_h - det_part
    # Border suppression.
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    inside = (ys >= border) & (ys < H - border) & (xs >= border) & (xs < W - border)
    neg_inf = jnp.float32(-jnp.inf)
    resp = jnp.where(inside, resp, neg_inf)
    # NMS: max over the (2r+1)^2 neighborhood with shifted maxima
    # (separable: rows then columns).
    m = resp
    for d in range(1, nms_radius + 1):
        m = jnp.maximum(m, jnp.maximum(_shift_inf(resp, 0, -d), _shift_inf(resp, 0, d)))
    mm = m
    for d in range(1, nms_radius + 1):
        mm = jnp.maximum(mm, jnp.maximum(_shift_inf(m, -d, 0), _shift_inf(m, d, 0)))
    out_ref[:] = jnp.where(resp >= mm, resp, neg_inf)


def _shift_inf(x, dy, dx):
    """Shift with -inf padding (for max-pooling). Per-axis rolls; see _shift."""
    H, W = x.shape
    if dy:
        x = jnp.roll(x, dy, axis=0)
    if dx:
        x = jnp.roll(x, dx, axis=1)
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    ok = jnp.ones((H, W), jnp.bool_)
    if dy > 0:
        ok &= ys >= dy
    elif dy < 0:
        ok &= ys < H + dy
    if dx > 0:
        ok &= xs >= dx
    elif dx < 0:
        ok &= xs < W + dx
    return jnp.where(ok, x, -jnp.inf)


@partial(jax.jit, static_argnames=("nms_radius", "border", "interpret"))
def corner_peaks_pallas(
    img: jnp.ndarray,
    nms_radius: int = 3,
    border: int = 16,
    interpret: bool = False,
) -> jnp.ndarray:
    """(H,W) image -> (H,W) NMS'd corner response (-inf off-peak)."""
    return pl.pallas_call(
        partial(_detect_kernel, nms_radius=nms_radius, border=border),
        out_shape=jax.ShapeDtypeStruct(img.shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(img.astype(jnp.float32))


def _detect_blur_kernel(img_ref, peaks_ref, blur_ref, *, nms_radius: int,
                        border: int, blur_radius: int, blur_sigma: float):
    """Fused corner peaks + Gaussian blur in one VMEM residency."""
    import numpy as np

    _detect_kernel(img_ref, peaks_ref, nms_radius=nms_radius, border=border)
    img = img_ref[:]
    # Separable Gaussian via shift-and-add with baked-in weights.
    x = np.arange(-blur_radius, blur_radius + 1)
    g = np.exp(-0.5 * (x / blur_sigma) ** 2)
    g = (g / g.sum()).astype(np.float32)
    h = img * float(g[blur_radius])
    for d in range(1, blur_radius + 1):
        w = float(g[blur_radius + d])
        h = h + (_shift(img, 0, -d) + _shift(img, 0, d)) * w
    v = h * float(g[blur_radius])
    for d in range(1, blur_radius + 1):
        w = float(g[blur_radius + d])
        v = v + (_shift(h, -d, 0) + _shift(h, d, 0)) * w
    blur_ref[:] = v


@partial(jax.jit, static_argnames=("nms_radius", "border", "blur_radius", "interpret"))
def corner_peaks_and_blur_pallas(
    img: jnp.ndarray,
    nms_radius: int = 3,
    border: int = 16,
    blur_radius: int = 4,
    blur_sigma: float = 2.0,
    interpret: bool = False,
):
    """(H,W) image -> (NMS'd corner peaks, Gaussian-blurred image).

    One kernel, one HBM round trip: the detection response/NMS and the
    descriptor-stage blur share the VMEM-resident image.
    """
    return pl.pallas_call(
        partial(
            _detect_blur_kernel,
            nms_radius=nms_radius,
            border=border,
            blur_radius=blur_radius,
            blur_sigma=blur_sigma,
        ),
        out_shape=(
            jax.ShapeDtypeStruct(img.shape, jnp.float32),
            jax.ShapeDtypeStruct(img.shape, jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(img.astype(jnp.float32))


def detect_corners_pallas(
    img: jnp.ndarray,
    max_corners: int = 1024,
    quality_level: float = 0.01,
    nms_radius: int = 3,
    border: int = 16,
    interpret: bool = False,
):
    """Drop-in Pallas-backed version of ops.detect.detect_corners."""
    peaks = corner_peaks_pallas(img, nms_radius, border, interpret)
    H, W = img.shape
    flat = peaks.reshape(-1)
    top, idx = jax.lax.top_k(flat, max_corners)
    y = (idx // W).astype(jnp.float32)
    x = (idx % W).astype(jnp.float32)
    uv = jnp.stack([x, y], axis=-1)
    valid = (top > quality_level * top[0]) & jnp.isfinite(top)
    return uv, top, valid
