"""Feature front-end model: detect + orient + describe in one jittable step.

The composed TPU equivalent of the reference's per-frame
`Frame.process_frame` -> `FeatureExtractor.compute_features`
(src/v2/frame.py:85-91, :10-14): Shi-Tomasi corners promoted to oriented
keypoints with ORB-style binary descriptors, at a fixed feature budget with
a validity mask.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import descriptor, descriptor_mxu, detect
from ..ops.pallas import detect_kernel, patch_kernel


class Features(NamedTuple):
    """Fixed-shape per-frame features (the SoA Frame record).

    uv: (K,2) float32 pixel coords; desc: (K,8) uint32 packed 256-bit
    descriptors; score: (K,) corner response; valid: (K,) bool.
    """

    uv: jnp.ndarray
    desc: jnp.ndarray
    score: jnp.ndarray
    valid: jnp.ndarray


@partial(jax.jit, static_argnames=("max_features", "quality_level", "nms_radius"))
def _extract_stage1(img: jnp.ndarray, max_features: int,
                    quality_level: float = 0.01, nms_radius: int = 3):
    """Detection + blur + orientation (conv/top-k work only)."""
    img = to_gray(img)  # also normalizes 2-D uint8 input to float [0,1]
    uv, score, valid = detect.detect_corners(
        img, max_corners=max_features, quality_level=quality_level,
        nms_radius=nms_radius,
    )
    blurred = detect.gaussian_blur(img, sigma=2.0, radius=4)
    theta = detect.orientation(img, uv)
    return uv, score, valid, blurred, theta


@jax.jit
def _to_gray_jit(img: jnp.ndarray) -> jnp.ndarray:
    return to_gray(img)


@partial(jax.jit, static_argnames=("max_features", "quality_level", "border"))
def _topk_select(peaks: jnp.ndarray, max_features: int, quality_level: float = 0.01, border: int = 16):
    """NMS'd peak map -> top-K corner coordinates.

    EXACT top_k (r5). Round 4 swapped in approx_max_k (recall 0.95) for a
    0.40 -> 0.08 ms stage win and recorded "end-to-end ATE unchanged";
    re-measured on the full 200-frame TPU pipeline that was wrong: the
    weakest-corner swaps near the cut moved 200-frame ATE 0.0147 -> 0.0187
    (the entire r4 accuracy slide on the headline config). +0.33 ms/frame
    (~2% of the tracking-phase frame time) buys the 21% back."""
    H, W = peaks.shape
    top, idx = jax.lax.top_k(peaks.reshape(-1), max_features)
    y = (idx // W).astype(jnp.float32)
    x = (idx % W).astype(jnp.float32)
    uv = jnp.stack([x, y], axis=-1)
    valid = (top > quality_level * top[0]) & jnp.isfinite(top)
    return uv, top, valid


@partial(jax.jit, static_argnames=("max_features", "interpret", "quality_level", "nms_radius"))
def _extract_pallas_fused(
    img: jnp.ndarray,
    max_features: int,
    interpret: bool,
    quality_level: float = 0.01,
    nms_radius: int = 3,
) -> Features:
    """Whole front-end as ONE jit. Safe to fuse because the heavy stages are
    Pallas custom calls (opaque to XLA's fuser) and the XLA glue is only
    elementwise gray conversion, top_k, and matmul einsums — none of the
    conv/gather ops whose fusions misbehave on this backend. One dispatch
    per frame instead of five (each dispatch+sync round trip through the
    TPU tunnel costs milliseconds)."""
    gray = to_gray(img)
    peaks, blurred = detect_kernel.corner_peaks_and_blur_pallas(
        gray, nms_radius=nms_radius, interpret=interpret
    )
    uv, score, valid = _topk_select(peaks, max_features, quality_level)
    windows, ry, rx = patch_kernel.extract_windows(blurred, uv, interpret=interpret)
    desc, theta = descriptor_mxu.describe_from_windows(windows, ry, rx)
    return Features(uv=uv, desc=desc, score=score, valid=valid)


def extract_pallas(
    img: jnp.ndarray,
    max_features: int = 1024,
    quality_level: float = 0.01,
    nms_radius: int = 3,
) -> Features:
    """Deterministic-performance front-end (see _extract_pallas_fused)."""
    interp = jax.default_backend() != "tpu"
    return _extract_pallas_fused(
        jnp.asarray(img), max_features, interp, quality_level, nms_radius
    )


# Front-end backend: "pallas" = fully deterministic-performance path
# (Pallas detect/blur + Pallas patch windows + MXU sampling matmuls);
# "xla" = conv/gather path (ops.detect + ops.descriptor). Descriptors of
# the two paths are not bit-compatible.
FRONTEND_BACKEND = "pallas"


def extract(
    img: jnp.ndarray,
    max_features: int = 1024,
    quality_level: float = 0.01,
    nms_radius: int = 3,
) -> Features:
    """Full front-end for one image: grayscale (H,W) float32 in [0,1] or
    RGB (H,W,3) uint8 (converted on-device). quality_level/nms_radius
    mirror goodFeaturesToTrack's qualityLevel/minDistance (frame.py:11).

    Multiple jit dispatches by design: whenever the descriptor sampler's
    index production fuses with its neighbors, the TPU backend's gather
    lowering can serialize (measured ~100x slowdown, nondeterministic
    across compiles); the dispatch overhead (~0.1 ms each) is noise.
    """
    if FRONTEND_BACKEND == "pallas":
        return extract_pallas(img, max_features, quality_level, nms_radius)
    uv, score, valid, blurred, theta = _extract_stage1(
        img, max_features, quality_level, nms_radius
    )
    H, W = (img.shape[:2] if img.ndim == 3 else img.shape)
    idx, fx, fy = descriptor._sample_offsets_jit(uv, theta, W, H)
    desc = descriptor._gather_and_pack_jit(blurred, idx, fx, fy)
    return Features(uv=uv, desc=desc, score=score, valid=valid)


@partial(
    jax.jit, static_argnames=("max_features", "quality_level", "nms_radius")
)
def extract_fused(
    img: jnp.ndarray,
    max_features: int = 1024,
    quality_level: float = 0.01,
    nms_radius: int = 3,
) -> Features:
    """Single-jit front-end for use inside larger jitted computations
    (pays the fused-gather penalty; prefer `extract` at the host level)."""
    img = to_gray(img)  # also normalizes 2-D uint8 input to float [0,1]
    uv, score, valid = detect.detect_corners(
        img, max_corners=max_features,
        quality_level=quality_level, nms_radius=nms_radius,
    )
    blurred = detect.gaussian_blur(img, sigma=2.0, radius=4)
    theta = detect.orientation(img, uv)
    desc = descriptor.describe_fused(blurred, uv, theta)
    return Features(uv=uv, desc=desc, score=score, valid=valid)


_extract_batch_xla_v = jax.vmap(extract_fused, in_axes=(0, None, None, None))

_extract_batch_pallas_v = jax.vmap(
    _extract_pallas_fused, in_axes=(0, None, None, None, None)
)


def extract_batch(
    imgs: jnp.ndarray,
    max_features: int = 1024,
    quality_level: float = 0.01,
    nms_radius: int = 3,
) -> Features:
    """Batched front-end over a (B,H,W) stack.

    Production path is the vmapped Pallas front-end (pallas_call vmaps by
    prepending a grid dimension), so the batched route — multi.run_batched /
    config #3 / the multichip dryrun — rides the SAME deterministic kernels
    as single-sequence production. The XLA conv/gather route (extract_fused)
    remains only as the interpret-averse fallback via FRONTEND_BACKEND."""
    if FRONTEND_BACKEND == "pallas":
        interp = jax.default_backend() != "tpu"
        return _extract_batch_pallas_v(
            imgs, max_features, interp, quality_level, nms_radius
        )
    return _extract_batch_xla_v(imgs, max_features, quality_level, nms_radius)


def extract_rgb(rgb_u8: jnp.ndarray, max_features: int = 1024) -> Features:
    """Front-end from a device-resident (H,W,3) uint8 image.

    Grayscale conversion happens on-device so the host->device transfer is
    the raw 0.9 MB uint8 frame, not a 1.2 MB float gray (HBM-bandwidth and
    PCIe/tunnel friendly)."""
    return extract(rgb_u8, max_features)


def to_gray(rgb: jnp.ndarray) -> jnp.ndarray:
    """(H,W,3) RGB or (H,W) gray, uint8/float -> (H,W) float32 in [0,1]."""
    img = rgb.astype(jnp.float32)
    if rgb.dtype == jnp.uint8:
        img = img / 255.0
    if rgb.ndim == 2:
        return img
    return (
        0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    )
