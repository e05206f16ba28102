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

from ..ops import descriptor, detect


class Features(NamedTuple):
    """Fixed-shape per-frame features (the SoA Frame record).

    uv: (K,2) float32 pixel coords; desc: (K,8) uint32 packed 256-bit
    descriptors; score: (K,) corner response; valid: (K,) bool.
    """

    uv: jnp.ndarray
    desc: jnp.ndarray
    score: jnp.ndarray
    valid: jnp.ndarray


@partial(jax.jit, static_argnames=("max_features",))
def extract(img: jnp.ndarray, max_features: int = 1024) -> Features:
    """Full front-end for one grayscale image (H,W) float32 in [0,1]."""
    uv, score, valid = detect.detect_corners(img, max_corners=max_features)
    blurred = detect.gaussian_blur(img, sigma=2.0, radius=4)
    theta = detect.orientation(img, uv)
    desc = descriptor.describe(blurred, uv, theta)
    return Features(uv=uv, desc=desc, score=score, valid=valid)


extract_batch = jax.vmap(extract, in_axes=(0, None))


@partial(jax.jit, static_argnames=("max_features",))
def extract_rgb(rgb_u8: jnp.ndarray, max_features: int = 1024) -> Features:
    """Front-end from a device-resident (H,W,3) uint8 image.

    Grayscale conversion happens on-device so the host->device transfer is
    the raw 0.9 MB uint8 frame, not a 1.2 MB float gray (HBM-bandwidth and
    PCIe/tunnel friendly)."""
    return extract(to_gray(rgb_u8), max_features)


def to_gray(rgb: jnp.ndarray) -> jnp.ndarray:
    """(H,W,3) uint8/float RGB -> (H,W) float32 grayscale in [0,1]."""
    img = rgb.astype(jnp.float32)
    if rgb.dtype == jnp.uint8:
        img = img / 255.0
    return (
        0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    )
