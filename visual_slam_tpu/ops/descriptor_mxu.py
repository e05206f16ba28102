"""MXU-based rBRIEF descriptors: gather-free sampling via per-rotation
sampling matrices.

The bilinear-gather sampler (ops.descriptor) is at the mercy of XLA's
gather lowering, which compiles nondeterministically on this backend. This
path has no gathers at all:

  1. ops.pallas.patch_kernel extracts a 32x32 patch per keypoint
     (dynamic-slice copies in VMEM),
  2. the keypoint orientation is quantized to N_BINS rotations; each bin b
     has a precomputed sampling matrix S_b (1024 x 512) whose columns hold
     the bilinear weights of one rotated BRIEF sample point,
  3. each BRIEF bit is sign(second sample - first sample), so the two
     sample columns collapse into ONE difference matrix column:
     D_b = S_b[:, 256:] - S_b[:, :256] (1024 x 256), and
     bits = (patches_flat @ D_b > 0) — half the matmul of the two-column
     form. The matmul runs over all bins on the MXU in bf16 (inputs are
     patch intensities in [0,1] and ±bilinear weights — well inside bf16
     range; the product feeds only a sign test, and the bin blend below
     keeps it continuous), with a one-hot bin-selection contraction in
     f32 (no gather). Measured on TPU v5e at K=1024: the earlier f32
     HIGHEST-precision two-column form cost ~34 GFLOP/frame of 6-pass
     matmul — the single hottest op in the whole pipeline.
  4. pack bits exactly like the reference path.

Rotation quantization (±180/N_BINS deg) is the standard ORB discretization
(ORB uses 30 bins / 12 deg); descriptors remain compatible in spirit but NOT
bit-identical to ops.descriptor's continuous-rotation sampler — a frame
must be described by one path consistently.
"""
from __future__ import annotations



import numpy as np
import jax
import jax.numpy as jnp

from . import descriptor as desc_ref
from .pallas import patch_kernel

N_BINS = 32
N_BITS = desc_ref.N_BITS
N_WORDS = desc_ref.N_WORDS
PATCH = patch_kernel.PATCH
_CENTER = PATCH // 2 - 1  # keypoint sits at (15,15) for integer corners


def _build_sampling_matrices() -> np.ndarray:
    """(N_BINS, PATCH*PATCH, 512) float32 bilinear sampling matrices."""
    pat = np.asarray(desc_ref.PATTERN)  # (256,2,2) offsets
    # Flatten endpoints like ops.descriptor: [256 first, 256 second].
    px = np.concatenate([pat[:, 0, 0], pat[:, 1, 0]])  # (512,)
    py = np.concatenate([pat[:, 0, 1], pat[:, 1, 1]])
    S = np.zeros((N_BINS, PATCH * PATCH, 512), np.float32)
    for b in range(N_BINS):
        th = 2 * np.pi * b / N_BINS
        c, s = np.cos(th), np.sin(th)
        xs = _CENTER + c * px - s * py
        ys = _CENTER + s * px + c * py
        x0 = np.clip(np.floor(xs), 0, PATCH - 2).astype(np.int64)
        y0 = np.clip(np.floor(ys), 0, PATCH - 2).astype(np.int64)
        fx = xs - x0
        fy = ys - y0
        cols = np.arange(512)
        S[b, y0 * PATCH + x0, cols] += (1 - fx) * (1 - fy)
        S[b, y0 * PATCH + x0 + 1, cols] += fx * (1 - fy)
        S[b, (y0 + 1) * PATCH + x0, cols] += (1 - fx) * fy
        S[b, (y0 + 1) * PATCH + x0 + 1, cols] += fx * fy
    return S


# NumPy constant on purpose: this module may be imported lazily inside a
# jit trace, where jnp.asarray would produce (and leak) a tracer.
_S = _build_sampling_matrices()  # (B,1024,512) float32
# Difference matrices: bit s is sign(sample[s+256] - sample[s]), so the
# subtraction folds into the sampling matrix (halves the matmul).
_D = np.ascontiguousarray(_S[:, :, N_BITS:] - _S[:, :, :N_BITS])  # (B,1024,256)


def _orientation_weights():
    """Intensity-centroid moment weights over the patch (ORB orientation),
    evaluated on the descriptor patch instead of an image-wide convolution
    (ops.detect.orientation): no convs, no gathers."""
    r = PATCH // 2 - 2  # stay inside the patch
    ys, xs = np.mgrid[0:PATCH, 0:PATCH]
    dx = (xs - _CENTER).astype(np.float32)
    dy = (ys - _CENTER).astype(np.float32)
    circle = ((dx**2 + dy**2) <= r * r).astype(np.float32)
    return (dx * circle).reshape(-1), (dy * circle).reshape(-1)


_WX, _WY = _orientation_weights()  # NumPy constants (see _S note)


def orientation_from_patches(flat_patches: jnp.ndarray) -> jnp.ndarray:
    """(K, PATCH*PATCH) -> (K,) intensity-centroid orientation (radians)."""
    hi = jax.lax.Precision.HIGHEST
    m10 = jnp.einsum("kp,p->k", flat_patches, _WX, precision=hi)
    m01 = jnp.einsum("kp,p->k", flat_patches, _WY, precision=hi)
    return jnp.arctan2(m01, m10)


@jax.jit
def describe_from_windows(
    windows: jnp.ndarray, ry: jnp.ndarray, rx: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Aligned windows (from ops.pallas.patch_kernel.extract_windows) ->
    (descriptors (K,8) uint32, orientations (K,)). Gather-free."""
    patches = patch_kernel.cut_patches(windows, ry, rx)
    K = patches.shape[0]
    flat = patches.reshape(K, PATCH * PATCH)
    theta = orientation_from_patches(flat)
    return _sample_and_pack(flat, theta), theta


def _sample_and_pack(flat: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """(K, PATCH*PATCH) patches + (K,) orientations -> packed descriptors.

    Soft bin assignment: blend the two adjacent rotation bins linearly.
    Hard quantization flips the whole pattern when a keypoint's (noisy)
    orientation crosses a bin boundary between frames, destroying
    frame-to-frame descriptor stability; the soft blend keeps the sampled
    values continuous in theta (the image is pre-blurred, so linear
    interpolation between nearby rotations is accurate).

    bf16 inputs / f32 accumulation on purpose: intensities are in [0,1]
    and the 4-tap bilinear weights in [-1,1]; the blended difference only
    feeds a sign test, so the ~0.4% bf16 input rounding can flip a bit
    only where the two BRIEF samples are already within image-noise range
    of each other. Measured end-to-end (200-frame lr ATE) to be neutral,
    at ~12x less MXU time than the f32 HIGHEST-precision form.
    """
    K = flat.shape[0]
    bin_f = jnp.mod(theta, 2 * jnp.pi) / (2 * jnp.pi) * N_BINS
    b0 = jnp.floor(bin_f).astype(jnp.int32) % N_BINS
    b1 = (b0 + 1) % N_BINS
    alpha = (bin_f - jnp.floor(bin_f)).astype(jnp.float32)
    onehot = (
        jax.nn.one_hot(b0, N_BINS, dtype=jnp.float32) * (1 - alpha)[:, None]
        + jax.nn.one_hot(b1, N_BINS, dtype=jnp.float32) * alpha[:, None]
    )  # (K,B)
    # All-bin difference sampling in ONE bf16 MXU pass (B,K,256)...
    outs = jnp.einsum(
        "kp,bpd->bkd",
        flat.astype(jnp.bfloat16),
        _D.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    # ...then the f32 one-hot bin blend (tiny contraction over B).
    diff = jnp.einsum(
        "bkd,kb->kd", outs, onehot, precision=jax.lax.Precision.DEFAULT
    )
    bits = (diff > 0).astype(jnp.uint32)
    bits = bits.reshape(K, N_WORDS, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, None, :]
    return jnp.sum(bits << shifts, axis=-1, dtype=jnp.uint32)
