"""Two-view relative pose estimation: RANSAC essential matrix + cheirality
pose recovery, composed from the batched primitives.

TPU-native equivalent of the reference's `estimateEssential`
(src/v2/helper_functions.py:47-70) and `estimateRelativePose` (:164-209)
pair as called from the map-initialization loop (src/v2/main.py:103-114).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import epipolar, projection, ransac as ransac_mod


def estimate_essential_ransac(
    key: jax.Array,
    uv1: jnp.ndarray,
    uv2: jnp.ndarray,
    intr: jnp.ndarray,
    mask: jnp.ndarray,
    threshold: float | None = None,
    n_hyps: int = 512,
):
    """RANSAC essential-matrix estimation from pixel correspondences.

    ≙ `estimateEssential` (src/v2/helper_functions.py:47-70): normalize via
    K^{-1}, robust-fit E, score with the symmetric epipolar distance at
    threshold essTh = 3.0/fx (reference: src/v2/main.py:103).

    Returns (E, inlier_mask, n_inliers).
    """
    if threshold is None:
        threshold = 3.0 / intr[0]
    xn1 = projection.normalize_pixels(uv1, intr)
    xn2 = projection.normalize_pixels(uv2, intr)

    def solver(idx):
        return epipolar.eight_point_essential(xn1[idx], xn2[idx])

    def residual(E):
        # Symmetric epipolar distance; factor 2 matches scoring both images.
        return 0.5 * epipolar.epipolar_distance_sq(E, xn1, xn2)

    E, inliers, _, n_in = ransac_mod.ransac(
        key,
        solver,
        residual,
        n_data=uv1.shape[0],
        mask=mask,
        n_hyps=n_hyps,
        set_size=8,
        threshold_sq=threshold**2,
    )
    # Local optimization: Gauss-Newton on the (R,t) manifold over the inlier
    # set (Sampson error). Float32 linear refits cannot reach the precision
    # the inlier classification needs (see refine_essential_gn); the manifold
    # GN lands at the geometric optimum with no large SVD.
    th_sq = threshold**2
    for _ in range(3):
        E = epipolar.refine_essential_gn(
            E, xn1, xn2, inliers.astype(xn1.dtype), n_iters=4
        )
        res = 0.5 * epipolar.epipolar_distance_sq(E, xn1, xn2)
        inliers = (res < th_sq) & mask
    # One last refine on the final (largest) inlier set.
    E = epipolar.refine_essential_gn(E, xn1, xn2, inliers.astype(xn1.dtype), n_iters=4)
    return E, inliers, jnp.sum(inliers)


def estimate_relative_pose(
    E: jnp.ndarray,
    uv1: jnp.ndarray,
    uv2: jnp.ndarray,
    intr: jnp.ndarray,
    inliers: jnp.ndarray,
    distance_thresh: float = 50.0,
):
    """E + inlier correspondences -> (R, t, X1, good_mask, valid_fraction).

    ≙ `estimateRelativePose(..., "Essential")` (src/v2/helper_functions.py:
    174-195): recoverPose with distanceThresh=50, returning triangulated
    points (cam-1 frame) filtered by the cheirality mask, plus the fraction
    of inliers that pass cheirality (gated at 0.9 by src/v2/main.py:113).
    """
    xn1 = projection.normalize_pixels(uv1, intr)
    xn2 = projection.normalize_pixels(uv2, intr)
    return epipolar.recover_pose(E, xn1, xn2, inliers, distance_thresh)
