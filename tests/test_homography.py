"""Homography path tests: planar synthetic scenes with known pose."""
import numpy as np
import jax
import jax.numpy as jnp

from visual_slam_tpu.ops import homography, lie, projection

INTR = np.array([481.20, 480.0, 319.5, 239.5], dtype=np.float32)


def planar_scene(rng, n=200, noise=0.0):
    """Points on the plane z=4 (cam-1 frame), two views."""
    X = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), np.full(n, 4.0)],
        axis=-1,
    ).astype(np.float32)
    w = np.array([0.05, -0.08, 0.02], np.float32)
    R = np.asarray(lie.so3_exp(jnp.asarray(w)))
    t = np.array([0.4, -0.15, 0.25], np.float32)
    X2 = X @ R.T + t
    xn1 = (X[:, :2] / X[:, 2:3]).astype(np.float32)
    xn2 = (X2[:, :2] / X2[:, 2:3]).astype(np.float32)
    if noise:
        xn1 += rng.normal(scale=noise / INTR[0], size=xn1.shape).astype(np.float32)
        xn2 += rng.normal(scale=noise / INTR[0], size=xn2.shape).astype(np.float32)
    return X, xn1, xn2, R, t


def test_dlt_homography_exact(rng):
    X, xn1, xn2, R, t = planar_scene(rng)
    H = homography.dlt_homography(jnp.asarray(xn1), jnp.asarray(xn2))
    err = homography.symmetric_transfer_error_sq(H, jnp.asarray(xn1), jnp.asarray(xn2))
    assert float(jnp.max(err)) < 1e-8
    # H must match R + t n^T / d with n=[0,0,1], d=4 up to scale.
    H_gt = R + np.outer(t, [0, 0, 1]) / 4.0
    H_np = np.asarray(H) / np.asarray(H)[2, 2]
    H_gt /= H_gt[2, 2]
    np.testing.assert_allclose(H_np, H_gt, atol=1e-3)


def test_homography_ransac_outliers(rng):
    X, xn1, xn2, R, t = planar_scene(rng, n=300, noise=0.3)
    xn2_bad = xn2.copy()
    xn2_bad[:80] = rng.uniform(-0.5, 0.5, (80, 2)).astype(np.float32)
    th = 3.0 / INTR[0]
    H, inl, n_in = homography.estimate_homography_ransac(
        jax.random.PRNGKey(0),
        jnp.asarray(xn1),
        jnp.asarray(xn2_bad),
        jnp.ones(300, bool),
        threshold=th,
    )
    inl = np.asarray(inl)
    assert inl[:80].mean() < 0.15
    assert inl[80:].mean() > 0.85


def test_recover_pose_homography(rng):
    X, xn1, xn2, R, t = planar_scene(rng, n=150)
    H = homography.dlt_homography(jnp.asarray(xn1), jnp.asarray(xn2))
    R_est, t_est, X1, good, frac = homography.recover_pose_homography(
        H, jnp.asarray(xn1), jnp.asarray(xn2), jnp.ones(150, bool)
    )
    assert float(frac) > 0.95
    np.testing.assert_allclose(np.asarray(R_est), R, atol=5e-3)
    t_unit = t / np.linalg.norm(t)
    cos = abs(np.dot(np.asarray(t_est), t_unit))
    assert cos > 0.995


def test_decompose_matches_cv2(rng):
    import cv2

    X, xn1, xn2, R, t = planar_scene(rng, n=100)
    H = np.asarray(homography.dlt_homography(jnp.asarray(xn1), jnp.asarray(xn2)))
    retval, Rs_cv, ts_cv, ns_cv = cv2.decomposeHomographyMat(
        H.astype(np.float64), np.eye(3)
    )
    Rs, ts, ns = homography.decompose_homography(jnp.asarray(H))
    # The true rotation must appear among our candidates (as it does in cv2's).
    best = min(
        float(np.abs(np.asarray(Rs[k]) - R).max()) for k in range(8)
    )
    assert best < 5e-3
