"""Geometry op tests against synthetic ground truth and the cv2 oracle
(the test strategy SURVEY.md §4 prescribes: closed-form cases + goldens)."""
import numpy as np
import jax
import jax.numpy as jnp

from visual_slam_tpu.ops import epipolar, lie, pnp, projection, triangulate, twoview

INTR = np.array([481.20, 480.0, 319.5, 239.5], dtype=np.float32)  # ICL-NUIM


def make_scene(rng, n=200, noise=0.0):
    """Random points in front of two cameras; returns pixels + GT pose."""
    X = np.stack(
        [
            rng.uniform(-2, 2, size=n),
            rng.uniform(-1.5, 1.5, size=n),
            rng.uniform(4, 10, size=n),
        ],
        axis=-1,
    ).astype(np.float32)
    # Camera 1 at origin; camera 2 rotated + translated (cam1->cam2: X2 = R X1 + t).
    w = np.array([0.02, -0.1, 0.03], dtype=np.float32)
    R = np.asarray(lie.so3_exp(jnp.asarray(w)))
    t = np.array([0.5, -0.1, 0.2], dtype=np.float32)
    X2 = X @ R.T + t
    uv1 = np.asarray(
        projection.denormalize(jnp.asarray(X[:, :2] / X[:, 2:3]), jnp.asarray(INTR))
    )
    uv2 = np.asarray(
        projection.denormalize(jnp.asarray(X2[:, :2] / X2[:, 2:3]), jnp.asarray(INTR))
    )
    if noise:
        uv1 = uv1 + rng.normal(scale=noise, size=uv1.shape).astype(np.float32)
        uv2 = uv2 + rng.normal(scale=noise, size=uv2.shape).astype(np.float32)
    return X, uv1.astype(np.float32), uv2.astype(np.float32), R, t


def test_normalize_matches_cv2(rng):
    import cv2

    uv = rng.uniform(0, 640, size=(50, 2)).astype(np.float32)
    K = np.array(
        [[INTR[0], 0, INTR[2]], [0, INTR[1], INTR[3]], [0, 0, 1]], dtype=np.float64
    )
    got = np.asarray(projection.normalize_pixels(jnp.asarray(uv), jnp.asarray(INTR)))
    want = cv2.undistortPoints(uv[:, None, :].astype(np.float64), K, None).squeeze(1)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_triangulate_dlt_exact(rng):
    X, uv1, uv2, R, t = make_scene(rng, n=100)
    P1 = np.asarray(
        projection.projection_matrix(jnp.eye(4), jnp.asarray(INTR))
    )
    T_cw2 = np.asarray(lie.make_T(jnp.asarray(R), jnp.asarray(t)))
    P2 = np.asarray(projection.projection_matrix(jnp.asarray(T_cw2), jnp.asarray(INTR)))
    Xh = triangulate.triangulate_dlt(
        jnp.asarray(P1), jnp.asarray(P2), jnp.asarray(uv1), jnp.asarray(uv2)
    )
    Xr = np.asarray(triangulate.dehomogenize(Xh))
    np.testing.assert_allclose(Xr, X, atol=5e-2, rtol=1e-3)


def test_triangulate_matches_cv2(rng):
    import cv2

    X, uv1, uv2, R, t = make_scene(rng, n=64)
    P1 = np.asarray(projection.projection_matrix(jnp.eye(4), jnp.asarray(INTR)))
    T_cw2 = np.asarray(lie.make_T(jnp.asarray(R), jnp.asarray(t)))
    P2 = np.asarray(projection.projection_matrix(jnp.asarray(T_cw2), jnp.asarray(INTR)))
    Xh = triangulate.triangulate_dlt(
        jnp.asarray(P1), jnp.asarray(P2), jnp.asarray(uv1), jnp.asarray(uv2)
    )
    ours = np.asarray(triangulate.dehomogenize(Xh))
    cv = cv2.triangulatePoints(
        P1.astype(np.float64), P2.astype(np.float64), uv1.T.astype(np.float64), uv2.T.astype(np.float64)
    )
    cv = (cv[:3] / cv[3]).T
    np.testing.assert_allclose(ours, cv, atol=1e-2, rtol=1e-3)


def test_triangulate_midpoint_exact(rng):
    X, uv1, uv2, R, t = make_scene(rng, n=50)
    xn1 = projection.normalize_pixels(jnp.asarray(uv1), jnp.asarray(INTR))
    xn2 = projection.normalize_pixels(jnp.asarray(uv2), jnp.asarray(INTR))
    got = np.asarray(
        triangulate.triangulate_midpoint(
            jnp.eye(3), jnp.zeros(3), jnp.asarray(R), jnp.asarray(t), xn1, xn2
        )
    )
    np.testing.assert_allclose(got, X, atol=5e-2, rtol=1e-3)


def test_eight_point_essential_exact(rng):
    X, uv1, uv2, R, t = make_scene(rng, n=100)
    xn1 = projection.normalize_pixels(jnp.asarray(uv1), jnp.asarray(INTR))
    xn2 = projection.normalize_pixels(jnp.asarray(uv2), jnp.asarray(INTR))
    E = epipolar.eight_point_essential(xn1, xn2)
    # Epipolar constraint holds for every correspondence.
    res = np.asarray(epipolar.sampson_error_sq(E, xn1, xn2))
    assert np.max(res) < 1e-7
    # And E matches [t]x R up to scale/sign.
    E_gt = np.asarray(lie.hat(jnp.asarray(t))) @ R
    E_gt /= np.linalg.norm(E_gt)
    E_np = np.asarray(E) / np.linalg.norm(np.asarray(E))
    err = min(np.abs(E_np - E_gt).max(), np.abs(E_np + E_gt).max())
    assert err < 5e-3  # f32 eigh on the 9x9 normal matrix; poses get refined downstream


def test_recover_pose_exact(rng):
    X, uv1, uv2, R, t = make_scene(rng, n=150)
    xn1 = projection.normalize_pixels(jnp.asarray(uv1), jnp.asarray(INTR))
    xn2 = projection.normalize_pixels(jnp.asarray(uv2), jnp.asarray(INTR))
    E = epipolar.eight_point_essential(xn1, xn2)
    mask = jnp.ones(150, dtype=bool)
    R_est, t_est, X1, good, frac = epipolar.recover_pose(E, xn1, xn2, mask)
    np.testing.assert_allclose(np.asarray(R_est), R, atol=1e-3)
    t_unit = t / np.linalg.norm(t)
    np.testing.assert_allclose(np.asarray(t_est), t_unit, atol=1e-3)
    assert float(frac) > 0.99
    # Triangulated cam-1-frame points match GT up to the monocular scale.
    scale = np.linalg.norm(t)
    np.testing.assert_allclose(np.asarray(X1)[good] * scale, X[np.asarray(good)], atol=0.1, rtol=5e-3)


def test_essential_ransac_with_outliers(rng):
    X, uv1, uv2, R, t = make_scene(rng, n=300, noise=0.3)
    # Corrupt 30% of matches.
    n_bad = 90
    uv2_bad = uv2.copy()
    uv2_bad[:n_bad] = rng.uniform(0, 640, size=(n_bad, 2)).astype(np.float32)
    key = jax.random.PRNGKey(0)
    E, inliers, n_in = twoview.estimate_essential_ransac(
        key,
        jnp.asarray(uv1),
        jnp.asarray(uv2_bad),
        jnp.asarray(INTR),
        jnp.ones(300, dtype=bool),
    )
    inl = np.asarray(inliers)
    assert inl[:n_bad].mean() < 0.15  # outliers rejected
    assert inl[n_bad:].mean() > 0.9  # true matches kept
    R_est, t_est, X1, good, frac = twoview.estimate_relative_pose(
        E, jnp.asarray(uv1), jnp.asarray(uv2_bad), jnp.asarray(INTR), inliers
    )
    # 0.3 px noise + monocular scale: allow ~1 degree on the direction.
    np.testing.assert_allclose(np.asarray(R_est), R, atol=1e-2)
    cos = np.dot(np.asarray(t_est), t / np.linalg.norm(t))
    assert cos > 0.999


def test_pnp_dlt_exact(rng):
    X, uv1, _, _, _ = make_scene(rng, n=64)
    # World->cam transform to recover: put camera at a pose, project.
    w = np.array([0.1, 0.2, -0.05], dtype=np.float32)
    R_cw = np.asarray(lie.so3_exp(jnp.asarray(w)))
    t_cw = np.array([0.3, -0.2, 0.5], dtype=np.float32)
    uv, z = projection.project(
        jnp.asarray(R_cw), jnp.asarray(t_cw), jnp.asarray(X), jnp.asarray(INTR)
    )
    xn = projection.normalize_pixels(uv, jnp.asarray(INTR))
    R_est, t_est = pnp.pnp_dlt(jnp.asarray(X), xn)
    np.testing.assert_allclose(np.asarray(R_est), R_cw, atol=1e-3)
    np.testing.assert_allclose(np.asarray(t_est), t_cw, atol=1e-2)


def test_pnp_ransac_with_outliers_and_guess(rng):
    X, _, _, _, _ = make_scene(rng, n=256)
    w = np.array([0.1, 0.2, -0.05], dtype=np.float32)
    R_cw = np.asarray(lie.so3_exp(jnp.asarray(w)))
    t_cw = np.array([0.3, -0.2, 0.5], dtype=np.float32)
    uv, _ = projection.project(
        jnp.asarray(R_cw), jnp.asarray(t_cw), jnp.asarray(X), jnp.asarray(INTR)
    )
    uv = np.array(uv)
    uv[:60] = rng.uniform(0, 640, size=(60, 2)).astype(np.float32)  # outliers
    uv += rng.normal(scale=0.3, size=uv.shape).astype(np.float32)
    guess_R = np.asarray(lie.so3_exp(jnp.asarray(w * 0.9)))
    guess_t = t_cw + 0.05
    R_est, t_est, inliers, n_in = pnp.solve_pnp_ransac(
        jax.random.PRNGKey(1),
        jnp.asarray(X),
        jnp.asarray(uv),
        jnp.asarray(INTR),
        jnp.ones(256, dtype=bool),
        guess_R=jnp.asarray(guess_R),
        guess_t=jnp.asarray(guess_t),
    )
    np.testing.assert_allclose(np.asarray(R_est), R_cw, atol=2e-3)
    np.testing.assert_allclose(np.asarray(t_est), t_cw, atol=2e-2)
    assert int(n_in) > 180


def test_pnp_tracked_good_prior(rng):
    """Tiered PnP: a frame-rate motion prior must recover the pose through
    the cheap GN branch despite 25% outlier matches."""
    X, _, _, _, _ = make_scene(rng, n=256)
    w = np.array([0.1, 0.2, -0.05], dtype=np.float32)
    R_cw = np.asarray(lie.so3_exp(jnp.asarray(w)))
    t_cw = np.array([0.3, -0.2, 0.5], dtype=np.float32)
    uv, _ = projection.project(
        jnp.asarray(R_cw), jnp.asarray(t_cw), jnp.asarray(X), jnp.asarray(INTR)
    )
    uv = np.array(uv)
    uv[:60] = rng.uniform(0, 640, size=(60, 2)).astype(np.float32)
    uv += rng.normal(scale=0.3, size=uv.shape).astype(np.float32)
    guess_R = np.asarray(lie.so3_exp(jnp.asarray(w * 0.9)))
    guess_t = t_cw + 0.05
    R_est, t_est, inliers, n_in = pnp.solve_pnp_tracked(
        jax.random.PRNGKey(1),
        jnp.asarray(X),
        jnp.asarray(uv),
        jnp.asarray(INTR),
        jnp.ones(256, dtype=bool),
        guess_R=jnp.asarray(guess_R),
        guess_t=jnp.asarray(guess_t),
    )
    np.testing.assert_allclose(np.asarray(R_est), R_cw, atol=2e-3)
    np.testing.assert_allclose(np.asarray(t_est), t_cw, atol=2e-2)
    assert int(n_in) > 180


def test_pnp_tracked_bad_prior_falls_back(rng):
    """Tiered PnP: a garbage prior (relocalization seed) must auto-select
    the RANSAC branch and still recover the pose."""
    X, _, _, _, _ = make_scene(rng, n=256)
    w = np.array([0.1, 0.2, -0.05], dtype=np.float32)
    R_cw = np.asarray(lie.so3_exp(jnp.asarray(w)))
    t_cw = np.array([0.3, -0.2, 0.5], dtype=np.float32)
    uv, _ = projection.project(
        jnp.asarray(R_cw), jnp.asarray(t_cw), jnp.asarray(X), jnp.asarray(INTR)
    )
    uv = np.array(uv) + rng.normal(scale=0.3, size=(256, 2)).astype(np.float32)
    # Prior far from the truth: a wild rotation + offset.
    bad_R = np.asarray(lie.so3_exp(jnp.asarray(np.array([2.0, -1.5, 0.8], np.float32))))
    bad_t = t_cw + np.array([3.0, -2.0, 5.0], np.float32)
    R_est, t_est, _, n_in = pnp.solve_pnp_tracked(
        jax.random.PRNGKey(3),
        jnp.asarray(X),
        jnp.asarray(uv),
        jnp.asarray(INTR),
        jnp.ones(256, dtype=bool),
        guess_R=jnp.asarray(bad_R),
        guess_t=jnp.asarray(bad_t),
        n_hyps=256,
    )
    np.testing.assert_allclose(np.asarray(R_est), R_cw, atol=2e-3)
    np.testing.assert_allclose(np.asarray(t_est), t_cw, atol=3e-2)
    assert int(n_in) > 200


def test_pnp_matches_cv2(rng):
    import cv2

    X, _, _, _, _ = make_scene(rng, n=128)
    w = np.array([-0.2, 0.1, 0.3], dtype=np.float32)
    R_cw = np.asarray(lie.so3_exp(jnp.asarray(w)))
    t_cw = np.array([0.1, 0.4, -0.3], dtype=np.float32)
    uv, _ = projection.project(
        jnp.asarray(R_cw), jnp.asarray(t_cw), jnp.asarray(X), jnp.asarray(INTR)
    )
    uv = np.asarray(uv) + rng.normal(scale=0.2, size=(128, 2)).astype(np.float32)
    K = np.array(
        [[INTR[0], 0, INTR[2]], [0, INTR[1], INTR[3]], [0, 0, 1]], dtype=np.float64
    )
    ok, rvec, tvec, _ = cv2.solvePnPRansac(
        X[:, None, :].astype(np.float64), uv[:, None, :].astype(np.float64), K, None
    )
    assert ok
    R_est, t_est, _, _ = pnp.solve_pnp_ransac(
        jax.random.PRNGKey(2),
        jnp.asarray(X),
        jnp.asarray(uv),
        jnp.asarray(INTR),
        jnp.ones(128, dtype=bool),
    )
    R_cv, _ = cv2.Rodrigues(rvec)
    np.testing.assert_allclose(np.asarray(R_est), R_cv, atol=2e-3)
    np.testing.assert_allclose(np.asarray(t_est), tvec.squeeze(), atol=2e-2)


def test_triangulate_nviews(rng):
    """Batched n-view DLT vs the reference's per-point SVD formulation
    (helper_functions.py:330-348) and mask semantics."""
    n_pts, n_views = 40, 5
    X = rng.uniform(-2, 2, size=(n_pts, 3)).astype(np.float64)
    X[:, 2] += 6.0
    K = np.array(
        [[INTR[0], 0, INTR[2]], [0, INTR[1], INTR[3]], [0, 0, 1]], np.float64
    )
    Ps, uvs = [], []
    for v in range(n_views):
        w = rng.normal(scale=0.05, size=3)
        Rv = np.asarray(lie.so3_exp(jnp.asarray(w)))
        tv = np.array([0.4 * v - 1.0, 0.1 * v, 0.05 * v])
        P = K @ np.concatenate([Rv, tv[:, None]], axis=1)
        Xc = X @ Rv.T + tv
        uv = Xc[:, :2] / Xc[:, 2:3] * np.array([INTR[0], INTR[1]]) + np.array(
            [INTR[2], INTR[3]]
        )
        Ps.append(P)
        uvs.append(uv)
    P_all = np.stack(Ps).astype(np.float32)  # (V,3,4)
    uv_all = np.stack(uvs, axis=1).astype(np.float32)  # (N,V,2)

    Xh = triangulate.triangulate_nviews(jnp.asarray(P_all), jnp.asarray(uv_all))
    ours = np.asarray(triangulate.dehomogenize(Xh))

    # Oracle: the reference's 3n x (4+n) SVD system, per point.
    def ref_nviews(P_list, ip_list):
        n = len(P_list)
        M = np.zeros([3 * n, 4 + n])
        for i, (x, p) in enumerate(zip(ip_list, P_list)):
            M[3 * i : 3 * i + 3, :4] = p
            M[3 * i : 3 * i + 3, 4 + i] = -x
        V = np.linalg.svd(M)[-1]
        Xh = V[-1, :4]
        return Xh[:3] / Xh[3]

    want = np.array(
        [
            ref_nviews(Ps, [np.append(uv_all[i, v], 1.0) for v in range(n_views)])
            for i in range(n_pts)
        ]
    )
    # Noise-free, both formulations recover the exact null space / GT.
    np.testing.assert_allclose(ours, want, atol=1e-3, rtol=1e-4)
    np.testing.assert_allclose(ours, X, atol=1e-3, rtol=1e-4)

    # Noisy measurements: stays close to GT (the two formulations weight
    # noise differently, so GT — not the oracle — is the noisy yardstick).
    uv_noisy = uv_all + rng.normal(scale=0.3, size=uv_all.shape).astype(np.float32)
    Xn = np.asarray(
        triangulate.dehomogenize(
            triangulate.triangulate_nviews(
                jnp.asarray(P_all), jnp.asarray(uv_noisy)
            )
        )
    )
    np.testing.assert_allclose(Xn, X, atol=5e-2, rtol=5e-3)

    # Mask semantics: zero-weight padding views must not perturb the result.
    P_pad = np.concatenate([P_all, np.zeros((2, 3, 4), np.float32)])
    uv_pad = np.concatenate(
        [uv_noisy, rng.uniform(0, 640, (n_pts, 2, 2)).astype(np.float32)], axis=1
    )
    w = np.concatenate(
        [np.ones((n_pts, n_views), np.float32), np.zeros((n_pts, 2), np.float32)],
        axis=1,
    )
    Xh_pad = triangulate.triangulate_nviews(
        jnp.asarray(P_pad), jnp.asarray(uv_pad), jnp.asarray(w)
    )
    padded = np.asarray(triangulate.dehomogenize(Xh_pad))
    np.testing.assert_allclose(padded, Xn, atol=1e-4)
