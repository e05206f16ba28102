"""Bundle-adjustment tests on synthetic problems with known ground truth
(SURVEY.md §4: golden-value tests vs closed-form scenes)."""
import numpy as np
import jax.numpy as jnp

from visual_slam_tpu.models import ba
from visual_slam_tpu.ops import lie

INTR = np.array([481.20, 480.0, 319.5, 239.5], dtype=np.float32)


def synth_problem(rng, K=6, P=300, noise_px=0.0, pose_noise=0.0, point_noise=0.0):
    """Cameras on an arc looking at a point cloud; full visibility."""
    X = np.stack(
        [
            rng.uniform(-2, 2, size=P),
            rng.uniform(-1.5, 1.5, size=P),
            rng.uniform(4, 8, size=P),
        ],
        axis=-1,
    ).astype(np.float32)
    Rs, ts, cams, pnts, uvs = [], [], [], [], []
    for k in range(K):
        w = np.array([0.01 * k, -0.04 * k, 0.015 * k], dtype=np.float32)
        R = np.asarray(lie.so3_exp(jnp.asarray(w)))
        t = np.array([0.25 * k, 0.02 * k, 0.01 * k], dtype=np.float32)
        Rs.append(R)
        ts.append(t)
        Xc = X @ R.T + t
        uv = np.stack(
            [
                INTR[0] * Xc[:, 0] / Xc[:, 2] + INTR[2],
                INTR[1] * Xc[:, 1] / Xc[:, 2] + INTR[3],
            ],
            axis=-1,
        )
        uvs.append(uv + rng.normal(scale=noise_px, size=uv.shape))
        cams.append(np.full(P, k, np.int32))
        pnts.append(np.arange(P, dtype=np.int32))
    R_gt = np.stack(Rs)
    t_gt = np.stack(ts)
    # Perturb initial estimates (keep cam 0 exact: it is the gauge anchor).
    R0 = R_gt.copy()
    t0 = t_gt.copy()
    X0 = X + rng.normal(scale=point_noise, size=X.shape).astype(np.float32)
    for k in range(1, K):
        dw = rng.normal(scale=pose_noise, size=3).astype(np.float32)
        dt = rng.normal(scale=pose_noise, size=3).astype(np.float32)
        dR = np.asarray(lie.so3_exp(jnp.asarray(dw)))
        R0[k] = dR @ R_gt[k]
        t0[k] = dR @ t_gt[k] + dt
    cam_fixed = np.zeros(K, bool)
    cam_fixed[0] = True
    prob = ba.make_problem(
        R=jnp.asarray(R0),
        t=jnp.asarray(t0),
        X=jnp.asarray(X0),
        cam=jnp.asarray(np.concatenate(cams)),
        pnt=jnp.asarray(np.concatenate(pnts)),
        uv=jnp.asarray(np.concatenate(uvs).astype(np.float32)),
        w=jnp.ones(K * P, jnp.float32),
        intr=jnp.asarray(INTR),
        cam_fixed=jnp.asarray(cam_fixed),
    )
    return prob, (R_gt, t_gt, X)


def mean_reproj_error(p):
    r, _, _, _ = ba._residuals_and_jacobians(p)
    return float(np.sqrt(np.mean(np.sum(np.asarray(r) ** 2, -1))))


def test_ba_converges_from_perturbation(rng):
    prob, (R_gt, t_gt, X_gt) = synth_problem(
        rng, pose_noise=0.03, point_noise=0.05
    )
    err0 = mean_reproj_error(prob)
    out, cost = ba.optimize(prob, n_iters=10)
    err1 = mean_reproj_error(out)
    assert err0 > 5.0
    assert err1 < 0.05
    # Poses recovered. Cam0 (at the origin) anchors rotation+translation but
    # NOT scale — the 7th gauge DOF — so compare after scale alignment.
    np.testing.assert_allclose(np.asarray(out.R), R_gt, atol=2e-3)
    s = np.linalg.norm(np.asarray(out.t[1])) / np.linalg.norm(t_gt[1])
    np.testing.assert_allclose(np.asarray(out.t) / s, t_gt, atol=2e-2)


def test_ba_noisy_observations(rng):
    prob, _ = synth_problem(rng, noise_px=0.5, pose_noise=0.02, point_noise=0.03)
    out, cost = ba.optimize(prob, n_iters=10)
    err = mean_reproj_error(out)
    assert err < 0.8  # converges to noise floor


def test_ba_respects_fixed_cam(rng):
    prob, _ = synth_problem(rng, pose_noise=0.02, point_noise=0.02)
    out, _ = ba.optimize(prob, n_iters=5)
    np.testing.assert_allclose(np.asarray(out.R[0]), np.asarray(prob.R[0]), atol=1e-7)
    np.testing.assert_allclose(np.asarray(out.t[0]), np.asarray(prob.t[0]), atol=1e-7)


def test_ba_huber_resists_outliers(rng):
    prob, (R_gt, t_gt, X_gt) = synth_problem(rng, pose_noise=0.02, point_noise=0.02)
    # Corrupt 5% of observations grossly.
    uv = np.array(prob.uv)
    n = uv.shape[0]
    bad = rng.choice(n, size=n // 20, replace=False)
    uv[bad] += rng.uniform(50, 150, size=(len(bad), 2)).astype(np.float32)
    prob = prob._replace(uv=jnp.asarray(uv))
    out, _ = ba.optimize(prob, n_iters=12)
    np.testing.assert_allclose(np.asarray(out.R[1:]), R_gt[1:], atol=5e-3)
    np.testing.assert_allclose(np.asarray(out.t[1:]), t_gt[1:], atol=5e-2)


def test_motion_only_ba(rng):
    prob, (R_gt, t_gt, X_gt) = synth_problem(rng, pose_noise=0.03, point_noise=0.0)
    # points are exact; only poses perturbed; motion-only must fix poses.
    out, _ = ba.motion_only(prob, n_iters=10)
    np.testing.assert_allclose(np.asarray(out.X), np.asarray(prob.X), atol=0)
    np.testing.assert_allclose(np.asarray(out.R), R_gt, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out.t), t_gt, atol=1e-2)


def test_ba_ignores_padding(rng):
    """Padded (w=0) observations and extra zero landmarks must not move."""
    prob, _ = synth_problem(rng, K=4, P=100, pose_noise=0.02, point_noise=0.02)
    O = prob.uv.shape[0]
    pad_obs = 64
    prob2 = prob._replace(
        cam=jnp.concatenate([prob.cam, jnp.zeros(pad_obs, jnp.int32)]),
        pnt=jnp.concatenate([prob.pnt, jnp.zeros(pad_obs, jnp.int32)]),
        uv=jnp.concatenate([prob.uv, jnp.full((pad_obs, 2), 1e6, jnp.float32)]),
        w=jnp.concatenate([prob.w, jnp.zeros(pad_obs, jnp.float32)]),
    )
    out1, c1 = ba.optimize(prob, n_iters=5)
    out2, c2 = ba.optimize(prob2, n_iters=5)
    np.testing.assert_allclose(np.asarray(out1.R), np.asarray(out2.R), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out1.t), np.asarray(out2.t), atol=1e-5)


def test_median_depth_normalize(rng):
    prob, _ = synth_problem(rng, K=3, P=50)
    valid = jnp.ones(50, bool)
    out = ba.median_depth_normalize(prob, valid)
    norms = np.linalg.norm(np.asarray(out.X), axis=-1)
    med = np.median(norms)
    assert abs(med - 1.0) < 0.05


def test_ell_path_matches_scatter(rng):
    """The ELL (gather+dense-sum) reduction path must reproduce the scatter
    path exactly — same math, different memory access pattern."""
    prob, _ = synth_problem(rng, K=5, P=120, pose_noise=0.02, point_noise=0.03)
    K, P = 5, 120
    cam_obs, cam_ok, pt_obs, pt_ok = ba.build_ell_tables(
        prob.cam, prob.pnt, np.asarray(prob.w) > 0, K, P, 200, 8
    )
    prob_ell = prob._replace(
        cam_obs=jnp.asarray(cam_obs),
        cam_obs_ok=jnp.asarray(cam_ok),
        pt_obs=jnp.asarray(pt_obs),
        pt_obs_ok=jnp.asarray(pt_ok),
    )
    out_sc, c_sc = ba.optimize(prob, n_iters=5)
    out_el, c_el = ba.optimize(prob_ell, n_iters=5)
    np.testing.assert_allclose(np.asarray(out_el.R), np.asarray(out_sc.R), atol=1e-5)
    # Summation order differs, so float noise walks along the unobservable
    # monocular scale direction — compare after scale alignment.
    s = np.linalg.norm(np.asarray(out_el.t[1])) / np.linalg.norm(np.asarray(out_sc.t[1]))
    np.testing.assert_allclose(np.asarray(out_el.t) / s, np.asarray(out_sc.t), atol=1e-3)
    np.testing.assert_allclose(float(c_el), float(c_sc), rtol=1e-3, atol=1e-6)
