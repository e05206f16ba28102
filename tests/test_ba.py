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
    prob, meta = ba.make_problem(
        R=R0,
        t=t0,
        X=X0,
        cam=np.concatenate(cams),
        pnt=np.concatenate(pnts),
        uv=np.concatenate(uvs).astype(np.float32),
        w=np.ones(K * P, np.float32),
        intr=INTR,
        cam_fixed=cam_fixed,
    )
    return prob, (R_gt, t_gt, X)


def mean_reproj_error(p):
    """Weighted RMS reprojection error over real (w>0) slots."""
    err, w = ba.reproj_errors(p)
    err = np.asarray(err)
    w = np.asarray(w)
    return float(np.sqrt((err**2 * w).sum() / max(w.sum(), 1.0)))


def test_planar_packing_roundtrip(rng):
    """pack_planar groups slots by landmark and preserves every valid obs."""
    O = 500
    cam = rng.integers(0, 7, O).astype(np.int32)
    pnt = rng.integers(0, 90, O).astype(np.int32)
    uv = rng.normal(size=(O, 2)).astype(np.float32)
    w = (rng.uniform(size=O) > 0.2).astype(np.float32)
    cam_s, uv_s, w_s, pt_valid, pt_ids, meta = ba.pack_planar(cam, pnt, uv, w)
    N = len(cam_s)
    P = len(pt_ids)
    Q = N // P
    assert float(w_s.sum()) == float(w.sum())
    filled = np.where(meta.slot_obs >= 0)[0]
    rows = meta.slot_obs[filled]
    # Slot s holds an observation of packed landmark s // Q.
    np.testing.assert_array_equal(pt_ids[filled // Q], pnt[rows])
    np.testing.assert_array_equal(cam_s[filled], cam[rows])
    np.testing.assert_allclose(uv_s[0, filled], uv[rows, 0])
    np.testing.assert_allclose(uv_s[1, filled], uv[rows, 1])


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
    # Corrupt 5% of real observations grossly.
    uv = np.array(prob.uv)
    w = np.asarray(prob.w)
    real = np.where(w > 0)[0]
    bad = rng.choice(real, size=len(real) // 20, replace=False)
    uv[:, bad] += rng.uniform(50, 150, size=(2, len(bad))).astype(np.float32)
    prob = prob._replace(uv=jnp.asarray(uv))
    out, _ = ba.optimize(prob, n_iters=12)
    np.testing.assert_allclose(np.asarray(out.R[1:]), R_gt[1:], atol=5e-3)
    # Monocular scale is an exact gauge freedom here (no scale edges): the
    # direct Schur solve may slide along it, so compare scale-aligned.
    s = np.linalg.norm(np.asarray(out.t[1])) / np.linalg.norm(t_gt[1])
    np.testing.assert_allclose(np.asarray(out.t[1:]) / s, t_gt[1:], atol=5e-2)


def test_motion_only_ba(rng):
    """points_fixed solve ≙ motionOnlyBundleAdjustement (LocalBA.py:195-229);
    the production per-frame variant is ops/pnp.pnp_gauss_newton."""
    prob, (R_gt, t_gt, X_gt) = synth_problem(rng, pose_noise=0.03, point_noise=0.0)
    # points are exact; only poses perturbed; motion-only must fix poses.
    out, _ = ba.optimize(prob, n_iters=10, points_fixed=True)
    np.testing.assert_allclose(np.asarray(out.X), np.asarray(prob.X), atol=0)
    np.testing.assert_allclose(np.asarray(out.R), R_gt, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out.t), t_gt, atol=1e-2)


def test_ba_ignores_zero_weight_obs(rng):
    """w=0 observations are dropped by the packer: appending garbage rows at
    w=0 must yield a numerically identical optimization."""
    O = 400
    cam = rng.integers(0, 4, O).astype(np.int32)
    pnt = rng.integers(0, 80, O).astype(np.int32)
    uv = rng.uniform(0, 600, size=(O, 2)).astype(np.float32)
    w = np.ones(O, np.float32)
    X = np.stack(
        [rng.uniform(-2, 2, 80), rng.uniform(-1.5, 1.5, 80), rng.uniform(4, 8, 80)],
        -1,
    ).astype(np.float32)
    R = np.tile(np.eye(3, dtype=np.float32), (4, 1, 1))
    t = rng.normal(scale=0.05, size=(4, 3)).astype(np.float32)
    cam_fixed = np.array([True, False, False, False])
    args = dict(R=R, t=t, X=X, intr=INTR, cam_fixed=cam_fixed)
    p1, _ = ba.make_problem(cam=cam, pnt=pnt, uv=uv, w=w, **args)
    pad = 57
    p2, _ = ba.make_problem(
        cam=np.concatenate([cam, np.zeros(pad, np.int32)]),
        pnt=np.concatenate([pnt, np.zeros(pad, np.int32)]),
        uv=np.concatenate([uv, np.full((pad, 2), 1e6, np.float32)]),
        w=np.concatenate([w, np.zeros(pad, np.float32)]),
        **args,
    )
    out1, c1 = ba.optimize(p1, n_iters=3)
    out2, c2 = ba.optimize(p2, n_iters=3)
    np.testing.assert_allclose(np.asarray(out1.R), np.asarray(out2.R), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out1.t), np.asarray(out2.t), atol=1e-6)


def test_median_depth_normalize(rng):
    prob, _ = synth_problem(rng, K=3, P=50)
    out = ba.median_depth_normalize(prob)
    norms = np.linalg.norm(np.asarray(out.X), axis=-1)
    valid = np.asarray(prob.pt_valid) > 0
    med = np.median(norms[valid])
    assert abs(med - 1.0) < 0.05


def test_chol_and_cg_solvers_match(rng):
    """The explicit-Schur Cholesky path and the implicit-matvec CG path must
    agree — same normal equations, different solve."""
    prob, _ = synth_problem(rng, K=5, P=120, pose_noise=0.02, point_noise=0.03)
    out_ch, c_ch = ba.optimize(prob, n_iters=5, solver="chol")
    out_cg, c_cg = ba.optimize(prob, n_iters=5, cg_iters=40, solver="cg")
    np.testing.assert_allclose(np.asarray(out_cg.R), np.asarray(out_ch.R), atol=1e-4)
    s = np.linalg.norm(np.asarray(out_cg.t[1])) / np.linalg.norm(
        np.asarray(out_ch.t[1])
    )
    np.testing.assert_allclose(np.asarray(out_cg.t) / s, np.asarray(out_ch.t), atol=1e-3)
    np.testing.assert_allclose(float(c_cg), float(c_ch), rtol=1e-3, atol=1e-6)


def test_scale_edge_jacobians_closed_form(rng):
    """The closed-form scale-edge Jacobians must match finite differences."""
    import jax

    prob, _ = synth_problem(rng, K=4, P=60, pose_noise=0.05)
    se_i = np.array([0, 1, 2], np.int32)
    se_j = np.array([1, 2, 3], np.int32)
    se_meas = np.array([0.1, 0.3, 0.2], np.float32)
    se_w = np.ones(3, np.float32)
    p = prob._replace(
        se_i=jnp.asarray(se_i), se_j=jnp.asarray(se_j),
        se_meas=jnp.asarray(se_meas), se_w=jnp.asarray(se_w),
    )
    r0, Ji, Jj = jax.jit(ba._scale_edge_terms)(p)
    eps = 1e-4
    for e in range(3):
        for d in range(6):
            delta = np.zeros(6, np.float32)
            delta[d] = eps
            dR, dt = jax.tree.map(np.asarray, lie.se3_exp(jnp.asarray(delta)))
            # Perturb pose i.
            R2 = np.array(p.R)
            t2 = np.array(p.t)
            i = se_i[e]
            R2[i] = dR @ R2[i]
            t2[i] = dR @ t2[i] + dt
            r1, _, _ = jax.jit(ba._scale_edge_terms)(
                p._replace(R=jnp.asarray(R2), t=jnp.asarray(t2))
            )
            fd = (float(r1[e]) - float(r0[e])) / eps
            np.testing.assert_allclose(float(Ji[e, d]), fd, atol=2e-3)


def _synth_with_depth(rng, K=5, P=120, scale0=1.4):
    """Scale-ambiguous monocular problem + metric depth measurements.

    Initial state is the GT scene scaled by `scale0` — invisible to the
    reprojection cost (pure gauge direction) but wrong against the
    inverse-depth measurements, which carry the true metric scale.
    """
    X = np.stack(
        [rng.uniform(-2, 2, P), rng.uniform(-1.5, 1.5, P), rng.uniform(4, 8, P)],
        -1,
    ).astype(np.float32)
    Rs, ts, cams, pnts, uvs, ds = [], [], [], [], [], []
    for k in range(K):
        w = np.array([0.01 * k, -0.03 * k, 0.02 * k], np.float32)
        R = np.asarray(lie.so3_exp(jnp.asarray(w)))
        t = np.array([0.3 * k, 0.02 * k, 0.0], np.float32)
        Rs.append(R)
        ts.append(t)
        Xc = X @ R.T + t
        uv = np.stack(
            [
                INTR[0] * Xc[:, 0] / Xc[:, 2] + INTR[2],
                INTR[1] * Xc[:, 1] / Xc[:, 2] + INTR[3],
            ],
            -1,
        )
        uvs.append(uv)
        ds.append(Xc[:, 2])  # metric depth measurement (true scale)
        cams.append(np.full(P, k, np.int32))
        pnts.append(np.arange(P, dtype=np.int32))
    R_gt, t_gt = np.stack(Rs), np.stack(ts)
    cam_fixed = np.zeros(K, bool)
    cam_fixed[0] = True  # t_gt[0]=0: scaling is exactly gauge, cam0 unmoved
    prob, meta = ba.make_problem(
        R=R_gt,
        t=t_gt * scale0,
        X=X * scale0,
        cam=np.concatenate(cams),
        pnt=np.concatenate(pnts),
        uv=np.concatenate(uvs).astype(np.float32),
        w=np.ones(K * P, np.float32),
        intr=INTR,
        cam_fixed=cam_fixed,
        depth=np.concatenate(ds).astype(np.float32),
        depth_weight=1.0,
    )
    return prob, meta, (R_gt, t_gt, X)


def test_depth_residual_recovers_metric_scale(rng):
    """The RGB-D inverse-depth residual pins the monocular scale gauge:
    from a 1.4x-scaled init, use_depth=True pulls translations and points
    back to metric, while use_depth=False leaves the scale untouched
    (reprojection cost is scale-blind)."""
    prob, meta, (R_gt, t_gt, X_gt) = _synth_with_depth(rng)
    out, _ = ba.optimize(prob, n_iters=15, use_depth=True)
    # Translation of the last camera recovers metric scale.
    np.testing.assert_allclose(np.asarray(out.t)[-1], t_gt[-1], atol=5e-3)
    real = np.asarray(meta.pt_ids) >= 0
    X_out = np.asarray(out.X)[real]
    np.testing.assert_allclose(
        X_out, X_gt[np.asarray(meta.pt_ids)[real]], atol=2e-2
    )
    # Without the depth rows, the scaled solution is already optimal.
    out2, _ = ba.optimize(prob, n_iters=15, use_depth=False)
    np.testing.assert_allclose(
        np.asarray(out2.t)[-1], 1.4 * t_gt[-1], atol=5e-3
    )


def test_depth_residual_zero_weight_is_noop(rng):
    """use_depth=True with all-zero dw must match use_depth=False exactly."""
    prob, _ = synth_problem(rng, K=4, P=80, pose_noise=0.03, point_noise=0.05)
    out_a, cost_a = ba.optimize(prob, n_iters=6, use_depth=True)
    out_b, cost_b = ba.optimize(prob, n_iters=6, use_depth=False)
    np.testing.assert_allclose(float(cost_a), float(cost_b), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out_a.t), np.asarray(out_b.t), atol=1e-6
    )
