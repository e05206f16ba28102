"""Generalization tests of the PRODUCTION loop-closure operating point
(VERDICT r4 next #8).

Round 4 calibrated the gate tuple — verify_min_inliers=20, cooldown=3,
warp allowance +0.08 (pipeline._close_loop) — against the single genuine
lr-traj3 revisit. These tests exercise the SAME production code path
(Slam._close_loop, with a crafted verification handle) on synthetic scenes
the values were never tuned on:

  1. a genuine revisit under monocular SCALE drift, at an inlier count in
     the permissive band (20 <= n < 30) — must be accepted and must shrink
     the loop-endpoint error;
  2. a sweep of drift magnitudes (scale 1.15x-1.6x, plus rotational
     drift) — the acceptance must hold across the band, not at one point;
  3. a geometrically FALSE closure that passes the inlier vote (25 "lucky"
     matches, the repetitive-texture failure mode) — the warp validation
     must reject it and restore the map bitwise;
  4. the cooldown=3 dispatch gate semantics.

Scene: keyframes on a circle looking inward at a point cloud, exact
projections as observations, and a smoothly accumulating world-side Sim3
drift D_k (scale s_k, yaw theta_k): estimated pose R_est = R_gt R_d(th)^T,
t_est = s_k t_gt - R_est d_k; a landmark anchored at keyframe a sits at
X_est = D_a(X_gt). Reprojection errors stay small within a covisible span
(drift varies slowly) — the self-consistent-but-drifted geometry real
monocular SLAM accumulates.
"""
import concurrent.futures

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from visual_slam_tpu.config import SlamConfig
from visual_slam_tpu.models.frontend import Features
from visual_slam_tpu.models.map_state import MapConfig
from visual_slam_tpu import pipeline as pl


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _yaw(theta):
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)


def _look_at(center, target):
    """world->cam rotation for a camera at `center` looking at `target`."""
    z = target - center
    z = z / np.linalg.norm(z)
    up = np.array([0.0, 0.0, 1.0])
    x = np.cross(z, up)
    if np.linalg.norm(x) < 1e-6:
        x = np.array([1.0, 0.0, 0.0])
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    return np.stack([x, y, z]).astype(np.float32)


def _project(R, t, X, intr):
    Xc = X @ R.T + t
    z = np.maximum(Xc[:, 2], 1e-6)
    u = intr[0] * Xc[:, 0] / z + intr[2]
    v = intr[1] * Xc[:, 1] / z + intr[3]
    return np.stack([u, v], -1).astype(np.float32), Xc[:, 2]


class RingScene:
    """K drifted keyframes on a circle + landmarks, loaded into a Slam."""

    def __init__(self, rng, K=40, n_pts=350, drift_scale=1.15,
                 drift_yaw_deg=0.0, obs_span=2):
        cfg = SlamConfig()
        cfg.map = MapConfig(max_keyframes=max(64, K), max_points=2048,
                            max_observations=16384, track_capacity=512)
        cfg.use_depth = False
        self.cfg = cfg
        self.K = K
        intr = cfg.intrinsics
        ang = np.linspace(0, 2 * np.pi * (K - 1) / K, K)
        centers = np.stack(
            [3.0 * np.cos(ang), 3.0 * np.sin(ang), 0.2 * np.sin(2 * ang)], -1
        ).astype(np.float32)
        self.R_gt = np.stack([_look_at(c, np.zeros(3)) for c in centers])
        self.t_gt = -np.einsum("kij,kj->ki", self.R_gt, centers).astype(
            np.float32
        )
        # Accumulating world-side Sim3 drift: identity at k=0.
        frac = np.linspace(0, 1, K).astype(np.float32)
        self.s_d = (1.0 + (drift_scale - 1.0) * frac).astype(np.float32)
        self.th_d = np.deg2rad(drift_yaw_deg) * frac
        self.d_d = np.stack(
            [0.3 * frac, -0.2 * frac, 0.1 * frac], -1
        ).astype(np.float32)
        self.R_est = np.stack(
            [self.R_gt[k] @ _yaw(self.th_d[k]).T for k in range(K)]
        )
        self.t_est = np.stack([
            self.s_d[k] * self.t_gt[k] - self.R_est[k] @ self.d_d[k]
            for k in range(K)
        ]).astype(np.float32)
        # Landmarks near the origin, each anchored to (first observed by)
        # a home keyframe; observed by keyframes within obs_span.
        self.X_gt = rng.uniform(-0.9, 0.9, (n_pts, 3)).astype(np.float32)
        home = rng.integers(0, K, n_pts)
        self.slam = pl.Slam(cfg)
        m = self.slam.map
        F = cfg.frontend.max_features
        for k in range(K):
            m.add_keyframe(self.R_est[k], self.t_est[k], k * 10)
            self.slam.trajectory.append(pl.FrameResult(
                k * 10, self.R_est[k].copy(), self.t_est[k].copy(), 100,
                True, ref_kf=k,
            ))
        self.pt_ids = np.zeros(n_pts, np.int64)
        desc = rng.integers(0, 2**32, (n_pts, 8), dtype=np.uint32)
        for k in range(K):
            sel = np.where(home == k)[0]
            if len(sel) == 0:
                continue
            Xe = self._drifted(self.X_gt[sel], k)
            self.pt_ids[sel] = m.add_points(Xe, desc[sel])
        for k in range(K):
            # Observations from keyframes within the covisible span, in
            # keyframe order so anchors = first observers.
            vis = np.where(
                np.minimum(np.abs(home - k), self.K - np.abs(home - k))
                <= obs_span
            )[0]
            uv, z = _project(
                self.R_est[k], self.t_est[k],
                m.pt_xyz[self.pt_ids[vis]], intr,
            )
            ok = z > 0.1
            m.add_observations(k, self.pt_ids[vis[ok]], uv[ok])
        m.refresh_scale_meas()
        self.slam._last_kf_id = K - 1
        self.slam.initialized = True
        self.slam.stats["keyframes"] = K
        self.home = home
        self.intr = intr

    def _drifted(self, X, k):
        return (self.s_d[k] * (X @ _yaw(self.th_d[k]).T) + self.d_d[k]).astype(
            np.float32
        )

    def endpoint_error(self):
        """Camera-centre error of the last keyframe vs ground truth."""
        m = self.slam.map
        c_est = -m.kf_R[self.K - 1].T @ m.kf_t[self.K - 1]
        c_gt = -self.R_gt[self.K - 1].T @ self.t_gt[self.K - 1]
        return float(np.linalg.norm(c_est - c_gt))

    def make_verify_handle(self, cur, cand, n_inl, true_pose=True):
        """Craft the _close_loop input: the verification blob as the
        production _track_step would have produced it for `cur`'s features
        against `cand`'s landmark snapshot."""
        cfg = self.cfg
        m = self.slam.map
        snap = m.local_snapshot(cand)
        M = cfg.map.track_capacity
        F = cfg.frontend.max_features
        slots = np.where(np.asarray(snap["valid"]))[0][:n_inl]
        assert len(slots) >= n_inl, "scene too sparse for requested inliers"
        if true_pose:
            # PnP recovers cur's pose in the CANDIDATE's drift frame:
            # R_corr = R_gt_cur R_d(th_cand)^T, t = s_cand t_gt - R d_cand.
            R_corr = (self.R_gt[cur] @ _yaw(self.th_d[cand]).T).astype(
                np.float32
            )
            t_corr = (
                self.s_d[cand] * self.t_gt[cur] - R_corr @ self.d_d[cand]
            ).astype(np.float32)
        else:
            # False-positive: the "verified" pose is the candidate's own
            # pose (repetitive texture matched as if cur stood at cand).
            R_corr = m.kf_R[cand].copy()
            t_corr = m.kf_t[cand].copy()
        uvs, _ = _project(R_corr, t_corr, np.asarray(snap["xyz"])[slots],
                          self.intr)
        inliers = np.zeros(M, np.float32)
        inliers[slots] = 1.0
        idx2 = np.zeros(M, np.float32)
        idx2[slots] = np.arange(n_inl)  # feature i of cur matches slot
        feat_uv = np.zeros((F, 2), np.float32)
        feat_uv[:n_inl] = uvs
        feat_valid = np.zeros(F, np.float32)
        feat_valid[:n_inl] = 1.0
        desc = np.zeros((F, 8), np.uint32)
        header = np.concatenate(
            [R_corr.reshape(9), t_corr, [n_inl], np.zeros(3)]
        ).astype(np.float32)
        blob = np.concatenate([
            header, inliers, idx2, feat_uv.reshape(-1), feat_valid,
            desc.view(np.float32).reshape(-1),
        ]).astype(np.float32)
        feats = Features(
            uv=feat_uv, desc=desc, score=np.zeros(F, np.float32),
            valid=feat_valid > 0.5,
        )
        fut = concurrent.futures.Future()
        fut.set_result((blob,))
        return dict(kf_id=cur, cand=cand, feats=feats, snap=snap, fut=fut)


class TestGenuineClosureUnderDrift:
    def test_accepts_and_corrects_scale_drift(self, rng):
        scene = RingScene(rng, drift_scale=1.15)
        s = scene.slam
        err0 = scene.endpoint_error()
        h = scene.make_verify_handle(scene.K - 1, 0, n_inl=25)
        s._close_loop(h)
        assert s.stats.get("loop_closures", 0) == 1, s.stats
        assert s.stats.get("loop_rejected_warp", 0) == 0
        err1 = scene.endpoint_error()
        assert err1 < err0 * 0.5, (err0, err1)
        # The Sim3 graph must have absorbed real scale (edge carried it).
        assert abs(s._loop_edges[-1][4]) > 0.05  # log relative scale

    @pytest.mark.parametrize(
        "drift_scale,drift_yaw", [(1.08, 0.0), (1.12, 2.0), (1.18, 4.0)]
    )
    def test_acceptance_band(self, rng, drift_scale, drift_yaw):
        """The production gates must hold across drift magnitudes they were
        never tuned on — inlier count pinned mid-band at 22."""
        scene = RingScene(
            rng, drift_scale=drift_scale, drift_yaw_deg=drift_yaw
        )
        s = scene.slam
        err0 = scene.endpoint_error()
        h = scene.make_verify_handle(scene.K - 1, 0, n_inl=22)
        s._close_loop(h)
        assert s.stats.get("loop_closures", 0) == 1, (
            drift_scale, drift_yaw, s.stats,
        )
        assert scene.endpoint_error() < err0, (drift_scale, drift_yaw)

    def test_inlier_floor_rejects_below_20(self, rng):
        scene = RingScene(rng, drift_scale=1.15)
        s = scene.slam
        h = scene.make_verify_handle(scene.K - 1, 0, n_inl=19)
        s._close_loop(h)
        assert s.stats.get("loop_closures", 0) == 0
        assert s.stats.get("loop_verify_fail", 0) == 1


class TestFalseClosureStress:
    def test_rejects_lucky_inliers_topologically_false(self, rng):
        """25 geometrically-consistent-looking 'verified' matches against a
        keyframe on the OPPOSITE side of the ring (passes the permissive
        inlier vote — the repetitive-texture failure mode). The DCS kernel
        down-weights the wildly-inconsistent edge to a near-no-op, which
        the warp validation alone cannot catch; the r5 edge-satisfaction
        gate must reject it and leave the map bitwise untouched."""
        scene = RingScene(rng, drift_scale=1.12)
        s = scene.slam
        m = s.map
        cand = scene.K // 2  # opposite side of the ring — no true revisit
        R_before = m.kf_R.copy()
        t_before = m.kf_t.copy()
        X_before = m.pt_xyz.copy()
        h = scene.make_verify_handle(
            scene.K - 1, cand, n_inl=25, true_pose=False
        )
        s._close_loop(h)
        assert s.stats.get("loop_closures", 0) == 0, s.stats
        rejected = (
            s.stats.get("loop_rejected_warp", 0)
            + s.stats.get("loop_rejected_unsatisfied", 0)
        )
        assert rejected == 1, s.stats
        assert len(s._loop_edges) == 0
        np.testing.assert_array_equal(m.kf_R, R_before)
        np.testing.assert_array_equal(m.kf_t, t_before)
        np.testing.assert_array_equal(m.pt_xyz, X_before)

    def test_rejects_garbage_pnp_pose(self, rng):
        """A false-verified pose with a random SE3 error (what a lucky-25
        PnP on repetitive texture actually returns): rejected, map
        restored."""
        from scipy.spatial.transform import Rotation

        scene = RingScene(rng, drift_scale=1.12)
        s = scene.slam
        m = s.map
        R_before, X_before = m.kf_R.copy(), m.pt_xyz.copy()
        h = scene.make_verify_handle(
            scene.K - 1, scene.K // 2, n_inl=25, true_pose=False
        )
        blob = h["fut"].result()[0]
        Rg = Rotation.from_euler(
            "xyz", [12, 8, -15], degrees=True
        ).as_matrix().astype(np.float32)
        blob[:9] = (Rg @ blob[:9].reshape(3, 3)).reshape(9)
        blob[9:12] += np.array([0.4, -0.3, 0.5], np.float32)
        fut = concurrent.futures.Future()
        fut.set_result((blob,))
        h["fut"] = fut
        s._close_loop(h)
        assert s.stats.get("loop_closures", 0) == 0, s.stats
        assert len(s._loop_edges) == 0
        np.testing.assert_array_equal(m.kf_R, R_before)
        np.testing.assert_array_equal(m.pt_xyz, X_before)


class TestSafetyInvariant:
    @pytest.mark.parametrize("drift_scale,drift_yaw", [
        (1.25, 5.0), (1.45, 8.0), (1.7, 12.0),
    ])
    def test_closure_helps_or_is_a_clean_no_op(self, rng, drift_scale,
                                               drift_yaw):
        """Safety property across drift magnitudes well past the tuned
        regime: _close_loop either ACCEPTS and improves the loop-endpoint
        error, or REJECTS and leaves the map bitwise untouched. It may
        never half-apply a correction or make the endpoint worse."""
        scene = RingScene(
            rng, drift_scale=drift_scale, drift_yaw_deg=drift_yaw
        )
        s = scene.slam
        m = s.map
        err0 = scene.endpoint_error()
        R_before, X_before = m.kf_R.copy(), m.pt_xyz.copy()
        h = scene.make_verify_handle(scene.K - 1, 0, n_inl=25)
        s._close_loop(h)
        if s.stats.get("loop_closures", 0) == 1:
            assert scene.endpoint_error() < err0
        else:
            np.testing.assert_array_equal(m.kf_R, R_before)
            np.testing.assert_array_equal(m.pt_xyz, X_before)


class TestCooldownGate:
    def test_dispatch_suppressed_within_cooldown(self, rng):
        scene = RingScene(rng, K=20)
        s = scene.slam
        F = s.cfg.frontend.max_features
        desc = rng.integers(0, 2**32, (F, 8), dtype=np.uint32)
        valid = np.ones(F, bool)
        for k in range(18):
            s._loop_db.add(k, desc, valid)
        feats = Features(
            uv=np.zeros((F, 2), np.float32), desc=desc,
            score=np.zeros(F, np.float32), valid=valid,
        )
        s._last_loop_kf = 14
        assert s._dispatch_loop_scores(17, feats) is None  # 3 <= cooldown
        s._last_loop_kf = 13
        out = s._dispatch_loop_scores(17, feats)  # 4 > cooldown: dispatched
        assert out is not None
