"""Integration tests: full pipeline on real ICL-NUIM frames vs ground truth
(the ATE-RMSE integration tests SURVEY.md §4 calls for)."""
import os

import numpy as np
import pytest

DATA = "/root/reference/data/ICL_NUIM"

pytestmark = pytest.mark.skipif(
    not os.path.exists(DATA), reason="ICL-NUIM dataset not available"
)


def test_dataset_reader():
    from visual_slam_tpu.utils.dataset import ICLNUIMDataset

    ds = ICLNUIMDataset(DATA)
    assert len(ds) == 1241
    g = ds.gray(0)
    assert g.shape == (480, 640) and g.dtype == np.float32
    assert 0.0 <= g.min() and g.max() <= 1.0
    d = ds.depth(0)
    assert d.shape == (480, 640)
    assert 0.5 < np.median(d[d > 0]) < 10.0  # metres, indoor scene
    gt = ds.ground_truth()
    assert gt.shape[0] == 1240
    # Rotations orthonormal.
    RRt = gt[0, :3, :3] @ gt[0, :3, :3].T
    np.testing.assert_allclose(RRt, np.eye(3), atol=1e-6)


def test_umeyama_alignment(rng):
    from visual_slam_tpu.utils.evaluate import ate_rmse, umeyama

    src = rng.normal(size=(50, 3))
    R_gt, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(R_gt) < 0:
        R_gt[:, 0] *= -1
    dst = 2.5 * src @ R_gt.T + np.array([1.0, -2.0, 3.0])
    s, R, t = umeyama(src, dst, with_scale=True)
    assert abs(s - 2.5) < 1e-6
    np.testing.assert_allclose(R, R_gt, atol=1e-6)
    rmse, _ = ate_rmse(src, dst, align_scale=True)
    assert rmse < 1e-6


def test_slam_end_to_end_short():
    """Init + tracking on the first 110 frames; ATE must be small."""
    from visual_slam_tpu.config import SlamConfig
    from visual_slam_tpu.pipeline import run_sequence
    from visual_slam_tpu.utils.dataset import ICLNUIMDataset
    from visual_slam_tpu.utils.evaluate import ate_rmse

    ds = ICLNUIMDataset(DATA)
    cfg = SlamConfig()
    slam = run_sequence(ds, cfg, 0, 110)
    assert slam.initialized, "pipeline must initialize within 110 frames"
    assert slam.map.n_pt > 50
    idxs, est = slam.positions()
    assert len(idxs) > 30
    gt = ds.ground_truth()
    gt_pos = gt[np.clip(idxs, 0, len(gt) - 1), :3, 3]
    rmse, _ = ate_rmse(est, gt_pos, align_scale=True)
    assert rmse < 0.10, f"ATE RMSE {rmse:.3f} m too high"


def test_relocalization_recovers_from_garbage_frames():
    """Feed noise frames mid-sequence: tracking must fail, then relocalize
    once real frames resume (capability the reference lacks, SURVEY.md §5)."""
    import numpy as np

    from visual_slam_tpu.config import SlamConfig
    from visual_slam_tpu.pipeline import Slam
    from visual_slam_tpu.utils.dataset import ICLNUIMDataset

    ds = ICLNUIMDataset(DATA)
    cfg = SlamConfig()
    cfg.use_depth = True  # immediate init
    slam = Slam(cfg)
    rng = np.random.default_rng(0)
    for i in range(12):
        slam.process(i, ds.gray(i), ds.depth(i))
    # Garbage frames: pure noise — tracking must fail (no pose jumps).
    for i in range(12, 16):
        noise = rng.uniform(0, 1, (480, 640)).astype(np.float32)
        slam.process(i, noise, None)
    assert slam.stats.get("track_failures", 0) >= 3
    # Pose must not have jumped during the blackout (constant-position
    # fallback; the relocalizer ran each failure and correctly found nothing).
    C = -slam.trajectory[-1].R_cw.T @ slam.trajectory[-1].t_cw
    assert np.linalg.norm(C) < 1.0
    # Real frames return: tracking recovers (directly, since the camera
    # "didn't move" during the blackout — relocalization is the fallback for
    # when it did).
    for i in range(16, 24):
        slam.process(i, ds.gray(i), ds.depth(i))
    last = slam.trajectory[-1]
    assert last.n_tracked >= 10


def test_live_view_dump(tmp_path):
    """LiveView writes complete, current artifacts during a run (the
    reference viewer's headless analog, src/v2/viewer.py:9-257)."""
    import json

    from visual_slam_tpu.config import SlamConfig
    from visual_slam_tpu.pipeline import run_sequence
    from visual_slam_tpu.utils.dataset import ICLNUIMDataset
    from visual_slam_tpu.utils import viz

    ds = ICLNUIMDataset(DATA)
    gt = ds.ground_truth()
    live = viz.LiveView(
        str(tmp_path), every=20, gt_positions=gt[:, :3, 3], plot=True
    )
    run_sequence(ds, SlamConfig(), 0, 90, on_frame=live)

    assert live.n_updates >= 4
    state = json.load(open(tmp_path / "state.json"))
    assert state["frame"] >= 80
    assert state["initialized"]
    assert state["points"] > 50
    assert (tmp_path / "trajectory.png").stat().st_size > 0
    ply = (tmp_path / "map.ply").read_text().splitlines()
    assert ply[0] == "ply"
    n_vertex = int([l for l in ply if l.startswith("element vertex")][0].split()[-1])
    assert n_vertex == state["points"]
    # Interactive viewer contract (utils/viewer.html polls these files).
    traj = json.load(open(tmp_path / "trajectory.json"))
    assert len(traj["positions"]) == state["trajectory_len"]
    assert all(len(p) == 3 for p in traj["positions"][:3])
    from visual_slam_tpu.utils import live_viewer  # importable, html present
    html = open(
        os.path.join(os.path.dirname(live_viewer.__file__), "viewer.html")
    ).read()
    assert "trajectory.json" in html and "parsePly" in html
    # No partial temp files left behind.
    assert not [p for p in os.listdir(tmp_path) if p.startswith(".tmp.")]


def test_windowed_matches_per_frame():
    """W-frame device-side tracking windows (run_windowed / _track_window)
    must produce the same map and trajectory quality as the per-frame loop
    (same gates, on-device keyframe rule, event replay)."""
    from visual_slam_tpu.config import SlamConfig
    from visual_slam_tpu.pipeline import run_sequence
    from visual_slam_tpu.utils.dataset import ICLNUIMDataset
    from visual_slam_tpu.utils.evaluate import ate_rmse

    ds = ICLNUIMDataset(DATA)
    gt = ds.ground_truth()

    cfg = SlamConfig()
    cfg.use_depth = True
    ref = run_sequence(ds, cfg, 0, 90)
    cfg2 = SlamConfig()
    cfg2.use_depth = True
    win = run_sequence(ds, cfg2, 0, 90, windowed=True, window=6)

    assert win.stats["keyframes"] == ref.stats["keyframes"]
    assert len(win.trajectory) == len(ref.trajectory)
    idxs, est = win.positions()
    gt_pos = gt[np.clip(idxs, 0, len(gt) - 1), :3, 3]
    rmse_w, _ = ate_rmse(est, gt_pos, align_scale=False)
    idxs_r, est_r = ref.positions()
    rmse_r, _ = ate_rmse(est_r, gt_pos, align_scale=False)
    # Same math modulo PRNG-key consumption order.
    assert rmse_w < max(2.0 * rmse_r, 0.02), (rmse_w, rmse_r)


def test_rgbd_pipelined_initializes_metric():
    """Regression: the pipelined driver must use the RGB-D init path when
    use_depth is set (it silently fell back to monocular two-view init,
    leaving the metric inverse-depth BA residuals fighting an
    arbitrary-scale map)."""
    from visual_slam_tpu.config import SlamConfig
    from visual_slam_tpu.pipeline import run_sequence
    from visual_slam_tpu.utils.dataset import ICLNUIMDataset
    from visual_slam_tpu.utils.evaluate import ate_rmse

    ds = ICLNUIMDataset(DATA)
    cfg = SlamConfig()
    cfg.use_depth = True
    slam = run_sequence(ds, cfg, 0, 60, pipelined=True)
    assert slam.initialized
    assert slam.stats["init_frame"] == 0  # RGB-D inits from the first frame
    idxs, est = slam.positions()
    gt = ds.ground_truth()
    rmse, _ = ate_rmse(
        est, gt[np.clip(idxs, 0, len(gt) - 1), :3, 3], align_scale=False
    )
    assert rmse < 0.02  # METRIC (SE3) ATE: scale must be right
