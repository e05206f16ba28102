"""Checkpoint, viz, and profiling utility tests."""
import os

import numpy as np

DATA = "/root/reference/data/ICL_NUIM"


def test_checkpoint_roundtrip(rng, tmp_path):
    from visual_slam_tpu.models.map_state import MapConfig, SlamMap
    from visual_slam_tpu.utils import checkpoint

    m = SlamMap(MapConfig(max_keyframes=8, max_points=64, max_observations=256, track_capacity=32))
    m.add_keyframe(np.eye(3, dtype=np.float32), np.zeros(3, np.float32), 0)
    m.add_keyframe(np.eye(3, dtype=np.float32), np.ones(3, np.float32), 5)
    ids = m.add_points(rng.normal(size=(10, 3)).astype(np.float32), np.ones((10, 8), np.uint32))
    m.add_observations(0, ids, rng.uniform(0, 640, (10, 2)).astype(np.float32))
    traj = rng.normal(size=(7, 3))
    path = str(tmp_path / "map.npz")
    checkpoint.save_map(path, m, traj)
    m2, traj2 = checkpoint.load_map(path)
    assert m2.n_kf == 2 and m2.n_pt == 10 and m2.n_obs == 10
    np.testing.assert_array_equal(m2.pt_xyz, m.pt_xyz)
    np.testing.assert_array_equal(m2.obs_uv, m.obs_uv)
    np.testing.assert_array_equal(traj2, traj)
    np.testing.assert_allclose(m2.kf_scale_meas, m.kf_scale_meas)


def test_viz_outputs(rng, tmp_path):
    from visual_slam_tpu.utils import viz

    est = np.cumsum(rng.normal(size=(50, 3)), axis=0)
    gt = est + rng.normal(scale=0.01, size=(50, 3))
    p1 = str(tmp_path / "traj.png")
    viz.plot_trajectory(est, gt, p1)
    assert os.path.getsize(p1) > 1000
    p2 = str(tmp_path / "map.ply")
    pts = rng.normal(size=(20, 3))
    viz.save_ply(p2, pts, valid=np.ones(20, bool))
    txt = open(p2).read()
    assert "element vertex 20" in txt


def test_stage_timers():
    import time

    from visual_slam_tpu.utils.profiling import StageTimers

    t = StageTimers()
    with t.time("a"):
        time.sleep(0.01)
    with t.time("a"):
        time.sleep(0.01)
    s = t.summary()
    assert s["a"]["calls"] == 2
    assert s["a"]["ms_per_call"] >= 9
    assert t.rate("a", 20) > 0
