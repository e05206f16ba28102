"""RGB-D pipeline mode tests (metric depth init + depth landmark mining)."""
import os

import numpy as np
import pytest

DATA = "/root/reference/data/ICL_NUIM"

pytestmark = pytest.mark.skipif(
    not os.path.exists(DATA), reason="ICL-NUIM dataset not available"
)


def test_backproject_depth():
    from visual_slam_tpu.pipeline import _backproject_depth

    intr = np.array([481.20, 480.0, 319.5, 239.5], np.float32)
    depth = np.full((480, 640), 2.0, np.float32)
    depth[0, 0] = 0.0  # missing
    uv = np.array([[319.5, 239.5], [0.0, 0.0], [481.2 + 319.5, 239.5]], np.float32)
    X, ok = _backproject_depth(uv, depth, intr)
    assert ok[0] and not ok[1] and ok[2]
    np.testing.assert_allclose(X[0], [0, 0, 2.0], atol=1e-5)
    np.testing.assert_allclose(X[2], [2.0, 0, 2.0], atol=1e-5)  # 1 focal off-axis


def test_rgbd_slam_short():
    """RGB-D mode tracks from frame 0 with metric scale (no init delay)."""
    from visual_slam_tpu.config import SlamConfig
    from visual_slam_tpu.pipeline import run_sequence
    from visual_slam_tpu.utils.dataset import ICLNUIMDataset
    from visual_slam_tpu.utils.evaluate import ate_rmse

    ds = ICLNUIMDataset(DATA)
    cfg = SlamConfig()
    cfg.use_depth = True
    slam = run_sequence(ds, cfg, 0, 60)
    assert slam.initialized
    assert slam.stats["init_frame"] == 0  # immediate metric init
    idxs, est = slam.positions()
    assert len(idxs) == 60
    gt = ds.ground_truth()
    gt_pos = gt[np.clip(idxs, 0, len(gt) - 1), :3, 3]
    # Metric (SE3, no scale alignment) ATE must be small.
    rmse, _ = ate_rmse(est, gt_pos, align_scale=False)
    assert rmse < 0.08, f"metric ATE {rmse:.3f} m too high"
