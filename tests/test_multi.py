"""Multi-sequence batched mode tests (config #3 semantics)."""
import os

import numpy as np
import pytest

DATA = "/root/reference/data/ICL_NUIM"

pytestmark = pytest.mark.skipif(
    not os.path.exists(DATA), reason="ICL-NUIM dataset not available"
)


def test_batched_matches_single():
    """Two copies of the same sequence must produce identical trajectories,
    and batched execution must match the single-sequence pipeline."""
    from visual_slam_tpu.config import SlamConfig
    from visual_slam_tpu.multi import run_batched
    from visual_slam_tpu.pipeline import run_sequence
    from visual_slam_tpu.utils.dataset import ICLNUIMDataset

    ds = ICLNUIMDataset(DATA)
    cfg = SlamConfig()
    cfg.use_depth = True  # fast init, no 65-frame monocular wait
    slams = run_batched([ds, ds], cfg, 0, 30)
    assert all(s.initialized for s in slams)
    i0, p0 = slams[0].positions()
    i1, p1 = slams[1].positions()
    np.testing.assert_allclose(p0, p1, atol=1e-5)
    # And equals the plain single-sequence run.
    single = run_sequence(ds, cfg, 0, 30)
    i2, p2 = single.positions()
    assert len(i0) == len(i2)
    np.testing.assert_allclose(p0, p2, atol=2e-2)  # batched vs single front-end


def test_batched_distinct_sequences_device_sharded():
    """Config #3 for real: DISTINCT pseudo-sequences (offset + reversed
    windows of traj3), front-end batch sharded over multiple devices, each
    result matching its own single-sequence run."""
    import jax
    from visual_slam_tpu.config import SlamConfig
    from visual_slam_tpu.multi import run_batched
    from visual_slam_tpu.pipeline import run_sequence
    from visual_slam_tpu.utils.dataset import ICLNUIMDataset, WindowView

    ds = ICLNUIMDataset(DATA)
    seqs = [WindowView(ds, 0), WindowView(ds, 120, reverse=True, length=400)]
    cfg = SlamConfig()
    cfg.use_depth = True
    slams = run_batched(seqs, cfg, 0, 30)
    assert all(s.initialized for s in slams)
    # Front-end ran device-parallel (8 virtual CPU devices in the suite).
    assert slams[0].stats["frontend_devices"] >= 2
    i0, p0 = slams[0].positions()
    i1, p1 = slams[1].positions()
    # Genuinely different trajectories.
    assert np.abs(p0 - p1).max() > 1e-3
    # Each matches its own single-sequence (unsharded) run.
    for seq, slam in zip(seqs, slams):
        single = run_sequence(seq, cfg, 0, 30)
        _, ps = single.positions()
        _, pb = slam.positions()
        np.testing.assert_allclose(pb, ps, atol=2e-2)
