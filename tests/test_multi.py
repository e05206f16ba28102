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
