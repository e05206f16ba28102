"""Diagnose full-sequence tracking loss: per-frame n_tracked trace, first
failures, map state at failure. Usage: probe_seqdiag.py [n_frames] [parallax_deg]"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    par = float(sys.argv[2]) if len(sys.argv) > 2 else -1.0
    import jax

    jax.config.update("jax_platforms", "cpu")

    from visual_slam_tpu.pipeline import Slam, size_config_for
    from visual_slam_tpu.utils.dataset import ICLNUIMDataset
    from visual_slam_tpu.utils import evaluate

    ds = ICLNUIMDataset("/root/reference/data/ICL_NUIM")
    gt = ds.ground_truth()
    cfg = size_config_for(N)
    cfg.loop.enabled = False
    if par >= 0:
        cfg.keyframe.min_parallax_deg = par
    slam = Slam(cfg)
    fails = []
    for i, gray, depth in ds.frames(0, N):
        slam.process(i, gray, None)
        if slam.initialized and slam.trajectory:
            last = slam.trajectory[-1]
            if last.n_tracked < 30:
                fails.append(i)
        if i % 50 == 0 and slam.initialized:
            snap_n = slam._snapshot["n_valid"] if slam._snapshot else -1
            last = slam.trajectory[-1]
            print(
                f"frame {i}: tracked={last.n_tracked} kf={slam.stats['keyframes']}"
                f" pts={int(slam.map.pt_valid.sum())} obs={slam.map.n_obs}"
                f" snap={snap_n} fails={len(fails)}",
                flush=True,
            )
    idxs, est = slam.positions()
    gp = gt[np.clip(idxs, 0, len(gt) - 1), :3, 3]
    r, _ = evaluate.ate_rmse(est, gp, align_scale=True)
    print(f"ATE {r:.4f}  stats {slam.stats}", flush=True)
    print("first fail frames:", fails[:30], flush=True)
    tracked = np.array([f.n_tracked for f in slam.trajectory])
    print("n_tracked percentiles (10/50/90):", np.percentile(tracked, [10, 50, 90]))


if __name__ == "__main__":
    main()
