"""CPU ATE check: plain loop vs pipelined depths, 200 frames."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from visual_slam_tpu.config import SlamConfig
    from visual_slam_tpu.pipeline import Slam, run_pipelined
    from visual_slam_tpu.utils.dataset import ICLNUIMDataset
    from visual_slam_tpu.utils import evaluate

    N = 200
    ds = ICLNUIMDataset("/root/reference/data/ICL_NUIM")
    frames = [np.asarray(ds.gray(i)) for i in range(N)]
    gt = ds.ground_truth()

    def ate(slam):
        idxs, est = slam.positions()
        gt_pos = gt[np.clip(idxs, 0, len(gt) - 1), :3, 3]
        rmse, _ = evaluate.ate_rmse(est, gt_pos, align_scale=True)
        return rmse

    def mem_iter():
        for i in range(N):
            yield i, frames[i], None

    slam = Slam(SlamConfig())
    t0 = time.perf_counter()
    for i in range(N):
        slam.process(i, frames[i])
    dt = time.perf_counter() - t0
    print(
        f"plain   : {N/dt:6.1f} fps  ATE {ate(slam):.4f}  kf {slam.stats['keyframes']}"
        f"  init {slam.stats['init_frame']}",
        flush=True,
    )

    for depth in (1, 6):
        t0 = time.perf_counter()
        s = run_pipelined(Slam(SlamConfig()), mem_iter(), pipeline_depth=depth)
        dt = time.perf_counter() - t0
        print(
            f"depth {depth:2d}: {N/dt:6.1f} fps  ATE {ate(s):.4f}  kf {s.stats['keyframes']}"
            f"  init {s.stats['init_frame']}",
            flush=True,
        )


if __name__ == "__main__":
    main()
