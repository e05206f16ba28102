"""TPU ATE vs matmul precision: run pipelined SLAM with default vs highest
jax_default_matmul_precision. Usage: probe_precision.py [default|highest] [depths...]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "highest"
    depths = [int(d) for d in sys.argv[2:]] or [1, 6]
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    if mode == "highest":
        jax.config.update("jax_default_matmul_precision", "highest")

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

    warm = run_pipelined(Slam(SlamConfig()), mem_iter(), pipeline_depth=depths[0])
    print(f"warm ({mode}): ATE {ate(warm):.4f}", flush=True)
    del warm

    for depth in depths:
        for rep in range(2):
            t0 = time.perf_counter()
            s = run_pipelined(Slam(SlamConfig()), mem_iter(), pipeline_depth=depth)
            fps = N / (time.perf_counter() - t0)
            print(
                f"{mode} depth {depth:2d} rep {rep}: {fps:6.1f} fps  ATE {ate(s):.4f}"
                f"  kf {s.stats['keyframes']}  init {s.stats['init_frame']}",
                flush=True,
            )


if __name__ == "__main__":
    main()
