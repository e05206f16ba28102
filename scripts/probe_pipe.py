"""Pipeline-depth sweep (fps + ATE) and IO-loop stall diagnosis on TPU."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from visual_slam_tpu.config import SlamConfig
    from visual_slam_tpu.pipeline import Slam, run_pipelined
    from visual_slam_tpu.utils.dataset import ICLNUIMDataset
    from visual_slam_tpu.utils import evaluate
    from visual_slam_tpu import native

    N = 200
    ds = ICLNUIMDataset("/root/reference/data/ICL_NUIM")
    loader, off = ds.async_loader(0, N)
    frames = [loader.get_gray(i)[0] for i in range(N)]
    loader.close()
    gt = ds.ground_truth()

    def ate(slam):
        idxs, est = slam.positions()
        gt_pos = gt[np.clip(idxs, 0, len(gt) - 1), :3, 3]
        rmse, _ = evaluate.ate_rmse(est, gt_pos, align_scale=True)
        return rmse

    def mem_iter():
        for i in range(N):
            yield i, jax.device_put(frames[i]), None

    # Warm once.
    warm = run_pipelined(Slam(SlamConfig()), mem_iter(), pipeline_depth=6)
    del warm

    for depth in (1, 2, 4, 6, 10):
        t0 = time.perf_counter()
        slam = run_pipelined(Slam(SlamConfig()), mem_iter(), pipeline_depth=depth)
        fps = N / (time.perf_counter() - t0)
        print(
            f"depth {depth:2d}: {fps:6.1f} fps  ATE {ate(slam):.4f}  "
            f"kf {slam.stats['keyframes']}  init {slam.stats['init_frame']}  "
            f"reloc {slam.stats.get('track_failures', 0)}",
            flush=True,
        )

    # IO loop diagnosis: per-frame wall with decode + device_put inside.
    ldr, _ = ds.async_loader(0, N)
    t_dec, t_put = [], []
    slam = Slam(SlamConfig())

    def io_iter():
        for i in range(N):
            t0 = time.perf_counter()
            gray, _ = ldr.get_gray(i)
            t1 = time.perf_counter()
            dev = jax.device_put(gray)
            t2 = time.perf_counter()
            t_dec.append(t1 - t0)
            t_put.append(t2 - t1)
            yield i, dev, None

    t0 = time.perf_counter()
    slam = run_pipelined(slam, io_iter(), pipeline_depth=6)
    fps = N / (time.perf_counter() - t0)
    ldr.close()
    print(
        f"io depth 6: {fps:.1f} fps  decode ms mean {np.mean(t_dec)*1e3:.1f} "
        f"max {np.max(t_dec)*1e3:.1f}  device_put ms mean {np.mean(t_put)*1e3:.1f} "
        f"max {np.max(t_put)*1e3:.1f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
