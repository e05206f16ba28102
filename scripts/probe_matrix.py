"""A/B matrix of pipeline knobs on TPU, one process (stable compiles):
{per-frame vs batched fetch} x {per-frame vs blocked H2D}, with per-phase
wall breakdown."""
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

    N = 200
    ds = ICLNUIMDataset("/root/reference/data/ICL_NUIM")
    frames = [np.asarray(ds.gray(i)) for i in range(N)]
    gt = ds.ground_truth()

    def ate(slam):
        idxs, est = slam.positions()
        gp = gt[np.clip(idxs, 0, len(gt) - 1), :3, 3]
        r, _ = evaluate.ate_rmse(est, gp, align_scale=True)
        return r

    def it():
        for i in range(N):
            yield i, frames[i], None

    configs = [
        ("pf-fetch pf-h2d", dict(h2d_block=1, fetch_batch=0)),
        ("bat-fetch pf-h2d", dict(h2d_block=1, fetch_batch=4)),
        ("pf-fetch blk-h2d", dict(h2d_block=8, fetch_batch=0)),
        ("bat-fetch blk-h2d", dict(h2d_block=8, fetch_batch=4)),
    ]
    # Warm every path once.
    for name, kw in configs:
        run_pipelined(Slam(SlamConfig()), it(), pipeline_depth=6, **kw)
        print(f"warmed {name}", flush=True)

    for rep in range(2):
        for name, kw in configs:
            prof = {}
            t0 = time.perf_counter()
            s = run_pipelined(
                Slam(SlamConfig()), it(), pipeline_depth=6, prof=prof, **kw
            )
            dt = time.perf_counter() - t0
            top = sorted(prof.items(), key=lambda x: -x[1])[:5]
            tops = "  ".join(f"{k}:{v*1000:.0f}ms" for k, v in top)
            print(
                f"{name}: {N/dt:6.1f} fps  ATE {ate(s):.4f} "
                f"kf {s.stats['keyframes']}  | {tops}",
                flush=True,
            )


if __name__ == "__main__":
    main()
