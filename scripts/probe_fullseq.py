"""Config #2: full-sequence run (1000 frames) with loop closure + final
pose-graph; reports ATE and loop stats. CPU or TPU depending on args.

Usage: probe_fullseq.py [cpu|tpu] [n_frames] [depth(0=plain)]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    plat = sys.argv[1] if len(sys.argv) > 1 else "cpu"
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    depth = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    import jax

    if plat == "cpu":
        jax.config.update("jax_platforms", "cpu")
    else:
        jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from visual_slam_tpu.pipeline import Slam, run_pipelined, run_sequence, size_config_for
    from visual_slam_tpu.utils.dataset import ICLNUIMDataset
    from visual_slam_tpu.utils import evaluate

    ds = ICLNUIMDataset("/root/reference/data/ICL_NUIM")
    gt = ds.ground_truth()

    cfg = size_config_for(N)
    if os.environ.get("VSLAM_NOLOOP"):
        cfg.loop.enabled = False
    if os.environ.get("VSLAM_SOLVER"):
        cfg.ba.solver = os.environ["VSLAM_SOLVER"]
    t0 = time.perf_counter()
    if depth > 0:
        def it():
            for i in range(N):
                yield i, jax.device_put(np.asarray(ds.gray(i))), None
        slam = run_pipelined(Slam(cfg), it(), pipeline_depth=depth)
    else:
        slam = run_sequence(ds, cfg, 0, N)
    dt = time.perf_counter() - t0

    def ate(s):
        idxs, est = s.positions()
        gp = gt[np.clip(idxs, 0, len(gt) - 1), :3, 3]
        r, _ = evaluate.ate_rmse(est, gp, align_scale=True)
        return r

    print(f"{N}f {plat} depth{depth}: {N/dt:.1f} fps  ATE {ate(slam):.4f}", flush=True)
    print("stats:", slam.stats, flush=True)
    slam.optimize_pose_graph()
    print(f"after final PGO: ATE {ate(slam):.4f}", flush=True)
    slam._run_full_ba(scale_gauge=False)
    slam._rewrite_keyframe_trajectory()
    print(f"after final global BA: ATE {ate(slam):.4f}", flush=True)


if __name__ == "__main__":
    main()
