"""Diagnostic: windowed vs pipelined full-sequence monocular runs (CPU).

Round-4 repro of VERDICT r3's gating defect: the windowed driver collapses
beyond ~200 frames monocular (BENCH_r03 fullseq ATE 0.835 / 651 failures)
while the pipelined driver holds ATE ~0.03. Prints per-run stats + keyframe
cadence so the divergence mechanism is visible.

Usage: python scripts/debug_windowed.py {windowed|pipelined} [frames] [cpu|tpu]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "windowed"
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 600
    platform = sys.argv[3] if len(sys.argv) > 3 else "tpu"
    import jax

    if platform == "cpu":
        # sitecustomize pins jax_platforms to the axon TPU plugin; plain
        # JAX_PLATFORMS=cpu is ignored — override through jax.config.
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from visual_slam_tpu.pipeline import run_sequence, size_config_for
    from visual_slam_tpu.utils.dataset import ICLNUIMDataset
    from visual_slam_tpu.utils import evaluate

    ds = ICLNUIMDataset("/root/reference/data/ICL_NUIM")
    cfg = size_config_for(n_frames)
    if os.environ.get("VSLAM_NO_LOOP"):
        cfg.loop.enabled = False
    if os.environ.get("VSLAM_REFINE_ITERS"):
        cfg.tracking.refine_iters = int(os.environ["VSLAM_REFINE_ITERS"])
    if os.environ.get("VSLAM_XLA_FRONTEND"):
        from visual_slam_tpu.models import frontend

        frontend.FRONTEND_BACKEND = "xla"
    t0 = time.perf_counter()
    slam = run_sequence(
        ds, cfg, 0, n_frames,
        windowed=(mode == "windowed"), window=16,
        pipelined=(mode == "pipelined"), pipeline_depth=6,
    )
    slam.optimize_pose_graph()
    dt = time.perf_counter() - t0
    idxs, est = slam.positions()
    gt = ds.ground_truth()
    gp = gt[np.clip(idxs, 0, len(gt) - 1), :3, 3]
    rmse, _ = evaluate.ate_rmse(est, gp, align_scale=True)
    kf_frames = [
        int(f) for k, f in enumerate(slam.map.kf_frame_idx) if slam.map.kf_valid[k]
    ]
    # Per-100-frame ATE segments to locate where the trajectory diverges.
    seg = {}
    for s in range(0, n_frames, 100):
        m = (idxs >= s) & (idxs < s + 100)
        if m.sum() > 10:
            r, _ = evaluate.ate_rmse(est[m], gp[m], align_scale=True)
            seg[f"{s}-{s+100}"] = round(r, 4)
    fail_frames = [f.frame_idx for f in slam.trajectory if f.n_tracked < 10]
    out = dict(
        mode=mode, frames=n_frames, wall_s=round(dt, 1),
        fps=round(n_frames / dt, 2), ate_rmse_m=round(rmse, 4),
        stats=slam.stats, kf_frames=kf_frames,
        n_fail=len(fail_frames),
        fail_frames=fail_frames[:40],
        seg_ate=seg,
    )
    print(json.dumps(out, default=str))


if __name__ == "__main__":
    main()
