"""Benchmark: full SLAM pipeline on ICL-NUIM lr traj3, first 200 frames
(BASELINE.json config #1) on the available accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": frames/s, "unit": "frames/s", "vs_baseline": x}

vs_baseline compares against the measured CPU reference-semantics hot path
(scripts/cpu_baseline.py -> BASELINE_CPU.json; 27.25 fps on this machine,
BA excluded from the CPU side so the ratio is conservative).
"""
import json
import os
import time

import numpy as np

CPU_BASELINE_FPS = 27.25  # scripts/cpu_baseline.py measured on this host
DATA = "/root/reference/data/ICL_NUIM"
N_FRAMES = int(os.environ.get("BENCH_FRAMES", "200"))


def main():
    import jax

    # Persistent compile cache: the axon remote-compile service costs
    # seconds-to-minutes per computation; cache hits make reruns instant.
    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from visual_slam_tpu.config import SlamConfig
    from visual_slam_tpu.pipeline import Slam
    from visual_slam_tpu.utils.dataset import ICLNUIMDataset
    from visual_slam_tpu.utils import evaluate

    if os.path.exists("BASELINE_CPU.json"):
        with open("BASELINE_CPU.json") as f:
            baseline_fps = json.load(f)["fps"]
    else:
        baseline_fps = CPU_BASELINE_FPS

    ds = ICLNUIMDataset(DATA)
    # Host-side decode via the native C++ loader with grayscale conversion
    # in native code: the device transfer then moves a 0.3 MB uint8 gray
    # frame instead of 0.9 MB RGB (the tunnel H2D is a real per-frame cost).
    from visual_slam_tpu import native

    if native.available():
        loader, off = ds.async_loader(0, N_FRAMES)
        frames = [loader.get_gray(i)[0] for i in range(N_FRAMES)]
        loader.close()
    else:
        frames = [np.asarray(ds.gray(i)) for i in range(N_FRAMES)]

    # Warm-up run over a short prefix to trigger all jit compiles
    # (extract/match/essential/pnp/BA paths).
    cfg = SlamConfig()
    warm = Slam(cfg)
    for i in range(70):
        warm.process(i, frames[i])
    del warm

    slam = Slam(SlamConfig())
    t0 = time.perf_counter()
    # One-frame-ahead async H2D (device_put returns immediately) + software-
    # pipelined tracking: frame i's ~25 ms fetch latency overlaps frame
    # i+1's dispatched device work.
    from visual_slam_tpu.models import frontend as _fe

    dev = jax.device_put(frames[0])
    pending = None
    for i in range(N_FRAMES):
        nxt = jax.device_put(frames[i + 1]) if i + 1 < N_FRAMES else None
        feats = _fe.extract(dev, slam.cfg.frontend.max_features,
                            slam.cfg.frontend.quality_level,
                            slam.cfg.frontend.nms_radius)
        if not slam.initialized:
            if pending is not None:
                slam._consume_track(pending)
                pending = None
            slam._try_initialize(i, feats, None)
        else:
            slam._apply_pending_ba()
            h = slam._dispatch_track(i, feats, None)
            if pending is not None:
                slam._consume_track(pending)
            pending = h
        dev = nxt
    if pending is not None:
        slam._consume_track(pending)
    dt = time.perf_counter() - t0
    fps = N_FRAMES / dt

    extra = {
        "keyframes": slam.stats["keyframes"],
        "points": int(slam.map.pt_valid.sum()),
        "init_frame": slam.stats["init_frame"],
        "backend": jax.default_backend(),
        "ba_iters_per_s": round(slam.ba_iters_per_s(), 1),
        "stage_ms": {
            k: v["ms_per_call"] for k, v in slam.timers.summary().items()
        },
    }
    gt = ds.ground_truth()
    if gt is not None and slam.initialized:
        idxs, est = slam.positions()
        gt_pos = gt[np.clip(idxs, 0, len(gt) - 1), :3, 3]
        rmse, _ = evaluate.ate_rmse(est, gt_pos, align_scale=True)
        extra["ate_rmse_m"] = round(rmse, 5)

    print(
        json.dumps(
            {
                "metric": "ICL-NUIM lr_kt0 200-frame SLAM throughput",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / baseline_fps, 2),
                **extra,
            }
        )
    )


if __name__ == "__main__":
    main()
