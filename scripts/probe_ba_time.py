"""Measure the BA solve's actual device time (and the fetch-poll penalty)."""
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
    from visual_slam_tpu.pipeline import Slam, _ba_step
    from visual_slam_tpu.utils.dataset import ICLNUIMDataset
    from visual_slam_tpu import native

    N = 140
    ds = ICLNUIMDataset("/root/reference/data/ICL_NUIM")
    loader, off = ds.async_loader(0, N)
    frames = [loader.get_gray(i)[0] for i in range(N)]
    loader.close()

    cfg = SlamConfig()
    slam = Slam(cfg)
    for i in range(N):
        slam.process(i, frames[i])
    print("keyframes:", slam.stats["keyframes"], "points:", int(slam.map.pt_valid.sum()))

    prob = slam.map.to_ba_problem(slam.cfg.intrinsics)
    print("shapes: obs", prob.cam.shape, "cam_obs", prob.cam_obs.shape,
          "pt_obs", prob.pt_obs.shape)

    out, diag, bad = _ba_step(prob, n_iters=cfg.ba.iters, cg_iters=cfg.ba.cg_iters)
    jax.block_until_ready(diag)  # warm

    for rep in range(3):
        t0 = time.perf_counter()
        out, diag, bad = _ba_step(prob, n_iters=cfg.ba.iters, cg_iters=cfg.ba.cg_iters)
        jax.block_until_ready(diag)
        print(f"BA solve wall (dispatch+device+sync): {(time.perf_counter()-t0)*1000:.1f} ms")

    # poll penalty: fetch right after dispatch
    t0 = time.perf_counter()
    out, diag, bad = _ba_step(prob, n_iters=cfg.ba.iters, cg_iters=cfg.ba.cg_iters)
    np.asarray(diag)
    print(f"immediate fetch after dispatch: {(time.perf_counter()-t0)*1000:.1f} ms")

    # is_ready availability
    out, diag, bad = _ba_step(prob, n_iters=cfg.ba.iters, cg_iters=cfg.ba.cg_iters)
    print("has is_ready:", hasattr(diag, "is_ready"))
    if hasattr(diag, "is_ready"):
        t0 = time.perf_counter()
        r = diag.is_ready()
        print(f"is_ready() -> {r} in {(time.perf_counter()-t0)*1000:.2f} ms")
        while not diag.is_ready():
            time.sleep(0.005)
        print(f"became ready after {(time.perf_counter()-t0)*1000:.1f} ms")
        t0 = time.perf_counter()
        np.asarray(diag)
        print(f"fetch after ready: {(time.perf_counter()-t0)*1000:.2f} ms")


if __name__ == "__main__":
    main()
