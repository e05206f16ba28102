"""Measure the BA solve's actual device time (planar engine) on the TPU."""
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
    from visual_slam_tpu.models import ba as ba_mod

    N = 140
    ds = ICLNUIMDataset("/root/reference/data/ICL_NUIM")
    loader, off = ds.async_loader(0, N)
    frames = [loader.get_gray(i)[0] for i in range(N)]
    loader.close()

    cfg = SlamConfig()
    slam = Slam(cfg)
    for i in range(N):
        slam.process(i, frames[i])
    print("keyframes:", slam.stats["keyframes"], "points:", int(slam.map.pt_valid.sum()), flush=True)

    prob = slam.map.to_ba_problem(slam.cfg.intrinsics)
    print("planar shapes: P", prob.X.shape[0], "N", prob.cam.shape[0],
          "Q", prob.cam.shape[0] // prob.X.shape[0], flush=True)

    out, diag, bad = _ba_step(prob, n_iters=cfg.ba.iters, cg_iters=cfg.ba.cg_iters)
    jax.block_until_ready(diag)  # warm

    for rep in range(3):
        t0 = time.perf_counter()
        out, diag, bad = _ba_step(prob, n_iters=cfg.ba.iters, cg_iters=cfg.ba.cg_iters)
        jax.block_until_ready(diag)
        print(f"BA 10-iter wall (dispatch+device+sync): {(time.perf_counter()-t0)*1000:.1f} ms", flush=True)

    # Amortized: 5 solves back-to-back, one sync.
    t0 = time.perf_counter()
    for _ in range(5):
        out, diag, bad = _ba_step(prob, n_iters=cfg.ba.iters, cg_iters=cfg.ba.cg_iters)
    jax.block_until_ready(diag)
    print(f"BA 10-iter amortized over 5 dispatches: {(time.perf_counter()-t0)*1000/5:.1f} ms", flush=True)

    # CG path comparison at this scale.
    from functools import partial

    @partial(jax.jit, static_argnames=("n_iters", "cg_iters", "solver"))
    def opt(p, n_iters, cg_iters, solver):
        return ba_mod.optimize(p, n_iters=n_iters, cg_iters=cg_iters, solver=solver)

    for solver in ("chol", "cg"):
        o = opt(prob, 10, 12, solver)
        jax.block_until_ready(o[1])
        t0 = time.perf_counter()
        for _ in range(3):
            o = opt(prob, 10, 12, solver)
        jax.block_until_ready(o[1])
        print(f"optimize 10 iters solver={solver}: {(time.perf_counter()-t0)*1000/3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
