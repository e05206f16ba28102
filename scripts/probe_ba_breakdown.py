"""Break down the BA solve's device time by stage on the TPU."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from visual_slam_tpu.config import SlamConfig
    from visual_slam_tpu.pipeline import Slam
    from visual_slam_tpu.models import ba as ba_mod
    from visual_slam_tpu.utils.dataset import ICLNUIMDataset

    N = 140
    ds = ICLNUIMDataset("/root/reference/data/ICL_NUIM")
    from visual_slam_tpu import native
    loader, off = ds.async_loader(0, N)
    frames = [loader.get_gray(i)[0] for i in range(N)]
    loader.close()
    cfg = SlamConfig()
    slam = Slam(cfg)
    for i in range(N):
        slam.process(i, frames[i])
    prob = slam.map.to_ba_problem(slam.cfg.intrinsics)

    def bench(name, fn, *args, reps=5, **kw):
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args, **kw)
        jax.block_until_ready(out)
        print(f"{name:32s}: {(time.perf_counter()-t0)/reps*1000:8.2f} ms")
        return out

    lam = jnp.asarray(1e-4)

    @jax.jit
    def build(p, lam):
        U_d, V_d, g_c, g_p, (r, Jc, Jp, w, H_ij) = ba_mod._build_blocks(p, lam)
        return U_d, V_d, g_c, g_p, r, Jc, Jp, w, H_ij

    @jax.jit
    def cost(p):
        return ba_mod._cost(p)

    @jax.jit
    def rj(p):
        return ba_mod._residuals_and_jacobians(p)

    @jax.jit
    def inv6(M):
        return ba_mod._inv6(M)

    @jax.jit
    def inv3(M):
        return ba_mod._inv3(M)

    @partial(jax.jit, static_argnames=("cg_iters",))
    def solve(p, lam, cg_iters):
        return ba_mod._solve_delta(p, lam, cg_iters, False)

    @partial(jax.jit, static_argnames=("n_iters", "cg_iters"))
    def full(p, n_iters, cg_iters):
        return ba_mod.optimize(p, n_iters=n_iters, cg_iters=cg_iters)

    @jax.jit
    def sej(p):
        return ba_mod._scale_edge_jacobians(p)

    bench("residuals+jacobians", rj, prob)
    bench("cost", cost, prob)
    bench("scale_edge_jacobians", sej, prob)
    outs = bench("build_blocks", build, prob, lam)
    U_d = outs[0]
    V_d = outs[1]
    bench("inv6 (64,6,6)", inv6, U_d)
    bench("inv3 (8192,3,3)", inv3, V_d)
    bench("solve_delta cg12", solve, prob, lam, 12)
    bench("optimize 1x12", full, prob, 1, 12, reps=3)
    bench("optimize 10x12", full, prob, 10, 12, reps=3)
    bench("optimize 10x4", full, prob, 10, 4, reps=3)


if __name__ == "__main__":
    main()
