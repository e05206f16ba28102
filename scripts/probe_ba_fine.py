"""Fine-grained BA device timings: each stage looped inside ONE jit via
lax.scan (20 reps) so the ~5 ms tunnel dispatch floor is amortized away."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 20


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
    loader, off = ds.async_loader(0, N)
    frames = [loader.get_gray(i)[0] for i in range(N)]
    loader.close()
    cfg = SlamConfig()
    slam = Slam(cfg)
    for i in range(N):
        slam.process(i, frames[i])
    prob = slam.map.to_ba_problem(slam.cfg.intrinsics)
    print("obs", prob.cam.shape, "cam_obs", prob.cam_obs.shape,
          "pt_obs", prob.pt_obs.shape, flush=True)

    lam = jnp.asarray(1e-4)

    def bench(name, make_body, *args):
        """make_body(*args) -> a function carry->carry; scan it REPS times."""
        body = make_body(*args)

        @jax.jit
        def run(x0):
            def f(c, _):
                return body(c), None
            out, _ = jax.lax.scan(f, x0, None, length=REPS)
            return out

        x0 = jnp.zeros((8, 128), jnp.float32)
        out = run(x0)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = run(x0)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) * 1000 / REPS
        print(f"{name:36s}: {dt:8.3f} ms/rep", flush=True)

    def mix(c, *arrays):
        """Fold outputs back into the carry so nothing is DCE'd."""
        acc = c
        for a in arrays:
            acc = acc + jnp.sum(a).astype(jnp.float32)
        return acc

    def mk_rj():
        def body(c):
            r, Jc, Jp, w = ba_mod._residuals_and_jacobians(prob)
            return mix(c, r, Jc, Jp, w)
        return body

    def mk_cost():
        def body(c):
            return mix(c, ba_mod._cost(prob))
        return body

    def mk_sej():
        def body(c):
            r, Ji, Jj = ba_mod._scale_edge_jacobians(prob)
            return mix(c, r, Ji, Jj)
        return body

    # Precompute rj once OUTSIDE the timed region for the seg benches.
    r, Jc, Jp, w = jax.jit(ba_mod._residuals_and_jacobians)(prob)
    wJc = Jc * w[:, None, None]
    wJp = Jp * w[:, None, None]
    UO = jnp.einsum("oik,oil->okl", wJc, Jc)  # (O,6,6)
    VO = jnp.einsum("oik,oil->okl", wJp, Jp)  # (O,3,3)
    gcO = jnp.einsum("oik,oi->ok", wJc, r)  # (O,6)
    gpO = jnp.einsum("oik,oi->ok", wJp, r)  # (O,3)
    K = prob.R.shape[0]
    P = prob.X.shape[0]
    jax.block_until_ready(UO)

    def mk_einsums():
        def body(c):
            a = jnp.einsum("oik,oil->okl", wJc, Jc)
            b = jnp.einsum("oik,oil->okl", wJp, Jp)
            d = jnp.einsum("oik,oi->ok", wJc, r)
            e = jnp.einsum("oik,oi->ok", wJp, r)
            return mix(c, a, b, d, e)
        return body

    def mk_seg_cam():
        def body(c):
            return mix(c, ba_mod._seg_cam(UO, prob, K), ba_mod._seg_cam(gcO, prob, K))
        return body

    def mk_seg_pnt():
        def body(c):
            return mix(c, ba_mod._seg_pnt(VO, prob, P), ba_mod._seg_pnt(gpO, prob, P))
        return body

    def mk_build():
        def body(c):
            U_d, V_d, g_c, g_p, (rr, _, _, ww, H) = ba_mod._build_blocks(prob, lam)
            return mix(c, U_d, V_d, g_c, g_p, H)
        return body

    # matvec with prebuilt blocks
    U_d, V_d, g_c, g_p, (r2, Jc2, Jp2, w2, H_ij) = jax.jit(
        lambda p, l: ba_mod._build_blocks(p, l)
    )(prob, lam)
    V_inv = jax.jit(ba_mod._inv3)(V_d)
    jax.block_until_ready(V_inv)

    def mk_matvec():
        def body(c):
            x = c[:1, :6] * 0 + 1.0
            xk = jnp.broadcast_to(x, (K, 6)) * 1e-3
            y = ba_mod._schur_matvec(xk, U_d, V_inv, Jc2, Jp2, w2, prob, H_ij)
            return mix(c, y)
        return body

    def mk_solve():
        def body(c):
            dc, dp = ba_mod._solve_delta(prob, lam, 12, False)
            return mix(c, dc, dp)
        return body

    bench("residuals+jacobians", mk_rj)
    bench("cost (full, recomputes rj)", mk_cost)
    bench("scale_edge_jacobians", mk_sej)
    bench("obs einsums (U,V,gc,gp per-obs)", mk_einsums)
    bench("seg_cam (ELL gather K)", mk_seg_cam)
    bench("seg_pnt (ELL gather P)", mk_seg_pnt)
    bench("build_blocks (all)", mk_build)
    bench("schur_matvec", mk_matvec)
    bench("solve_delta cg12", mk_solve)


if __name__ == "__main__":
    main()
