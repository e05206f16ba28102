"""Measure the pure device-side frame rate of extract+track, dispatched
back-to-back with on-device pose threading (no per-frame host fetch).

This is the speed-of-light number for the tracking loop on this chip; the
host pipeline's job is to get as close to it as dispatch overhead allows.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from visual_slam_tpu.config import SlamConfig
    from visual_slam_tpu.pipeline import Slam, _track_step
    from visual_slam_tpu.models import frontend as _fe
    from visual_slam_tpu.utils.dataset import ICLNUIMDataset
    from visual_slam_tpu import native

    N = 120
    ds = ICLNUIMDataset("/root/reference/data/ICL_NUIM")
    if native.available():
        loader, off = ds.async_loader(60, 60 + N)
        frames = [loader.get_gray(i)[0] for i in range(N)]
        loader.close()
    else:
        frames = [np.asarray(ds.gray(60 + i)) for i in range(N)]

    cfg = SlamConfig()
    slam = Slam(cfg)
    for i in range(70):
        slam.process(i, frames[i % N])
        if slam.initialized:
            break
    assert slam.initialized
    snap = slam._snapshot
    intr = slam.intr
    key = jax.random.PRNGKey(0)

    # Pre-upload all frames (isolate compute from H2D).
    devs = [jax.device_put(f) for f in frames]
    jax.block_until_ready(devs[-1])

    fq = cfg.frontend

    def run(n, thread_pose=True):
        R = jnp.asarray(slam._prev_R)
        t = jnp.asarray(slam._prev_t)
        packs = []
        for i in range(n):
            feats = _fe.extract(devs[i], fq.max_features, fq.quality_level, fq.nms_radius)
            packed, inliers, idx2 = _track_step(
                feats.desc, feats.uv, feats.valid,
                snap["desc"], snap["xyz"], snap["valid"],
                R, t, intr, key,
                fq.match_ratio, fq.max_hamming,
                cfg.tracking.pnp_threshold_px,
                n_hyps=cfg.tracking.pnp_hypotheses,
                refine_iters=cfg.tracking.refine_iters,
                cross_check=fq.cross_check,
            )
            if thread_pose:
                R = packed[:9].reshape(3, 3)
                t = packed[9:12]
            packs.append(packed)
        jax.block_until_ready(packs[-1])
        return packs

    run(10)  # warm (compile packed-slice reshapes)
    for label, thread in (("threaded", True), ("independent", False)):
        t0 = time.perf_counter()
        packs = run(N, thread)
        dt = time.perf_counter() - t0
        print(f"extract+track {label}: {N/dt:8.1f} fps  ({dt/N*1000:6.2f} ms/frame)")

    # extract only
    t0 = time.perf_counter()
    outs = [_fe.extract(devs[i], fq.max_features, fq.quality_level, fq.nms_radius) for i in range(N)]
    jax.block_until_ready(outs[-1].desc)
    dt = time.perf_counter() - t0
    print(f"extract only: {N/dt:8.1f} fps  ({dt/N*1000:6.2f} ms/frame)")

    # track only (reuse one feats)
    feats = outs[0]
    t0 = time.perf_counter()
    packs = []
    R = jnp.asarray(slam._prev_R); t = jnp.asarray(slam._prev_t)
    for i in range(N):
        packed, _, _ = _track_step(
            feats.desc, feats.uv, feats.valid,
            snap["desc"], snap["xyz"], snap["valid"],
            R, t, intr, key,
            fq.match_ratio, fq.max_hamming,
            cfg.tracking.pnp_threshold_px,
            n_hyps=cfg.tracking.pnp_hypotheses,
            refine_iters=cfg.tracking.refine_iters,
            cross_check=fq.cross_check,
        )
        R = packed[:9].reshape(3, 3); t = packed[9:12]
        packs.append(packed)
    jax.block_until_ready(packs[-1])
    dt = time.perf_counter() - t0
    print(f"track only: {N/dt:8.1f} fps  ({dt/N*1000:6.2f} ms/frame)")

    # with H2D included + async fetch drain (the real pipeline shape)
    t0 = time.perf_counter()
    R = jnp.asarray(slam._prev_R); t = jnp.asarray(slam._prev_t)
    packs = []
    for i in range(N):
        d = jax.device_put(frames[i])
        feats = _fe.extract(d, fq.max_features, fq.quality_level, fq.nms_radius)
        packed, inl, idx2 = _track_step(
            feats.desc, feats.uv, feats.valid,
            snap["desc"], snap["xyz"], snap["valid"],
            R, t, intr, key,
            fq.match_ratio, fq.max_hamming,
            cfg.tracking.pnp_threshold_px,
            n_hyps=cfg.tracking.pnp_hypotheses,
            refine_iters=cfg.tracking.refine_iters,
            cross_check=fq.cross_check,
        )
        R = packed[:9].reshape(3, 3); t = packed[9:12]
        packed.copy_to_host_async()
        packs.append(packed)
        if i >= 3:
            np.asarray(packs[i - 3])  # consume with 3-frame lag
    for p in packs[-3:]:
        np.asarray(p)
    dt = time.perf_counter() - t0
    print(f"full shape (H2D+extract+track+lag-3 fetch): {N/dt:8.1f} fps  ({dt/N*1000:6.2f} ms/frame)")


if __name__ == "__main__":
    main()
