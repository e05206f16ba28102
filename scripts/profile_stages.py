"""Per-stage device timing of the production tracking loop on the TPU.

Times each stage of _extract_pallas_fused + _track_step back-to-back
(N dispatches, one terminal block) so dispatch latency amortizes, plus the
composed jits. This is the measurement side of the roofline story
(utils/roofline.py holds the hand-counted flops/bytes).

Usage: python scripts/profile_stages.py [n_reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench_one(fn, reps, *args):
    import jax

    out = fn(*args)  # warm/compile
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from visual_slam_tpu.config import SlamConfig
    from visual_slam_tpu.models import frontend
    from visual_slam_tpu.models.map_state import SlamMap, MapConfig
    from visual_slam_tpu.ops import match, pnp
    from visual_slam_tpu.ops.pallas import detect_kernel, patch_kernel
    from visual_slam_tpu.ops import descriptor_mxu
    from visual_slam_tpu.utils.dataset import ICLNUIMDataset
    from visual_slam_tpu.pipeline import _track_step, _track_window

    cfg = SlamConfig()
    fq = cfg.frontend
    K = fq.max_features
    ds = ICLNUIMDataset("/root/reference/data/ICL_NUIM")
    gray = np.asarray(ds.gray(100))
    img = jax.device_put(gray)
    interp = jax.default_backend() != "tpu"

    res = {}

    # --- stage 1: fused Pallas corner+blur ---
    f = jax.jit(lambda im: detect_kernel.corner_peaks_and_blur_pallas(
        frontend.to_gray(im), nms_radius=fq.nms_radius, interpret=interp))
    res["detect_blur(pallas)"] = bench_one(f, reps, img)

    peaks, blurred = f(img)

    # --- stage 2: top-k corner select ---
    f2 = jax.jit(lambda p: frontend._topk_select(p, K, fq.quality_level))
    res["topk_select"] = bench_one(f2, reps, peaks)
    uv, score, valid = f2(peaks)

    # --- stage 3: aligned window copy (pallas) ---
    f3 = jax.jit(lambda b, u: patch_kernel.extract_windows(b, u, interpret=interp))
    res["extract_windows(pallas)"] = bench_one(f3, reps, blurred, uv)
    windows, ry, rx = f3(blurred, uv)

    # --- stage 4: cut + orient + describe (MXU) ---
    f4 = jax.jit(descriptor_mxu.describe_from_windows)
    res["describe(MXU)"] = bench_one(f4, reps, windows, ry, rx)

    # --- sub-stage: cut_patches alone ---
    f4a = jax.jit(patch_kernel.cut_patches)
    res["cut_patches"] = bench_one(f4a, reps, windows, ry, rx)
    patches = f4a(windows, ry, rx)
    flat = patches.reshape(K, -1)
    theta = descriptor_mxu.orientation_from_patches(flat)
    f4b = jax.jit(descriptor_mxu._sample_and_pack)
    res["sample_and_pack"] = bench_one(f4b, reps, flat, theta)

    # --- composed front-end ---
    f5 = jax.jit(lambda im: frontend._extract_pallas_fused(
        im, K, interp, fq.quality_level, fq.nms_radius))
    res["extract_fused(all)"] = bench_one(f5, reps, img)
    feats = f5(img)

    # --- tracking snapshot (synthetic but realistic size) ---
    m = SlamMap(MapConfig())
    rng = np.random.default_rng(0)
    n_pts = 400
    X = rng.uniform(-2, 2, (n_pts, 3)).astype(np.float32)
    X[:, 2] += 4
    kf = m.add_keyframe(np.eye(3, dtype=np.float32), np.zeros(3, np.float32), 0)
    ids = m.add_points(X, np.asarray(feats.desc)[:n_pts])
    m.add_observations(kf, ids, np.asarray(feats.uv)[:n_pts])
    snap = m.local_snapshot(kf)

    # --- match ---
    f6 = jax.jit(lambda d1, d2, v1, v2: match.match_ratio_test(
        d1, d2, v1, v2, ratio=fq.match_ratio, max_distance=fq.max_hamming,
        cross_check=fq.cross_check))
    res["match"] = bench_one(f6, reps, snap["desc"], feats.desc, snap["valid"], feats.valid)
    idx2, dist, good = f6(snap["desc"], feats.desc, snap["valid"], feats.valid)

    # --- PnP (tiered, fast branch) ---
    tc = cfg.tracking
    f7 = jax.jit(lambda key, xyz, uvq, m_, R, t: pnp.solve_pnp_tracked(
        key, xyz, uvq, jnp.asarray(cfg.intrinsics), m_, guess_R=R, guess_t=t,
        n_hyps=tc.pnp_hypotheses, threshold_px=tc.pnp_threshold_px,
        refine_iters=tc.refine_iters))
    key = jax.random.PRNGKey(0)
    R0 = jnp.eye(3)
    t0_ = jnp.zeros(3)
    res["pnp_tracked"] = bench_one(
        f7, reps, key, snap["xyz"], feats.uv[idx2], good, R0, t0_)

    # --- full track step (match+pnp+blob) ---
    def ts(fd, fu, fv, sd, sx, sv, R, t, k):
        return _track_step(
            fd, fu, fv, sd, sx, sv, R, t, jnp.asarray(cfg.intrinsics), k,
            fq.match_ratio, fq.max_hamming, tc.pnp_threshold_px,
            n_hyps=tc.pnp_hypotheses, refine_iters=tc.refine_iters,
            cross_check=fq.cross_check)
    res["track_step(all)"] = bench_one(
        ts, reps, feats.desc, feats.uv, feats.valid,
        snap["desc"], snap["xyz"], snap["valid"], R0, t0_, key)

    # --- window scan slope (per-frame device time, dispatch cancelled) ---
    frames = np.stack([np.asarray(ds.gray(i)) for i in range(100, 164)])
    gstack = jax.device_put(frames)
    kq = jax.random.split(key, 65)[1:]

    def scan_pass(n):
        blobs, _, _ = _track_window(
            gstack[:n], snap["desc"], snap["xyz"], snap["valid"],
            R0, t0_, jnp.asarray(cfg.intrinsics), kq[:n],
            fq.match_ratio, fq.max_hamming, tc.pnp_threshold_px,
            window=n, max_features=K, quality_level=fq.quality_level,
            nms_radius=fq.nms_radius, interpret=interp,
            n_hyps=tc.pnp_hypotheses, refine_iters=tc.refine_iters,
            cross_check=fq.cross_check,
            min_track_pts=tc.min_tracked_points)
        np.asarray(blobs)

    scan_pass(8); scan_pass(64)
    t0 = time.perf_counter(); scan_pass(8); t8 = time.perf_counter() - t0
    t0 = time.perf_counter(); scan_pass(64); t64 = time.perf_counter() - t0
    res["window_scan_slope_ms_per_frame"] = (t64 - t8) / 56 * 1e3

    for k, v in res.items():
        print(f"{k:32s} {v:8.3f} ms")
    print(f"{'sum(stages 1-4)':32s} "
          f"{res['detect_blur(pallas)']+res['topk_select']+res['extract_windows(pallas)']+res['describe(MXU)']:8.3f} ms")
    print(f"device fps at slope: {1e3/res['window_scan_slope_ms_per_frame']:.1f}")


if __name__ == "__main__":
    main()
