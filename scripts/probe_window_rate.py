"""Decompose the windowed tracking rate on the real chip.

Measures, per 16-frame window:
  A. _track_window dispatches chained on device, ONE terminal sync
     (pure device compute slope — the speed of light for the loop)
  B. A + fetch of every window's blobs (the production fetch pattern)
  C. B + fresh H2D device_put of the frame stack each window
  D. the per-dispatch rate of the single-frame extract+track pair
     (bench.py's fps_device_rate_per_dispatch analog)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from visual_slam_tpu.config import SlamConfig
from visual_slam_tpu import pipeline as pl
from visual_slam_tpu.utils.dataset import ICLNUIMDataset

W = int(os.environ.get("W", "16"))
N_WIN = 8

ds = ICLNUIMDataset("/root/reference/data/ICL_NUIM")
frames = np.stack([np.asarray(ds.gray(i)) for i in range(100, 100 + W)])

cfg = SlamConfig()
# Build a real map snapshot by running the first 80 frames.
def it():
    for i in range(80):
        yield i, np.asarray(ds.gray(i)), None
slam = pl.run_windowed(pl.Slam(cfg), it(), window=W)
snap = slam._snapshot
print("map points:", snap["n_valid"], "kf:", slam.stats["keyframes"])

fq = cfg.frontend
tcfg = cfg.tracking
intr = slam.intr
keys = jax.random.split(jax.random.PRNGKey(0), W)
R0 = jnp.asarray(slam._prev_R)
t0 = jnp.asarray(slam._prev_t)
grays_dev = jax.device_put(frames)
jax.block_until_ready(grays_dev)

kw = dict(
    window=W, max_features=fq.max_features, quality_level=fq.quality_level,
    nms_radius=fq.nms_radius, interpret=False,
    n_hyps=tcfg.pnp_hypotheses, refine_iters=tcfg.refine_iters,
    cross_check=fq.cross_check, min_track_pts=tcfg.min_tracked_points,
)

def track(g, R, t):
    return pl._track_window(
        g, snap["desc"], snap["xyz"], snap["valid"], R, t, intr, keys,
        fq.match_ratio, fq.max_hamming, tcfg.pnp_threshold_px, **kw,
    )

# Warm.
blobs, R, t = track(grays_dev, R0, t0)
np.asarray(blobs)

def timeit(name, fn, per_frame=W * N_WIN):
    t0_ = time.perf_counter()
    fn()
    dt = time.perf_counter() - t0_
    print(f"{name:38s} {dt*1000:8.1f} ms  {per_frame/dt:7.1f} fps  {dt*1000/per_frame:6.2f} ms/frame")

def runA():
    R, t = R0, t0
    out = []
    for _ in range(N_WIN):
        blobs, R, t = track(grays_dev, R, t)
        out.append(blobs)
    np.asarray(out[-1][-1, :12])  # one tiny terminal fetch

def runB():
    R, t = R0, t0
    for _ in range(N_WIN):
        blobs, R, t = track(grays_dev, R, t)
        res = [np.asarray(blobs)]

def runB_async():
    R, t = R0, t0
    prev = None
    for _ in range(N_WIN):
        blobs, R, t = track(grays_dev, R, t)
        try:
            blobs.copy_to_host_async()
        except AttributeError:
            pass
        if prev is not None:
            np.asarray(prev)
        prev = blobs
    np.asarray(prev)

def runC():
    R, t = R0, t0
    prev = None
    for _ in range(N_WIN):
        g = jax.device_put(frames)
        blobs, R, t = track(g, R, t)
        try:
            blobs.copy_to_host_async()
        except AttributeError:
            pass
        if prev is not None:
            np.asarray(prev)
        prev = blobs
    np.asarray(prev)

for name, fn in [("A device-chained, 1 sync", runA),
                 ("B + sync fetch per window", runB),
                 ("B' + async fetch (speculative)", runB_async),
                 ("C = B' + fresh H2D per window", runC)]:
    fn()  # warm path
    timeit(name, fn)

# D: per-dispatch single-frame rate.
from visual_slam_tpu.models import frontend as fe
one = jax.device_put(frames[0])
jax.block_until_ready(one)
def single():
    R, t = R0, t0
    key = keys[0]
    last = None
    for i in range(64):
        feats = fe.extract(one, fq.max_features, fq.quality_level, fq.nms_radius)
        blob, R, t = pl._track_step(
            feats.desc, feats.uv, feats.valid,
            snap["desc"], snap["xyz"], snap["valid"], R, t, intr, key,
            fq.match_ratio, fq.max_hamming, tcfg.pnp_threshold_px,
            n_hyps=tcfg.pnp_hypotheses, refine_iters=tcfg.refine_iters,
        )
        last = blob
    np.asarray(last[:12])
single()
timeit("D per-dispatch extract+track x64", single, per_frame=64)
