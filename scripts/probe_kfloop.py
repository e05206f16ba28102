"""Probe: where do kf_loop's ~400 ms/keyframe go? Times each piece of
_maybe_close_loop and the loop-scoring dispatch on the real backend."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from visual_slam_tpu.config import SlamConfig
from visual_slam_tpu import pipeline as pl
from visual_slam_tpu.utils.dataset import ICLNUIMDataset

DATA = "/root/reference/data/ICL_NUIM"
N = 200

ds = ICLNUIMDataset(DATA)
frames = [np.asarray(ds.gray(i)) for i in range(N)]


def mem_iter():
    for i in range(N):
        yield i, frames[i], None


# Wrap the interesting methods with timers.
orig_consume = pl.Slam._apply_pending_loop
orig_close = pl.Slam._maybe_close_loop
orig_dispatch = pl.Slam._dispatch_loop_scores
orig_insert = pl.Slam._insert_keyframe
log = []


def timed(name, fn):
    def wrap(self, *a, **k):
        t0 = time.perf_counter()
        out = fn(self, *a, **k)
        log.append((name, time.perf_counter() - t0))
        return out
    return wrap


def close_instrumented(self, kf_id, feats, scores_dev):
    t0 = time.perf_counter()
    scores = np.asarray(scores_dev)
    t1 = time.perf_counter()
    log.append(("  asarray(scores)", t1 - t0))
    import visual_slam_tpu.models.loop_closure as lc_mod
    cand = lc_mod.find_candidate(scores, kf_id, self.cfg.loop)
    log.append(("  find_candidate", time.perf_counter() - t1))
    if cand is None:
        return
    t2 = time.perf_counter()
    orig_close(self, kf_id, feats, scores_dev)
    log.append(("  verify+close", time.perf_counter() - t2))


pl.Slam._maybe_close_loop = close_instrumented
pl.Slam._dispatch_loop_scores = timed("dispatch_loop_scores", orig_dispatch)
pl.Slam._insert_keyframe = timed("insert_keyframe_total", orig_insert)

cfg = SlamConfig()
t0 = time.perf_counter()
slam = pl.run_windowed(pl.Slam(cfg), mem_iter(), window=16)
wall = time.perf_counter() - t0
print(f"wall {wall:.2f}s  fps {N/wall:.1f}  kf {slam.stats['keyframes']}")
from collections import defaultdict
agg = defaultdict(list)
for name, dt in log:
    agg[name].append(dt * 1000)
for name, v in agg.items():
    print(f"{name:28s} n={len(v):3d} mean={np.mean(v):8.2f}ms max={np.max(v):8.2f}ms total={np.sum(v)/1000:6.2f}s")
print({k: round(v, 1) for k, v in slam.timers.summary().items()})
