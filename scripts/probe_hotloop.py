"""Per-stage wall-clock breakdown of the pipelined TPU loop: where do the
seconds go? Wraps Slam methods with timers, runs 200 frames at depth 6."""
import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from visual_slam_tpu.config import SlamConfig
    from visual_slam_tpu import pipeline as pl
    from visual_slam_tpu.utils.dataset import ICLNUIMDataset

    N = 200
    ds = ICLNUIMDataset("/root/reference/data/ICL_NUIM")
    frames = [np.asarray(ds.gray(i)) for i in range(N)]

    def mem_iter():
        for i in range(N):
            yield i, jax.device_put(frames[i]), None

    # Warm.
    pl.run_pipelined(pl.Slam(SlamConfig()), mem_iter(), pipeline_depth=6)

    acc = defaultdict(float)
    cnt = defaultdict(int)

    def wrap(cls, name):
        orig = getattr(cls, name)

        def timed(self, *a, **k):
            t0 = time.perf_counter()
            out = orig(self, *a, **k)
            acc[name] += time.perf_counter() - t0
            cnt[name] += 1
            return out

        setattr(cls, name, timed)

    for m in (
        "_dispatch_init", "_consume_init", "_dispatch_track", "_consume_track",
        "_insert_keyframe", "_mine_new_points", "_dispatch_ba",
        "_apply_pending_ba", "_dispatch_loop_scores", "_dispatch_loop_verify",
        "_finish_keyframe", "_relocalize",
    ):
        wrap(pl.Slam, m)

    import visual_slam_tpu.models.frontend as fe

    orig_extract = fe.extract

    def timed_extract(*a, **k):
        t0 = time.perf_counter()
        out = orig_extract(*a, **k)
        acc["extract_dispatch"] += time.perf_counter() - t0
        cnt["extract_dispatch"] += 1
        return out

    fe.extract = timed_extract
    pl.frontend.extract = timed_extract

    t0 = time.perf_counter()
    slam = pl.run_pipelined(pl.Slam(SlamConfig()), mem_iter(), pipeline_depth=6)
    total = time.perf_counter() - t0
    print(f"total {total:.2f}s  = {N/total:.1f} fps   stats {slam.stats}")
    # Nested timers double-count (_insert_keyframe contains mine/ba/loop):
    # report all, reader subtracts.
    for k in sorted(acc, key=lambda k: -acc[k]):
        print(f"  {k:24s} {acc[k]*1000:8.0f} ms  x{cnt[k]:4d}  ({acc[k]/max(cnt[k],1)*1000:6.1f} ms/call)")


if __name__ == "__main__":
    main()
