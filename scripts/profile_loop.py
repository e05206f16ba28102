"""Instrument the pipelined bench loop: where do the per-frame ms go?"""
import json
import os
import sys
import time
from collections import defaultdict, deque

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from visual_slam_tpu.config import SlamConfig
    from visual_slam_tpu.pipeline import Slam
    from visual_slam_tpu.utils.dataset import ICLNUIMDataset
    from visual_slam_tpu.models import frontend as _fe
    from visual_slam_tpu import native

    N = int(os.environ.get("BENCH_FRAMES", "200"))
    D = int(os.environ.get("BENCH_PIPE_DEPTH", "6"))
    ds = ICLNUIMDataset("/root/reference/data/ICL_NUIM")
    loader, off = ds.async_loader(0, N)
    frames = [loader.get_gray(i)[0] for i in range(N)]
    loader.close()

    cfg = SlamConfig()
    warm = Slam(cfg)
    for i in range(70):
        warm.process(i, frames[i])
    del warm

    t = defaultdict(float)
    n = defaultdict(int)

    def clock(name, fn, *a, **k):
        t0 = time.perf_counter()
        out = fn(*a, **k)
        dt = time.perf_counter() - t0
        t[name] += dt
        n[name] += 1
        return out

    # patch keyframe insertion to time it separately from consume
    slam = Slam(SlamConfig())
    orig_insert = slam._insert_keyframe
    orig_mine = slam._mine_new_points
    orig_dba = slam._dispatch_ba
    slam._insert_keyframe = lambda *a, **k: clock("kf_insert", orig_insert, *a, **k)
    slam._mine_new_points = lambda *a, **k: clock("kf_mine", orig_mine, *a, **k)
    slam._dispatch_ba = lambda *a, **k: clock("kf_dispatch_ba", orig_dba, *a, **k)

    fq = cfg.frontend
    pending = deque()
    init_pending = deque()
    t0_all = time.perf_counter()
    for i in range(N):
        dev = clock("device_put", jax.device_put, frames[i])
        feats = clock("extract_dispatch", _fe.extract, dev, fq.max_features,
                      fq.quality_level, fq.nms_radius)
        if not slam.initialized:
            h = clock("init_dispatch", slam._dispatch_init, i, feats)
            if h is not None:
                init_pending.append(h)
            while len(init_pending) > D:
                if clock("init_consume", slam._consume_init, init_pending.popleft()):
                    init_pending.clear()
                    break
        else:
            init_pending.clear()
            clock("apply_ba", slam._apply_pending_ba)
            pending.append(clock("track_dispatch", slam._dispatch_track, i, feats, None))
            if len(pending) > D:
                clock("consume", slam._consume_track, pending.popleft())
    while init_pending:
        if slam._consume_init(init_pending.popleft()):
            break
    while pending:
        clock("consume", slam._consume_track, pending.popleft())
    dt_all = time.perf_counter() - t0_all

    out = {
        "fps": round(N / dt_all, 2),
        "total_s": round(dt_all, 3),
        "stages_ms_total": {k: round(v * 1000, 1) for k, v in sorted(t.items())},
        "stages_ms_per_call": {
            k: round(v * 1000 / max(n[k], 1), 3) for k, v in sorted(t.items())
        },
        "calls": dict(n),
        "keyframes": slam.stats["keyframes"],
        "accounted_ms": round(sum(t.values()) * 1000, 1),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
