"""Time the monocular init phase (frames 0..init_frame) vs tracking phase
on the real chip, with per-piece timers on the init window loop."""
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
from visual_slam_tpu import native

N = 200
ds = ICLNUIMDataset("/root/reference/data/ICL_NUIM")
if native.available():
    loader, off = ds.async_loader(0, N)
    frames = [loader.get_gray(i)[0] for i in range(N)]
    loader.close()
else:
    frames = [np.asarray(ds.gray(i)) for i in range(N)]


def it():
    for i in range(N):
        yield i, frames[i], None


# Instrument the init pieces.
orig_scan = pl._init_scan_window
scan_t = []
def scan_timed(*a, **k):
    t0 = time.perf_counter()
    out = orig_scan(*a, **k)
    scan_t.append(time.perf_counter() - t0)  # dispatch only (async)
    return out
pl._init_scan_window = scan_timed

orig_fetch = pl._fetch_now
fetch_t = []
def fetch_timed(*arrays):
    t0 = time.perf_counter()
    out = orig_fetch(*arrays)
    fetch_t.append(time.perf_counter() - t0)
    return out
pl._fetch_now = fetch_timed

marks = {}
orig_consume = pl.Slam._consume_init
def consume_timed(self, h):
    t0 = time.perf_counter()
    ok = orig_consume(self, h)
    marks.setdefault("consume", []).append(time.perf_counter() - t0)
    if ok:
        marks["accept_time"] = time.perf_counter()
    return ok
pl.Slam._consume_init = consume_timed

for rep in range(2):
    scan_t.clear(); fetch_t.clear(); marks.clear()
    t0 = time.perf_counter()
    marks["t0"] = t0
    slam = pl.run_windowed(pl.Slam(SlamConfig()), it(), window=16)
    total = time.perf_counter() - t0
    init_s = marks.get("accept_time", t0) - t0
    print(f"rep{rep}: total {total:.2f}s ({N/total:.1f} fps)  "
          f"init {init_s:.2f}s  tracking {total-init_s:.2f}s "
          f"({(N-slam.stats['init_frame'])/(total-init_s):.1f} fps)  "
          f"init_frame {slam.stats['init_frame']}")
    print(f"  scans: n={len(scan_t)} dispatch {1000*np.sum(scan_t):.0f} ms; "
          f"fetches: n={len(fetch_t)} total {1000*np.sum(fetch_t):.0f} ms "
          f"(init-phase fetches included); consume {1000*np.sum(marks.get('consume',[0])):.0f} ms")
