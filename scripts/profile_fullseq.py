"""Instrument the full-sequence bench configuration (VERDICT r4 next #1).

Runs the exact bench.fullseq() path (1200 frames, pipelined, loop closure
+ final PGO) with:
  - the run_pipelined per-phase prof dict,
  - slam.timers per-stage summary,
  - wall split: init phase / tracking phase / PGO,
  - compile counting via jax's compilation logging (each first-time jit on
    this tunneled backend costs seconds; the fullseq capacity bucket's
    shapes are NOT covered by the 200-frame warm-up).

Usage: python scripts/profile_fullseq.py [frames] [mono|rgbd]
"""
import json
import logging
import os
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from visual_slam_tpu.pipeline import run_sequence, size_config_for
from visual_slam_tpu.utils.dataset import ICLNUIMDataset
from visual_slam_tpu.utils import evaluate

FRAMES = int(sys.argv[1]) if len(sys.argv) > 1 else 1200
RGBD = len(sys.argv) > 2 and sys.argv[2] == "rgbd"


class CompileLog(logging.Handler):
    """Capture 'Finished XLA compilation of <name> in <t> sec' records."""

    def __init__(self):
        super().__init__()
        self.events = []

    def emit(self, record):
        msg = record.getMessage()
        if "Finished XLA compilation" in msg:
            self.events.append((time.perf_counter(), msg))


def main():
    handler = CompileLog()
    for name in ("jax._src.interpreters.pxla", "jax._src.dispatch"):
        lg = logging.getLogger(name)
        lg.addHandler(handler)
        lg.setLevel(logging.DEBUG)
        lg.propagate = False  # keep the DEBUG flood off stderr

    ds = ICLNUIMDataset("/root/reference/data/ICL_NUIM")
    gt = ds.ground_truth()
    fcfg = size_config_for(FRAMES)
    fcfg.use_depth = RGBD
    prof = {}

    phase = {"init_done": None}

    def cb(s, i, **kw):
        if s.initialized and phase["init_done"] is None:
            phase["init_done"] = (time.perf_counter(), i)

    t_start = time.perf_counter()
    try:
        s = run_sequence(
            ds, fcfg, 0, FRAMES, pipelined=True, pipeline_depth=6,
            prof=prof, on_frame=cb,
        )
    except TypeError:  # pre-r5 run_sequence has no prof parameter (A/B runs)
        t_start = time.perf_counter()
        s = run_sequence(
            ds, fcfg, 0, FRAMES, pipelined=True, pipeline_depth=6,
            on_frame=cb,
        )
    t_track_end = time.perf_counter()
    s.optimize_pose_graph()
    t_end = time.perf_counter()

    idxs, est = s.positions()
    gp = gt[np.clip(idxs, 0, len(gt) - 1), :3, 3]
    rmse, _ = evaluate.ate_rmse(est, gp, align_scale=not RGBD)

    wall = t_end - t_start
    compile_s = 0.0
    import re

    for _, msg in handler.events:
        m = re.search(r"in ([0-9.]+) sec", msg)
        if m:
            compile_s += float(m.group(1))
    out = {
        "frames": FRAMES,
        "mode": "rgbd" if RGBD else "mono",
        "fps": round(FRAMES / wall, 2),
        "wall_s": round(wall, 2),
        "pgo_s": round(t_end - t_track_end, 2),
        "init_phase_s": round(
            (phase["init_done"][0] - t_start) if phase["init_done"] else wall, 2
        ),
        "init_frame": phase["init_done"][1] if phase["init_done"] else None,
        "ate_rmse_m": round(rmse, 5),
        "keyframes": s.stats["keyframes"],
        "loop_closures": s.stats.get("loop_closures", 0),
        "track_failures": s.stats.get("track_failures", 0),
        "n_compiles": len(handler.events),
        "compile_wall_s": round(compile_s, 2),
        "prof_ms_per_frame": {
            k: round(v / FRAMES * 1e3, 3) for k, v in sorted(prof.items())
        },
        "prof_total_s": round(sum(prof.values()), 2),
        "stage_ms_per_call": {
            k: v["ms_per_call"] for k, v in s.timers.summary().items()
        },
        "stage_total_s": {
            k: round(v["total_s"], 2) for k, v in s.timers.summary().items()
        },
        "stats": {
            k: v for k, v in s.stats.items()
            if isinstance(v, (int, float)) and not isinstance(v, bool)
        },
    }
    # Final BA problem shape (padding diagnosis).
    m = s.map
    nob = m.n_obs
    live = m.obs_valid[:nob] & m.pt_valid[m.obs_pt[:nob]]
    cnt = np.bincount(m.obs_pt[:nob][live])
    cnt = cnt[cnt > 0]
    if len(cnt):
        out["ba_shape"] = {
            "live_obs": int(live.sum()), "n_pts": int(m.pt_valid.sum()),
            "obs_per_pt_max": int(cnt.max()),
            "obs_per_pt_mean": round(float(cnt.mean()), 2),
            "pts_gt_q16": int((cnt > 16).sum()),
            "pts_gt_q32": int((cnt > 32).sum()),
        }

    dump = os.environ.get("VSLAM_PROF_DUMP")
    if dump:
        np.savez(
            dump, idxs=idxs, est=est, gt=gp,
            kf=np.array([f.frame_idx for f in s.trajectory if f.is_keyframe]),
        )
    print(json.dumps(out, indent=1))
    # Compile events worth seeing: anything that took > 0.3 s.
    for ts, msg in handler.events:
        m = re.search(r"in ([0-9.]+) sec", msg)
        if m and float(m.group(1)) > 0.3:
            print(f"  +{ts - t_start:8.1f}s  {msg[:160]}")
    s.close()


if __name__ == "__main__":
    main()
