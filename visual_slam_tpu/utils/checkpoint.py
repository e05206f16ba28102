"""Map / trajectory checkpoint and resume.

The reference has no checkpointing at all (SURVEY.md §5: closest artifact is
the g2o graph dump). Here the whole SoA map state serializes losslessly to a
single compressed npz (plus optional g2o export for interop via
utils.g2o_io), and a Slam session can resume from it.
"""
from __future__ import annotations

import numpy as np

from ..models.map_state import MapConfig, SlamMap

_ARRAYS = [
    "kf_R",
    "kf_t",
    "kf_valid",
    "kf_frame_idx",
    "kf_scale_meas",
    "pt_xyz",
    "pt_desc",
    "pt_valid",
    "pt_views",
    "obs_cam",
    "obs_pt",
    "obs_uv",
    "obs_valid",
]
_COUNTERS = ["n_kf", "n_pt", "n_obs"]


def save_map(path: str, m: SlamMap, trajectory: np.ndarray | None = None) -> None:
    data = {k: getattr(m, k) for k in _ARRAYS}
    data.update({k: np.asarray(getattr(m, k)) for k in _COUNTERS})
    data["config"] = np.asarray(
        [
            m.config.max_keyframes,
            m.config.max_points,
            m.config.max_observations,
            m.config.track_capacity,
        ]
    )
    if trajectory is not None:
        data["trajectory"] = trajectory
    np.savez_compressed(path, **data)


def load_map(path: str) -> tuple[SlamMap, np.ndarray | None]:
    z = np.load(path)
    cfg = MapConfig(*[int(v) for v in z["config"]])
    m = SlamMap(cfg)
    for k in _ARRAYS:
        setattr(m, k, z[k].copy())
    for k in _COUNTERS:
        setattr(m, k, int(z[k]))
    traj = z["trajectory"] if "trajectory" in z else None
    return m, traj
