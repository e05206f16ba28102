"""Host-side visualization and export.

Replaces the reference's Pangolin process viewer (src/v2/viewer.py:9-257)
with headless artifacts (SURVEY.md §2.2: "optional host viewer/trajectory
dump"): trajectory plots, map-point PLY export, and match-overlay images.
"""
from __future__ import annotations

import numpy as np


def plot_trajectory(
    est_positions: np.ndarray,
    gt_positions: np.ndarray | None = None,
    path: str = "trajectory.png",
    title: str = "trajectory",
) -> None:
    """Top-down (x,z) + side (x,y) trajectory plot saved as PNG."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(12, 5))
    for ax, (i, j, name) in zip(axes, [(0, 2, "x/z"), (0, 1, "x/y")]):
        ax.plot(est_positions[:, i], est_positions[:, j], "b-", label="estimate")
        if gt_positions is not None:
            ax.plot(gt_positions[:, i], gt_positions[:, j], "g--", label="ground truth")
        ax.set_xlabel(name.split("/")[0])
        ax.set_ylabel(name.split("/")[1])
        ax.axis("equal")
        ax.legend()
    fig.suptitle(title)
    fig.savefig(path, dpi=110, bbox_inches="tight")
    plt.close(fig)


def save_ply(
    path: str,
    points: np.ndarray,
    colors: np.ndarray | None = None,
    valid: np.ndarray | None = None,
) -> None:
    """Write map points as an ASCII PLY point cloud."""
    if valid is not None:
        points = points[valid]
        if colors is not None:
            colors = colors[valid]
    n = len(points)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {n}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if colors is not None:
            f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write("end_header\n")
        # Vectorized body: LiveView calls this on the tracking hot path,
        # and a per-point Python f-string loop over 10k-100k landmarks
        # costs tens of ms per dump.
        if colors is not None:
            body = np.concatenate(
                [np.asarray(points, np.float64), np.asarray(colors, np.float64)],
                axis=1,
            )
            np.savetxt(f, body, fmt="%.5f %.5f %.5f %d %d %d")
        else:
            np.savetxt(f, np.asarray(points, np.float64), fmt="%.5f")


class LiveView:
    """Incremental headless viewer: the run-time observability analog of the
    reference's Pangolin process (src/v2/viewer.py:9-257, fed per frame via
    update_pose/update_image Queues). Instead of a GL window, it atomically
    rewrites a watch directory every `every` frames:

      state.json       frame index, keyframe/point counts, current position
      trajectory.png   top-down + side trajectory (with GT when available)
      map.ply          current landmark cloud
      frame.png        current camera image with tracked-match overlay
                       (≙ the reference viewer's update_image stream,
                       src/v2/viewer.py:30-35, fed from main.py:216) —
                       written when the driver supplies the frame (the
                       windowed driver does; see pipeline._walk_window)

    Files are written to `<name>.tmp` then os.replace()d, so an external
    watcher (image viewer on refresh, `watch cat state.json`, a point-cloud
    tool reloading map.ply) always sees a complete, current artifact.

    Use as the `on_frame` callback of pipeline.run_sequence/run_pipelined,
    or via the CLI: `python -m visual_slam_tpu.pipeline --live-dump DIR`.
    """

    def __init__(
        self,
        out_dir: str,
        every: int = 25,
        gt_positions: np.ndarray | None = None,
        plot: bool = True,
    ):
        import os

        self.out_dir = out_dir
        self.every = max(int(every), 1)
        self.gt = gt_positions
        self.plot = plot
        self.n_updates = 0
        self._last = None
        self.wants_image = True  # drivers pass gray/uv overlays when set
        os.makedirs(out_dir, exist_ok=True)

    def _atomic(self, name: str):
        import os

        # Keep the real extension on the temp file (matplotlib infers the
        # image format from it).
        return (
            os.path.join(self.out_dir, ".tmp." + name),
            os.path.join(self.out_dir, name),
        )

    def __call__(
        self,
        slam,
        frame_idx: int,
        gray: np.ndarray | None = None,
        uv_prev: np.ndarray | None = None,
        uv_cur: np.ndarray | None = None,
    ) -> None:
        import json
        import os

        if self._last is not None and frame_idx - self._last < self.every:
            return
        self._last = frame_idx
        self.n_updates += 1

        if gray is not None:
            tmp, path = self._atomic("frame.png")
            try:
                self._write_frame_overlay(tmp, gray, uv_prev, uv_cur)
                os.replace(tmp, path)
            except Exception:
                pass  # viewer artifacts must never kill the pipeline

        idxs, est = slam.positions()
        state = {
            "frame": int(frame_idx),
            "initialized": bool(slam.initialized),
            "keyframes": int(slam.stats.get("keyframes", 0)),
            "points": int(np.asarray(slam.map.pt_valid).sum()),
            "trajectory_len": len(idxs),
            "position": [float(x) for x in est[-1]] if len(est) else None,
            "updates": self.n_updates,
        }
        tmp, path = self._atomic("state.json")
        with open(tmp, "w") as f:
            json.dump(state, f, indent=1)
        os.replace(tmp, path)

        # 3D polyline for the interactive browser viewer (viewer.html).
        tmp, path = self._atomic("trajectory.json")
        with open(tmp, "w") as f:
            json.dump(
                {"positions": np.asarray(est, np.float64).round(5).tolist()}, f
            )
        os.replace(tmp, path)

        if len(est) >= 2 and self.plot:
            gt = None
            if self.gt is not None:
                gt = self.gt[np.clip(np.asarray(idxs), 0, len(self.gt) - 1)]
            tmp, path = self._atomic("trajectory.png")
            plot_trajectory(est, gt, tmp, title=f"frame {frame_idx}")
            os.replace(tmp, path)

        if state["points"]:
            tmp, path = self._atomic("map.ply")
            save_ply(
                tmp,
                np.asarray(slam.map.pt_xyz),
                valid=np.asarray(slam.map.pt_valid).astype(bool),
            )
            os.replace(tmp, path)


def _overlay_image(
    gray: np.ndarray,
    uv_prev: np.ndarray | None,
    uv_cur: np.ndarray | None,
) -> "object":
    """RGB PIL image: the camera frame with tracked-match lines drawn from
    each landmark's keyframe pixel (green dot) to its current pixel (red)."""
    from PIL import Image, ImageDraw

    g = np.asarray(gray)
    if g.dtype != np.uint8:
        g = np.clip(g * 255.0, 0, 255).astype(np.uint8)
    img = Image.fromarray(g).convert("RGB")
    d = ImageDraw.Draw(img)
    if uv_cur is not None and len(uv_cur):
        if uv_prev is not None and len(uv_prev) == len(uv_cur):
            for (x0, y0), (x1, y1) in zip(uv_prev, uv_cur):
                d.line([(float(x0), float(y0)), (float(x1), float(y1))],
                       fill=(60, 220, 60), width=1)
        for x1, y1 in uv_cur:
            d.ellipse(
                [float(x1) - 2, float(y1) - 2, float(x1) + 2, float(y1) + 2],
                outline=(230, 60, 60),
            )
    return img


# LiveView helper: bound late so tests can call it standalone.
def _live_write_frame_overlay(self, path, gray, uv_prev, uv_cur):
    _overlay_image(gray, uv_prev, uv_cur).save(path, format="PNG")


LiveView._write_frame_overlay = _live_write_frame_overlay


def draw_matches(
    img1: np.ndarray,
    uv1: np.ndarray,
    img2: np.ndarray,
    uv2: np.ndarray,
    good: np.ndarray,
    path: str = "matches.png",
) -> None:
    """Side-by-side match visualization (≙ cv2.drawMatchesKnn overlay the
    reference feeds its viewer, src/v2/main.py:216)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    h = max(img1.shape[0], img2.shape[0])
    w = img1.shape[1] + img2.shape[1]
    canvas = np.zeros((h, w), np.float32)
    canvas[: img1.shape[0], : img1.shape[1]] = img1
    canvas[: img2.shape[0], img1.shape[1] :] = img2
    fig, ax = plt.subplots(figsize=(14, 6))
    ax.imshow(canvas, cmap="gray")
    off = img1.shape[1]
    for i in np.where(good)[0]:
        ax.plot(
            [uv1[i, 0], uv2[i, 0] + off],
            [uv1[i, 1], uv2[i, 1]],
            "-",
            lw=0.5,
            alpha=0.6,
        )
    ax.axis("off")
    fig.savefig(path, dpi=110, bbox_inches="tight")
    plt.close(fig)
