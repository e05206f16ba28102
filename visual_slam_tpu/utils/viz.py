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
        for i in range(n):
            row = f"{points[i, 0]:.5f} {points[i, 1]:.5f} {points[i, 2]:.5f}"
            if colors is not None:
                c = colors[i].astype(int)
                row += f" {c[0]} {c[1]} {c[2]}"
            f.write(row + "\n")


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
