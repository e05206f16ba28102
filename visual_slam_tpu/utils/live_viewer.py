"""Serve the interactive live 3D viewer over a LiveView dump directory.

The browser-based analog of the reference's Pangolin viewer process
(src/v2/viewer.py:9-257): `utils/viewer.html` polls the atomically-written
state.json / trajectory.json / map.ply that utils.viz.LiveView maintains
during a run, and renders map points + trajectory + live stats with orbit
controls — zero dependencies, any browser.

Usage:
  python -m visual_slam_tpu.pipeline --frames 500 --live-dump /tmp/live &
  python -m visual_slam_tpu.utils.live_viewer /tmp/live [port]
"""
from __future__ import annotations

import os
import shutil
import sys


def serve(dump_dir: str, port: int = 8642) -> None:
    """Copy viewer.html into `dump_dir` and serve it with http.server."""
    import functools
    import http.server

    src = os.path.join(os.path.dirname(os.path.abspath(__file__)), "viewer.html")
    os.makedirs(dump_dir, exist_ok=True)
    shutil.copyfile(src, os.path.join(dump_dir, "viewer.html"))
    handler = functools.partial(
        http.server.SimpleHTTPRequestHandler, directory=dump_dir
    )
    with http.server.ThreadingHTTPServer(("127.0.0.1", port), handler) as httpd:
        print(f"live viewer: http://127.0.0.1:{port}/viewer.html")
        httpd.serve_forever()


if __name__ == "__main__":
    serve(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 8642)
