"""Worker process for the multi-host distributed-BA test.

Launched N times by tests/test_multihost.py with VSLAM_* env vars set and
M virtual CPU devices per process; joins the jax.distributed cluster, runs
the landmark-sharded BA over the global (N*M)-device mesh, and (process 0)
writes the replicated results to an .npz for the test to compare against
the single-process solver.

Usage: python scripts/multihost_ba_worker.py <out.npz>
"""
import os
import sys

# Per-process virtual CPU devices: XLA_FLAGS must be in place before the
# backend initializes. This sandbox's sitecustomize pins `jax_platforms`
# (plain JAX_PLATFORMS env is ignored), so the platform is forced through
# jax.config below, before any backend use.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    n_local = os.environ.get("VSLAM_LOCAL_DEVICES", "4")
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={n_local}"
    ).strip()

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from visual_slam_tpu.parallel import multihost, sharded_ba
from visual_slam_tpu.models import ba


def synthetic_problem(K=4, n_pts=64, noise=0.03, seed=0):
    """Deterministic synthetic BA problem (same on every process)."""
    rng = np.random.RandomState(seed)
    X_gt = rng.uniform(-1, 1, (n_pts, 3)).astype(np.float32)
    X_gt[:, 2] += 4.0
    R = np.tile(np.eye(3, dtype=np.float32), (K, 1, 1))
    t = np.stack(
        [np.array([0.4 * k, 0.05 * k, 0.0], np.float32) for k in range(K)]
    )
    intr = np.array([480.0, 480.0, 320.0, 240.0], np.float32)
    cam = np.repeat(np.arange(K), n_pts).astype(np.int32)
    pnt = np.tile(np.arange(n_pts), K).astype(np.int32)
    Xc = np.einsum("kij,nj->kni", R, X_gt) + t[:, None, :]
    Xc = Xc.reshape(-1, 3)
    uv = np.stack(
        [
            intr[0] * Xc[:, 0] / Xc[:, 2] + intr[2],
            intr[1] * Xc[:, 1] / Xc[:, 2] + intr[3],
        ],
        -1,
    ).astype(np.float32)
    uv += rng.normal(0, 0.3, uv.shape).astype(np.float32)
    w = np.ones(len(cam), np.float32)
    X0 = X_gt + rng.normal(0, noise, X_gt.shape).astype(np.float32)
    cam_fixed = np.zeros(K, bool)
    cam_fixed[0] = True
    t0 = t + rng.normal(0, 0.01, t.shape).astype(np.float32)
    t0[0] = t[0]
    prob, meta = ba.make_problem(
        R=R, t=t0, X=X0, cam=cam, pnt=pnt, uv=uv, w=w,
        intr=intr, cam_fixed=cam_fixed,
    )
    return prob


def main():
    out_path = sys.argv[1]
    pid = multihost.initialize_from_env()
    n_dev = len(jax.devices())
    prob = synthetic_problem()
    mesh = multihost.global_mesh("pt")
    gprob = multihost.make_global_problem(prob, mesh)
    out, cost = sharded_ba.optimize_sharded(
        gprob, mesh, n_iters=6, cg_iters=8, solver="cg"
    )
    # R, t, cost are replicated -> fully addressable on every process.
    R = np.asarray(out.R)
    t = np.asarray(out.t)
    c = float(np.asarray(cost))
    # X is landmark-sharded: collect this process's shards.
    shards = multihost.gather_shards(out.X)
    if pid == 0:
        np.savez(
            out_path,
            R=R,
            t=t,
            cost=c,
            n_devices=n_dev,
            n_processes=jax.process_count(),
            shard_starts=np.array([idx[0].start or 0 for idx, _ in shards]),
            shard_data=np.concatenate([d for _, d in shards]),
        )
    else:
        # Non-zero processes write their X shards alongside for the test.
        np.savez(
            out_path + f".p{pid}",
            shard_starts=np.array([idx[0].start or 0 for idx, _ in shards]),
            shard_data=np.concatenate([d for _, d in shards]),
        )
    print(f"proc {pid}: {n_dev} global devices, cost {c:.6f}", flush=True)


if __name__ == "__main__":
    main()
