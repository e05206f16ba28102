"""BASELINE.json config #5: large-map BA at ~5k keyframes / ~1M landmarks.

Builds a synthetic loop-trajectory map at full config-#5 scale, runs the
memory-linear large-map solver (models/ba_large.py) landmark-sharded over
an N-device mesh, verifies convergence (cost drop + pose recovery), and
reports LM iterations/s per mesh size.

Usage:
  python scripts/large_map_bench.py [--devices 8] [--kf 5000] [--pts 1048576]
      [--iters 3] [--platform cpu] [--sweep]

On this sandbox the multi-device mesh is 8 VIRTUAL CPU devices over 4
physical cores — the sweep demonstrates numerical identity and per-device
memory scaling, not wall-clock speedup (virtual devices timeshare cores).
"""
import argparse
import json
import os
import sys
import time

p = argparse.ArgumentParser()
p.add_argument("--devices", type=int, default=8)
p.add_argument("--kf", type=int, default=5000)
p.add_argument("--pts", type=int, default=1 << 20)
p.add_argument("--obs-per-pt", type=int, default=4)
p.add_argument("--iters", type=int, default=5)
p.add_argument("--cg-iters", type=int, default=8)
p.add_argument("--lm-lambda", type=float, default=1e-2)
p.add_argument("--platform", default="cpu")
p.add_argument("--sweep", action="store_true", help="sweep mesh sizes 1,2,4,8")
args = p.parse_args()

if args.platform == "cpu":
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()

import numpy as np
import jax

if args.platform:
    jax.config.update("jax_platforms", args.platform)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
from visual_slam_tpu.models import ba, ba_large
from visual_slam_tpu.ops import lie
from visual_slam_tpu.parallel import sharded_ba
from jax.sharding import Mesh


def build_problem(K, P, Q, seed=0):
    """Synthetic config-#5 map, constructed directly in packed planar form
    (point p's Q observations are consecutive cameras on a loop trajectory).
    """
    rng = np.random.RandomState(seed)
    N = P * Q
    # Loop trajectory: cameras on a circle, yawing along it.
    ang = 2 * np.pi * np.arange(K) / K
    radius = 8.0
    t_gt = np.stack(
        [radius * np.cos(ang), radius * np.sin(ang), 0.05 * np.sin(5 * ang)],
        -1,
    ).astype(np.float32)
    # Camera-to-world axes (columns): forward z_cam = (cos,sin,0) tangent to
    # the circle, y_cam = world +z, x_cam = y x z (right-handed).
    yaw = ang + np.pi / 2
    cy, sy = np.cos(yaw), np.sin(yaw)
    zero = np.zeros_like(cy)
    one = np.ones_like(cy)
    x_cam = np.stack([-sy, cy, zero], -1)
    y_cam = np.stack([zero, zero, one], -1)
    z_cam = np.stack([cy, sy, zero], -1)
    R_gt = np.stack([x_cam, y_cam, z_cam], axis=-1).astype(np.float32)
    # World->camera: R_cw = R_gt^T, t_cw = -R_cw @ C.
    R_cw = np.transpose(R_gt, (0, 2, 1)).copy()
    t_cw = -np.einsum("kij,kj->ki", R_cw, t_gt).astype(np.float32)
    # Each point is anchored near a camera's viewing frustum and observed by
    # Q cameras strided along the loop — the stride provides triangulation
    # parallax (consecutive cameras are near-identical viewpoints, which
    # leaves landmark depth unconstrained and the Schur system singular).
    stride = max(1, K // 128)
    base = rng.randint(0, K - Q * stride, P).astype(np.int32)
    C = t_gt[base]
    fwd = np.stack([np.cos(yaw[base]), np.sin(yaw[base]), 0 * yaw[base]], -1)
    X_gt = (
        C
        + fwd * rng.uniform(4.0, 9.0, (P, 1))
        + rng.normal(0, 0.8, (P, 3))
    ).astype(np.float32)
    cam = (
        base[:, None] + stride * np.arange(Q)[None, :]
    ).reshape(-1).astype(np.int32)
    intr = np.array([481.2, 480.0, 319.5, 239.5], np.float32)
    Rn = R_cw[cam]
    Xn = np.repeat(X_gt, Q, axis=0)
    Xc = np.einsum("nij,nj->ni", Rn, Xn) + t_cw[cam]
    z = Xc[:, 2]
    uv = np.stack(
        [
            intr[0] * Xc[:, 0] / np.maximum(z, 1e-3) + intr[2],
            intr[1] * Xc[:, 1] / np.maximum(z, 1e-3) + intr[3],
        ],
        -1,
    ).astype(np.float32)
    uv += rng.normal(0, 0.3, uv.shape).astype(np.float32)
    w = (z > 0.2).astype(np.float32)  # behind-camera slots are dead weight
    # Perturb initial estimates.
    t0 = t_cw + rng.normal(0, 0.02, t_cw.shape).astype(np.float32)
    dw = rng.normal(0, 0.004, (K, 3)).astype(np.float32)
    dR = np.asarray(jax.vmap(lie.so3_exp)(jnp.asarray(dw)))
    R0 = np.einsum("kij,kjl->kil", dR, R_cw).astype(np.float32)
    t0 = np.einsum("kij,kj->ki", dR, t_cw).astype(np.float32) + rng.normal(
        0, 0.02, (K, 3)
    ).astype(np.float32)
    R0[0], t0[0] = R_cw[0], t_cw[0]
    X0 = X_gt + rng.normal(0, 0.05, X_gt.shape).astype(np.float32)
    cam_fixed = np.zeros(K, bool)
    cam_fixed[0] = True
    se = np.zeros(1, np.float32)
    prob = ba.BAProblem(
        R=jnp.asarray(R0),
        t=jnp.asarray(t0),
        X=jnp.asarray(X0),
        pt_valid=jnp.ones(P, jnp.float32),
        cam=jnp.asarray(cam),
        uv=jnp.asarray(uv.T),
        w=jnp.asarray(w),
        intr=jnp.asarray(intr),
        cam_fixed=jnp.asarray(cam_fixed),
        se_i=jnp.zeros(1, jnp.int32),
        se_j=jnp.zeros(1, jnp.int32),
        se_meas=jnp.asarray(se),
        se_w=jnp.asarray(se),
        dinv=jnp.zeros(len(cam), jnp.float32),
        dw=jnp.zeros(len(cam), jnp.float32),
    )
    return prob, (R_cw, t_cw, X_gt)


def run(prob, mesh_n, gt):
    devs = jax.devices()[:mesh_n]
    mesh = Mesh(np.array(devs), ("pt",))
    t0 = time.perf_counter()
    out, cost = sharded_ba.optimize_large_sharded(
        prob, mesh, n_iters=args.iters, cg_iters=args.cg_iters,
        init_lambda=args.lm_lambda,
    )
    # Sync by fetching a value: on the tunneled axon backend,
    # block_until_ready can return before device completion.
    float(np.asarray(cost))
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    out, cost = sharded_ba.optimize_large_sharded(
        prob, mesh, n_iters=args.iters, cg_iters=args.cg_iters,
        init_lambda=args.lm_lambda,
    )
    float(np.asarray(cost))
    t_warm = time.perf_counter() - t0
    R_gt, t_gt, X_gt = gt
    t_err = float(np.abs(np.asarray(out.t) - t_gt).max())
    cost0 = float(np.asarray(ba_large._cost(prob)))
    return dict(
        mesh=mesh_n,
        iters_per_s=round(args.iters / t_warm, 3),
        wall_s_warm=round(t_warm, 2),
        wall_s_first=round(t_first, 2),
        cost_before=round(cost0, 1),
        cost_after=round(float(np.asarray(cost)), 1),
        max_t_err_m=round(t_err, 5),
    )


def main():
    K, P, Q = args.kf, args.pts, args.obs_per_pt
    print(
        f"building synthetic map: {K} keyframes, {P} landmarks, "
        f"{P*Q} observations",
        file=sys.stderr,
    )
    prob, gt = build_problem(K, P, Q)
    sizes = [1, 2, 4, 8] if args.sweep else [args.devices]
    sizes = [s for s in sizes if s <= len(jax.devices())]
    results = [run(prob, s, gt) for s in sizes]
    print(
        json.dumps(
            {
                "metric": "config#5 large-map BA (synthetic)",
                "keyframes": K,
                "landmarks": P,
                "observations": P * Q,
                "lm_iters": args.iters,
                "cg_iters": args.cg_iters,
                "backend": jax.default_backend(),
                "runs": results,
            }
        )
    )


if __name__ == "__main__":
    main()
