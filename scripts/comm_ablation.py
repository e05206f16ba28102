"""Collective-cost ablation for the landmark-sharded large-map BA solver.

Round-3's weak-scaling sweep (scripts/weak_scaling.py) timed n virtual
devices timesharing 4 physical cores against wall(n)=n*wall(1) — a
methodology whose noise (measured 112-192% "efficiency") cannot resolve
the 80% north-star question. This script isolates the collective cost
DIRECTLY, per VERDICT r3 next #7: the SAME sharded problem is timed twice
on the same mesh —

  (a) production: per-shard solver with axis_name set (psum over the mesh
      after every camera-side reduction + each CG matvec), and
  (b) ablated: the identical shard_map'd computation with axis_name=None
      (every psum removed; each shard runs the same local flops on the
      same slice sizes, producing per-shard-local results that are
      numerically meaningless but computationally identical).

comm_fraction(n) = (t_a - t_b) / t_a. Both runs share substrate,
timesharing, and compiler, so the subtraction cancels everything except
the collectives + the cross-device synchronization they impose. Compare
against the analytic model (BASELINE.md round-3): psum payload per LM iter
= K*(36+6+6+cg*6)*4 B.

Usage: python scripts/comm_ablation.py [--sizes 1,2,4,8] [--pts 262144]
"""
import argparse
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# 8 virtual CPU devices (must be set before jax import).
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
from jax.sharding import PartitionSpec as P
from jax import shard_map


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1,2,4,8")
    ap.add_argument("--pts", type=int, default=262144)
    ap.add_argument("--kf", type=int, default=512)
    ap.add_argument("--q", type=int, default=4)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--cg", type=int, default=8)
    args = ap.parse_args()

    from visual_slam_tpu.models import ba_large
    from visual_slam_tpu.parallel import mesh as mesh_mod
    from visual_slam_tpu.parallel.sharded_ba import problem_specs
    from visual_slam_tpu.utils.synthetic import build_loop_map

    prob, _ = build_loop_map(args.kf, args.pts, args.q)
    K = args.kf

    def make_runner(mesh, with_psum: bool):
        axis = mesh.axis_names[0]
        in_specs = problem_specs(axis)
        out_specs = (in_specs, P())

        @partial(
            shard_map, mesh=mesh, in_specs=(in_specs,), out_specs=out_specs,
            check_vma=False,  # ablated variant's outputs are shard-local
        )
        def _run(p):
            return ba_large.optimize(
                p, n_iters=args.iters, cg_iters=args.cg,
                init_lambda=1e-2,
                axis_name=axis if with_psum else None,
            )

        return jax.jit(_run)

    rows = []
    for n in [int(s) for s in args.sizes.split(",")]:
        mesh = mesh_mod.make_mesh(n, axis="pt")
        out = {}
        for name, with_psum in (("psum", True), ("ablated", False)):
            run = make_runner(mesh, with_psum)
            r = run(prob)
            jax.block_until_ready(r[1])  # warm + compile
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                r = run(prob)
                jax.block_until_ready(r[1])
                ts.append(time.perf_counter() - t0)
            out[name] = min(ts)  # min over reps: timesharing noise is +ve
        t_comm = max(out["psum"] - out["ablated"], 0.0)
        payload_mb = K * (36 + 6 + 6 + args.cg * 6) * 4 * args.iters / 1e6
        rows.append(
            dict(
                devices=n,
                s_per_run_psum=round(out["psum"], 3),
                s_per_run_ablated=round(out["ablated"], 3),
                comm_s=round(t_comm, 3),
                comm_fraction_pct=round(100 * t_comm / out["psum"], 1),
                model_psum_payload_mb=round(payload_mb, 3),
            )
        )
        print(json.dumps(rows[-1]))
    print(json.dumps(dict(
        metric="comm-ablation config#5-family",
        kf=K, pts=args.pts, obs=args.pts * args.q,
        lm_iters=args.iters, cg=args.cg, rows=rows)))


if __name__ == "__main__":
    main()
