"""Multi-host distributed BA: 2 spawned processes x 4 virtual CPU devices.

The reference has no distributed layer at all (SURVEY.md §2.3); this tests
the framework's jax.distributed path (parallel/multihost.py): two OS
processes join a cluster via `jax.distributed.initialize` (gloo CPU
collectives), build a global 8-device landmark-sharded mesh, run the
sharded BA (psum-reduced camera system riding the cross-process transport),
and must agree with the single-process solver to float tolerance.
"""
import importlib.util
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "scripts", "multihost_ba_worker.py")


def _load_worker_module():
    spec = importlib.util.spec_from_file_location("mh_worker", WORKER)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_multihost_ba_matches_single_process(tmp_path):
    from visual_slam_tpu.parallel import multihost

    out = str(tmp_path / "mh.npz")
    outs = multihost.spawn_worker_fleet(2, 4, [WORKER, out])
    assert all("8 global devices" in o for o in outs), outs

    # Single-process reference on the same deterministic problem.
    mh = _load_worker_module()
    from visual_slam_tpu.models import ba

    prob = mh.synthetic_problem()
    ref, ref_cost = ba.optimize(prob, n_iters=6, cg_iters=8, solver="cg")

    got = np.load(out)
    assert int(got["n_processes"]) == 2 and int(got["n_devices"]) == 8
    np.testing.assert_allclose(got["R"], np.asarray(ref.R), atol=2e-5)
    np.testing.assert_allclose(got["t"], np.asarray(ref.t), atol=2e-5)
    assert abs(float(got["cost"]) - float(ref_cost)) < 1e-2 * max(
        1.0, float(ref_cost)
    )
    # Landmark shards: process 0 holds the first half, process 1 the rest.
    X_ref = np.asarray(ref.X)
    p1 = np.load(out + ".p1.npz")
    for starts, data in (
        (got["shard_starts"], got["shard_data"]),
        (p1["shard_starts"], p1["shard_data"]),
    ):
        per = len(data) // len(starts)
        for i, s in enumerate(starts):
            np.testing.assert_allclose(
                data[i * per : (i + 1) * per], X_ref[s : s + per], atol=2e-4
            )
