"""Large-map BA solver (models/ba_large.py): equivalence with the online
solver at small scale, sharded identity, and a medium-scale convergence run
(the full 5k-keyframe x 1M-landmark demonstration lives in
scripts/large_map_bench.py — too heavy for the unit suite)."""
import numpy as np
import jax
import jax.numpy as jnp

from visual_slam_tpu.models import ba, ba_large
from visual_slam_tpu.parallel import mesh as mesh_mod
from visual_slam_tpu.parallel import sharded_ba

from test_ba import synth_problem


def test_large_solver_matches_online_cg(rng):
    """Same LM trajectory as ba.optimize(solver='cg') to float tolerance —
    identical math, different kernels (segment sums vs one-hot matmuls)."""
    prob, _ = synth_problem(
        rng, K=6, P=300, noise_px=0.3, pose_noise=0.03, point_noise=0.05
    )
    o1, c1 = ba.optimize(prob, n_iters=8, cg_iters=10, solver="cg")
    o2, c2 = ba_large.optimize(prob, n_iters=8, cg_iters=10)
    assert abs(float(c1) - float(c2)) < 1e-2 * max(1.0, float(c1))
    np.testing.assert_allclose(
        np.asarray(o1.t), np.asarray(o2.t), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(o1.X), np.asarray(o2.X), atol=1e-3
    )


def test_large_solver_sharded_identity(rng):
    """8-device landmark-sharded run == single-device run."""
    prob, _ = synth_problem(
        rng, K=6, P=256, noise_px=0.3, pose_noise=0.03, point_noise=0.05
    )
    o1, c1 = ba_large.optimize(prob, n_iters=6, cg_iters=8)
    m = mesh_mod.make_mesh(8, axis="pt")
    o2, c2 = sharded_ba.optimize_large_sharded(prob, m, n_iters=6, cg_iters=8)
    assert abs(float(c1) - float(c2)) < 1e-2 * max(1.0, float(c1))
    # f32 camera sums associate differently across the shard/psum split,
    # and 6 LM accept/reject rounds amplify the reassociation noise — the
    # runs agree to ~1e-4, not bit-exactly.
    np.testing.assert_allclose(np.asarray(o1.t), np.asarray(o2.t), atol=1e-3)
    np.testing.assert_allclose(np.asarray(o1.X), np.asarray(o2.X), atol=1e-3)


def test_large_solver_converges_medium_scale(rng):
    """256 keyframes x 16k landmarks (64k observations): cost must drop to
    the noise floor and poses must tighten — exercises the segment-sum
    camera reductions at a size where cameras have ~256 observations each."""
    from visual_slam_tpu.utils.synthetic import build_loop_map

    prob, (R_gt, t_gt, X_gt) = build_loop_map(256, 16384, 4)
    cost0 = float(ba_large._cost(prob))
    out, cost = ba_large.optimize(
        prob, n_iters=6, cg_iters=8, init_lambda=1e-2
    )
    assert float(cost) < 0.05 * cost0, (cost0, float(cost))
    err0 = np.abs(np.asarray(prob.t) - t_gt).max()
    err1 = np.abs(np.asarray(out.t) - t_gt).max()
    assert err1 < err0
