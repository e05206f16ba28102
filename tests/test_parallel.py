"""Multi-device tests on the 8-virtual-device CPU mesh (SURVEY.md §4)."""
import numpy as np
import jax
import jax.numpy as jnp

from visual_slam_tpu.models import ba
from visual_slam_tpu.parallel import mesh as mesh_mod, sharded_ba

from test_ba import synth_problem, mean_reproj_error


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_sharded_ba_matches_single_device(rng):
    prob, (R_gt, t_gt, X_gt) = synth_problem(rng, K=5, P=200, pose_noise=0.02, point_noise=0.03)
    out1, c1 = ba.optimize(prob, n_iters=6)
    m = mesh_mod.make_mesh(8, "pts")
    out8, c8 = sharded_ba.optimize_sharded(prob, m, n_iters=6)
    # Same math, different placement: results must agree tightly. Summation
    # order differs across shards, so float noise walks along the
    # unobservable monocular scale direction — compare scale-aligned.
    np.testing.assert_allclose(np.asarray(out8.R), np.asarray(out1.R), atol=1e-4)
    s = np.linalg.norm(np.asarray(out8.t[1])) / np.linalg.norm(np.asarray(out1.t[1]))
    np.testing.assert_allclose(np.asarray(out8.t) / s, np.asarray(out1.t), atol=1e-3)
    # Costs converge to machine noise; compare with an absolute floor.
    np.testing.assert_allclose(float(c8), float(c1), rtol=1e-3, atol=1e-6)


def test_sharded_ba_converges(rng):
    prob, (R_gt, t_gt, X_gt) = synth_problem(rng, K=5, P=200, pose_noise=0.03, point_noise=0.05)
    m = mesh_mod.make_mesh(4, "pts")
    out, cost = sharded_ba.optimize_sharded(prob, m, n_iters=8)
    assert mean_reproj_error(out) < 0.05


def test_sharded_ba_cg_solver(rng):
    """The implicit-CG solver also runs sharded (the config-#5 path where
    the reduced camera system is too large to materialize)."""
    prob, _ = synth_problem(rng, K=5, P=200, pose_noise=0.02, point_noise=0.03)
    m = mesh_mod.make_mesh(8, "pts")
    out, cost = sharded_ba.optimize_sharded(prob, m, n_iters=6, cg_iters=24, solver="cg")
    assert mean_reproj_error(out) < 0.05
