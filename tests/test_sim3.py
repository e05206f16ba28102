"""Sim(3) pose-graph tests: analytic block correctness vs autodiff, and
the monocular scale-drift loop-closure scenario the SE3 graph cannot fix
(models/pose_graph.py Sim3 section)."""
import numpy as np
import jax
import jax.numpy as jnp

from visual_slam_tpu.models import pose_graph as pg
from visual_slam_tpu.ops import lie


def _random_graph(rng, K=5):
    w = rng.normal(0, 0.5, (K, 3)).astype(np.float32)
    R = np.asarray(jax.vmap(lie.so3_exp)(jnp.asarray(w)))
    t = rng.normal(0, 1.0, (K, 3)).astype(np.float32)
    lam = rng.normal(0, 0.1, K).astype(np.float32)
    e_i = np.array([0, 1, 2, 3, 0], np.int32)
    e_j = np.array([1, 2, 3, 4, 4], np.int32)
    wz = rng.normal(0, 0.3, (len(e_i), 3)).astype(np.float32)
    Z_R = np.asarray(jax.vmap(lie.so3_exp)(jnp.asarray(wz)))
    Z_t = rng.normal(0, 1.0, (len(e_i), 3)).astype(np.float32)
    Z_ls = rng.normal(0, 0.2, len(e_i)).astype(np.float32)
    return pg.Sim3Graph(
        R=jnp.asarray(R), t=jnp.asarray(t), lam=jnp.asarray(lam),
        e_i=jnp.asarray(e_i), e_j=jnp.asarray(e_j),
        Z_R=jnp.asarray(Z_R), Z_t=jnp.asarray(Z_t), Z_ls=jnp.asarray(Z_ls),
        w=jnp.ones(len(e_i), jnp.float32),
        w_lam=jnp.ones(len(e_i), jnp.float32),
        fixed=jnp.zeros(K, bool).at[0].set(True),
    )


def test_sim3_blocks_match_autodiff(rng):
    """Analytic 7x7 edge Jacobians == jacfwd of the residual under
    left-composed per-node Sim3 deltas."""
    g = _random_graph(rng)
    K = g.R.shape[0]

    def residual(deltas):
        R, t, lam = pg._apply_sim3_delta(g.R, g.t, g.lam, deltas)
        r, _, _ = pg._sim3_edge_blocks(g, R, t, lam)
        return r

    d0 = jnp.zeros((K, 7), jnp.float32)
    r0, J_i, J_j = pg._sim3_edge_blocks(g, g.R, g.t, g.lam)
    J = jax.jacfwd(residual)(d0)  # (E,7,K,7)
    e_i = np.asarray(g.e_i)
    e_j = np.asarray(g.e_j)
    for e in range(len(e_i)):
        np.testing.assert_allclose(
            np.asarray(J[e, :, e_i[e]]), np.asarray(J_i[e]),
            atol=1e-4, err_msg=f"edge {e} J_i",
        )
        np.testing.assert_allclose(
            np.asarray(J[e, :, e_j[e]]), np.asarray(J_j[e]),
            atol=1e-4, err_msg=f"edge {e} J_j",
        )


def test_sim3_zero_residual_is_fixed_point(rng):
    """A chain graph measured from its own poses (Z_s=1, lam=0) is at the
    optimum: optimize must not move it."""
    w = rng.normal(0, 0.4, (6, 3)).astype(np.float32)
    R = jnp.asarray(np.asarray(jax.vmap(lie.so3_exp)(jnp.asarray(w))))
    t = jnp.asarray(rng.normal(0, 1.0, (6, 3)).astype(np.float32))
    g = pg.sim3_from_keyframe_chain(R, t, jnp.ones(6, bool))
    R2, t2, lam2, cost = pg.optimize_sim3(g, n_iters=5, cg_iters=10)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t), atol=1e-4)
    np.testing.assert_allclose(np.asarray(lam2), 0.0, atol=1e-5)
    assert float(cost) < 1e-8


def _drifted_loop(K=24, drift_per_step=0.02):
    """Cameras on a circle; estimated poses rebuilt by chaining relative
    transforms whose translation is progressively SCALED (monocular scale
    drift). Returns (gt_R, gt_t, est_R, est_t, loop measurement)."""
    ang = 2 * np.pi * np.arange(K) / K
    radius = 3.0
    C = np.stack(
        [radius * np.cos(ang), radius * np.sin(ang), 0 * ang], -1
    ).astype(np.float32)
    yaw = ang + np.pi / 2
    cy, sy = np.cos(yaw), np.sin(yaw)
    zero, one = np.zeros_like(cy), np.ones_like(cy)
    # world->cam rotations (cameras looking tangentially).
    Rwc = np.stack(
        [
            np.stack([-sy, cy, zero], -1),
            np.stack([zero, zero, one], -1),
            np.stack([cy, sy, zero], -1),
        ],
        axis=-2,
    ).astype(np.float32)
    t_gt = -np.einsum("kij,kj->ki", Rwc, C)
    # Chain the TRUE relative transforms but inflate each step's
    # translation by (1+drift): compounding monocular scale drift.
    est_R = [Rwc[0]]
    est_t = [t_gt[0]]
    for k in range(1, K):
        R_rel = Rwc[k] @ Rwc[k - 1].T
        t_rel = t_gt[k] - R_rel @ t_gt[k - 1]
        f = (1.0 + drift_per_step) ** k
        est_R.append(R_rel @ est_R[-1])
        est_t.append(R_rel @ est_t[-1] + f * t_rel)
    return Rwc, t_gt, np.stack(est_R), np.stack(est_t)


def test_sim3_closes_scale_drifted_loop(rng):
    """With compounding scale drift, a loop edge carrying the measured
    relative scale lets the 7-DoF graph recover the geometry; the SE3
    graph on the same problem cannot (this is the lr-traj3 failure mode:
    every SE3 closure attempt was warp-rejected)."""
    K = 24
    drift = 0.02
    gt_R, gt_t, est_R, est_t = _drifted_loop(K, drift)
    g = pg.sim3_from_keyframe_chain(
        jnp.asarray(est_R), jnp.asarray(est_t), jnp.ones(K, bool)
    )
    # Loop edge K-1 -> 0 measured from ground truth: Z = S_0 S_{K-1}^-1
    # with the relative scale the drift accumulated.
    R_rel = gt_R[0] @ gt_R[K - 1].T
    t_rel = gt_t[0] - R_rel @ gt_t[K - 1]
    s_m = 1.0 / (1.0 + drift) ** (K - 1)  # node K-1's local scale vs node 0
    g = pg.sim3_add_edges(
        g,
        np.array([0], np.int32), np.array([K - 1], np.int32),
        R_rel[None], t_rel[None],
        np.array([np.log(s_m)], np.float32),
        np.array([50.0], np.float32),
    )
    R2, t2, lam2, _ = pg.optimize_sim3(g, n_iters=25, cg_iters=32, use_dcs=False)
    # Metric poses: t / s.
    s2 = np.exp(np.asarray(lam2))
    C_est = -np.einsum("kji,kj->ki", np.asarray(R2), np.asarray(t2) / s2[:, None])
    C_gt = -np.einsum("kji,kj->ki", gt_R, gt_t)
    C_drift = -np.einsum("kji,kj->ki", est_R, est_t)
    err_before = np.linalg.norm(C_drift - C_gt, axis=-1).max()
    err_after = np.linalg.norm(C_est - C_gt, axis=-1).max()
    assert err_after < 0.35 * err_before, (err_before, err_after)
    # The recovered per-node scales must track the compounding drift:
    # the loop edge pins lam_0 - lam_{K-1} = log s_m = -(K-1) log(1+d),
    # so lam grows +log(1+d) per node along the chain.
    lam_expect = np.log(1.0 + drift) * np.arange(K)
    corr = np.corrcoef(np.asarray(lam2), lam_expect)[0, 1]
    assert corr > 0.9, corr
