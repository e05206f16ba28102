"""Pose-graph optimization + g2o IO tests."""
import numpy as np
import jax.numpy as jnp

from visual_slam_tpu.models import pose_graph
from visual_slam_tpu.ops import lie


def make_chain(rng, K=8, drift=0.05):
    """GT chain of poses + noisy initialization."""
    R_gt = [np.eye(3, dtype=np.float32)]
    t_gt = [np.zeros(3, np.float32)]
    for k in range(1, K):
        w = rng.normal(scale=0.1, size=3).astype(np.float32)
        dR = np.asarray(lie.so3_exp(jnp.asarray(w)))
        R_gt.append(dR @ R_gt[-1])
        t_gt.append(np.asarray(dR @ t_gt[-1] + rng.normal(scale=0.3, size=3).astype(np.float32)))
    R_gt, t_gt = np.stack(R_gt), np.stack(t_gt)
    R0, t0 = R_gt.copy(), t_gt.copy()
    for k in range(1, K):
        dw = rng.normal(scale=drift, size=3).astype(np.float32)
        dR = np.asarray(lie.so3_exp(jnp.asarray(dw)))
        R0[k] = dR @ R_gt[k]
        t0[k] = t_gt[k] + rng.normal(scale=drift, size=3).astype(np.float32)
    return R_gt, t_gt, R0, t0


def test_pose_graph_converges_to_measurements(rng):
    K = 8
    R_gt, t_gt, R0, t0 = make_chain(rng, K)
    # Edges measured from GT; start from the perturbed poses.
    g_gt = pose_graph.from_keyframe_chain(
        jnp.asarray(R_gt), jnp.asarray(t_gt), jnp.ones(K, bool)
    )
    g = g_gt._replace(R=jnp.asarray(R0), t=jnp.asarray(t0))
    R_out, t_out, cost = pose_graph.optimize(g, n_iters=15)
    # With exact chain measurements and pose 0 fixed, the chain must snap
    # back to ground truth.
    np.testing.assert_allclose(np.asarray(R_out), R_gt, atol=1e-3)
    np.testing.assert_allclose(np.asarray(t_out), t_gt, atol=1e-2)
    assert float(cost) < 1e-6


def test_pose_graph_respects_fixed(rng):
    K = 6
    R_gt, t_gt, R0, t0 = make_chain(rng, K)
    g = pose_graph.from_keyframe_chain(
        jnp.asarray(R_gt), jnp.asarray(t_gt), jnp.ones(K, bool)
    )._replace(R=jnp.asarray(R0), t=jnp.asarray(t0))
    R_out, t_out, _ = pose_graph.optimize(g, n_iters=5)
    np.testing.assert_allclose(np.asarray(R_out[0]), R0[0], atol=1e-7)
    np.testing.assert_allclose(np.asarray(t_out[0]), t0[0], atol=1e-7)


def test_scale_edges_fix_scale_drift(rng):
    """Scale edges with corrected measurements restore a drifted chain scale
    (≙ AddScalingEdge semantics: the edge pins ||t_rel||, LocalBA.py:115-131)."""
    K = 6
    R_gt, t_gt, _, _ = make_chain(rng, K, drift=0.0)
    # Apply progressive scale drift to translations (monocular drift model).
    scales = np.linspace(1.0, 1.6, K).astype(np.float32)
    t_drift = (t_gt * scales[:, None]).astype(np.float32)
    g = pose_graph.from_keyframe_chain(
        jnp.asarray(R_gt), jnp.asarray(t_drift), jnp.ones(K, bool)
    )
    # Correct scale measurements from GT relative translations; relax SE3
    # edges so scale edges dominate the translation norms.
    i, j = np.arange(K - 1), np.arange(1, K)
    R_rel, t_rel = pose_graph._rel(jnp.asarray(R_gt), jnp.asarray(t_gt), i, j)
    g = g._replace(
        s_meas=jnp.linalg.norm(t_rel, axis=-1),
        Z_t=t_rel,  # SE3 edges also carry the un-drifted measurement
        Z_R=R_rel,
    )
    R_out, t_out, cost = pose_graph.optimize(g, n_iters=20)
    np.testing.assert_allclose(np.asarray(t_out), t_gt, atol=2e-2)


def test_g2o_roundtrip(tmp_path, rng):
    from visual_slam_tpu.utils import g2o_io

    K = 5
    R_gt, t_gt, _, _ = make_chain(rng, K)
    valid = np.ones(K, bool)
    pts = rng.normal(size=(7, 3))
    path = str(tmp_path / "graph.g2o")
    edges = [(0, 1, np.eye(3), np.array([1.0, 0, 0]))]
    g2o_io.save_pose_graph(path, R_gt, t_gt, valid, edges=edges, points=pts)
    poses, points, edges2 = g2o_io.load_pose_graph(path)
    assert len(poses) == K and len(points) == 7 and len(edges2) == 1
    # Round trip: stored cam->world must match -R^T t / R^T.
    for k in range(K):
        R_wc, t_wc = poses[k]
        np.testing.assert_allclose(R_wc, R_gt[k].T, atol=1e-6)
        np.testing.assert_allclose(t_wc, -R_gt[k].T @ t_gt[k], atol=1e-6)
    np.testing.assert_allclose(points[K + 0], pts[0], atol=1e-6)


def test_analytic_matches_dense_oracle(rng):
    """The analytic-Jacobian CG solver must match the jacfwd dense solver."""
    K = 10
    R_gt, t_gt, R0, t0 = make_chain(rng, K)
    g = pose_graph.from_keyframe_chain(
        jnp.asarray(R_gt), jnp.asarray(t_gt), jnp.ones(K, bool)
    )._replace(R=jnp.asarray(R0), t=jnp.asarray(t0))
    R_a, t_a, _ = pose_graph.optimize(g, n_iters=10, cg_iters=60, use_dcs=False)
    R_d, t_d, _ = pose_graph.optimize_dense(g, n_iters=10)
    np.testing.assert_allclose(np.asarray(R_a), np.asarray(R_d), atol=1e-4)
    np.testing.assert_allclose(np.asarray(t_a), np.asarray(t_d), atol=1e-3)


def test_loop_edge_corrects_drift(rng):
    """A verified loop edge pulls an accumulated-drift chain back toward GT
    (config #2 loop-closure semantics)."""
    K = 30
    R_gt, t_gt, _, _ = make_chain(rng, K, drift=0.0)
    # Simulate accumulated odometry drift: progressively rotate/translate.
    R0, t0 = R_gt.copy(), t_gt.copy()
    for k in range(1, K):
        a = 0.004 * k
        dR = np.asarray(lie.so3_exp(jnp.asarray([0.0, a, 0.0], dtype=jnp.float32)))
        R0[k] = dR @ R_gt[k]
        t0[k] = t_gt[k] + np.array([0.01 * k, 0, 0.008 * k], np.float32)
    # Chain edges measured from the DRIFTED poses (odometry is consistent
    # with itself); one loop edge carries the TRUE relative pose K-1 <-> 0.
    g = pose_graph.from_keyframe_chain(
        jnp.asarray(R0), jnp.asarray(t0), jnp.ones(K, bool)
    )
    Z_R, Z_t = pose_graph._rel(jnp.asarray(R_gt), jnp.asarray(t_gt),
                               np.array([0]), np.array([K - 1]))
    g = pose_graph.add_edges(g, [0], [K - 1], Z_R, Z_t, [50.0])
    R_out, t_out, _ = pose_graph.optimize(g, n_iters=25, cg_iters=60)
    # End-of-chain error shrinks by a large factor.
    err0 = np.linalg.norm(t0[-1] - t_gt[-1])
    err1 = np.linalg.norm(np.asarray(t_out[-1]) - t_gt[-1])
    assert err1 < 0.35 * err0


def test_dcs_rejects_bad_loop_edge(rng):
    """A grossly wrong loop edge must NOT warp the graph when DCS is on
    (≙ RobustKernelDCS on EdgeSE3, LocalBA.py:97-113)."""
    K = 12
    R_gt, t_gt, _, _ = make_chain(rng, K, drift=0.0)
    g = pose_graph.from_keyframe_chain(
        jnp.asarray(R_gt), jnp.asarray(t_gt), jnp.ones(K, bool)
    )
    # Bogus loop edge claiming keyframe K-1 sits 5m from keyframe 0.
    bad_R = np.eye(3, dtype=np.float32)[None]
    bad_t = np.array([[5.0, 0.0, 0.0]], np.float32)
    g_bad = pose_graph.add_edges(g, [0], [K - 1], bad_R, bad_t, [10.0])
    R_out, t_out, _ = pose_graph.optimize(g_bad, n_iters=15, use_dcs=True)
    np.testing.assert_allclose(np.asarray(t_out), t_gt, atol=0.05)
    # Sanity: without DCS the same edge DOES warp the chain.
    R_w, t_w, _ = pose_graph.optimize(g_bad, n_iters=15, use_dcs=False)
    assert np.abs(np.asarray(t_w) - t_gt).max() > 0.2


def make_big_graph(K=5000):
    """K-keyframe noisy chain + long-range loop edges (shared by the 5k
    scale test and the edge-sharded identity test)."""
    rs = np.random.default_rng(3)
    R_gt = [np.eye(3, dtype=np.float32)]
    t_gt = [np.zeros(3, np.float32)]
    for k in range(1, K):
        w = rs.normal(scale=0.02, size=3).astype(np.float32)
        dR = np.asarray(lie.so3_exp(jnp.asarray(w)))
        R_gt.append((dR @ R_gt[-1]).astype(np.float32))
        t_gt.append((dR @ t_gt[-1] + rs.normal(scale=0.1, size=3)).astype(np.float32))
    R_gt, t_gt = np.stack(R_gt), np.stack(t_gt)
    R0, t0 = R_gt.copy(), t_gt.copy()
    for k in range(1, K):
        dw = rs.normal(scale=0.02, size=3).astype(np.float32)
        R0[k] = np.asarray(lie.so3_exp(jnp.asarray(dw))) @ R_gt[k]
        t0[k] = t_gt[k] + rs.normal(scale=0.02, size=3).astype(np.float32)
    g = pose_graph.from_keyframe_chain(
        jnp.asarray(R_gt), jnp.asarray(t_gt), jnp.ones(K, bool)
    )._replace(R=jnp.asarray(R0), t=jnp.asarray(t0))
    # A handful of long-range loop edges.
    li = np.arange(0, K - 1000, 500)
    lj = li + 1000
    Z_R, Z_t = pose_graph._rel(jnp.asarray(R_gt), jnp.asarray(t_gt), li, lj)
    g = pose_graph.add_edges(g, li, lj, Z_R, Z_t, np.full(len(li), 5.0))
    return g, R_gt, t_gt


def test_pose_graph_scales_to_5k(rng):
    """5000-keyframe chain + loop edges solved in seconds on CPU
    (VERDICT round-1 item #3 done-criterion)."""
    import time

    g, R_gt, t_gt = make_big_graph(5000)
    R_out, t_out, cost = pose_graph.optimize(g, n_iters=8, cg_iters=40)
    np.asarray(t_out)  # materialize (compile + run)
    t0_ = time.perf_counter()
    R_out, t_out, cost = pose_graph.optimize(g, n_iters=8, cg_iters=40)
    np.asarray(t_out)
    dt = time.perf_counter() - t0_
    assert dt < 5.0, f"5k-keyframe solve took {dt:.1f}s"
    err = np.abs(np.asarray(t_out) - t_gt).max()
    assert err < 0.05, f"max translation error {err:.3f}"


def test_sharded_pose_graph_identity_5k():
    """Edge-sharded pose graph on the 8-virtual-device mesh matches the
    single-device solver at 5 000 keyframes (SURVEY §2.3 keyframe-
    partitioned pose graph; VERDICT r2 item #7 done-criterion)."""
    import jax
    from visual_slam_tpu.parallel import mesh as mesh_mod, sharded_pg

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 virtual devices")
    g, R_gt, t_gt = make_big_graph(5000)
    R_ref, t_ref, c_ref = pose_graph.optimize(g, n_iters=6, cg_iters=32)
    m = mesh_mod.make_mesh(8, "edges")
    R_sh, t_sh, c_sh = sharded_pg.optimize_sharded(g, m, n_iters=6, cg_iters=32)
    # Same psum'd sums, same CG trajectory — only reduction order differs.
    np.testing.assert_allclose(np.asarray(t_sh), np.asarray(t_ref), atol=2e-3)
    np.testing.assert_allclose(np.asarray(R_sh), np.asarray(R_ref), atol=2e-4)
    assert abs(float(c_sh) - float(c_ref)) <= 1e-3 * max(1.0, abs(float(c_ref)))


def test_sharded_pose_graph_identity_small(rng):
    """Sharded solver also matches on a small odd-sized graph (exercises
    zero-weight edge padding)."""
    import jax
    from visual_slam_tpu.parallel import mesh as mesh_mod, sharded_pg

    if len(jax.devices()) < 4:
        import pytest

        pytest.skip("needs 4 virtual devices")
    K = 10
    R_gt, t_gt, R0, t0 = make_chain(rng, K)
    g = pose_graph.from_keyframe_chain(
        jnp.asarray(R_gt), jnp.asarray(t_gt), jnp.ones(K, bool)
    )._replace(R=jnp.asarray(R0), t=jnp.asarray(t0))
    # 9 chain edges: not divisible by 4 — padding must be a no-op numerically.
    R_ref, t_ref, c_ref = pose_graph.optimize(g, n_iters=10)
    m = mesh_mod.make_mesh(4, "edges")
    R_sh, t_sh, c_sh = sharded_pg.optimize_sharded(g, m, n_iters=10)
    np.testing.assert_allclose(np.asarray(t_sh), np.asarray(t_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(R_sh), np.asarray(R_ref), atol=1e-5)
