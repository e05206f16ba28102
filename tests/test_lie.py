import numpy as np
import jax.numpy as jnp

from visual_slam_tpu.ops import lie


def random_rotvecs(rng, n, max_angle=np.pi - 0.2):
    axes = rng.normal(size=(n, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    angles = rng.uniform(0, max_angle, size=(n, 1))
    return (axes * angles).astype(np.float32)


def test_so3_exp_matches_cv2(rng):
    import cv2

    w = random_rotvecs(rng, 32)
    R = np.asarray(lie.so3_exp(jnp.asarray(w)))
    for i in range(32):
        R_cv, _ = cv2.Rodrigues(w[i].astype(np.float64))
        np.testing.assert_allclose(R[i], R_cv, atol=1e-5)


def test_so3_log_roundtrip(rng):
    w = random_rotvecs(rng, 64)
    R = lie.so3_exp(jnp.asarray(w))
    w2 = np.asarray(lie.so3_log(R))
    np.testing.assert_allclose(w2, w, atol=1e-4)


def test_so3_exp_small_angle():
    w = jnp.asarray([[1e-9, 0.0, 0.0], [0.0, 0.0, 0.0]])
    R = np.asarray(lie.so3_exp(w))
    np.testing.assert_allclose(R[0], np.eye(3), atol=1e-6)
    np.testing.assert_allclose(R[1], np.eye(3), atol=1e-6)


def test_se3_exp_log_roundtrip(rng):
    xi = rng.normal(size=(16, 6)).astype(np.float32) * 0.5
    R, t = lie.se3_exp(jnp.asarray(xi))
    xi2 = np.asarray(lie.se3_log(R, t))
    np.testing.assert_allclose(xi2, xi, atol=1e-4)


def test_inv_and_compose(rng):
    xi = rng.normal(size=(8, 6)).astype(np.float32)
    R, t = lie.se3_exp(jnp.asarray(xi))
    T = lie.make_T(R, t)
    TT = np.asarray(lie.compose(T, lie.inv_T(T)))
    np.testing.assert_allclose(TT, np.broadcast_to(np.eye(4), (8, 4, 4)), atol=1e-5)


def test_transform_points(rng):
    xi = rng.normal(size=(6,)).astype(np.float32)
    R, t = lie.se3_exp(jnp.asarray(xi))
    T = lie.make_T(R, t)
    X = rng.normal(size=(10, 3)).astype(np.float32)
    got = np.asarray(lie.transform_points(T, jnp.asarray(X)))
    want = X @ np.asarray(R).T + np.asarray(t)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_project_so3(rng):
    M = rng.normal(size=(5, 3, 3)).astype(np.float32)
    R = np.asarray(lie.project_so3(jnp.asarray(M)))
    for i in range(5):
        np.testing.assert_allclose(R[i] @ R[i].T, np.eye(3), atol=1e-5)
        assert np.linalg.det(R[i]) > 0.99
