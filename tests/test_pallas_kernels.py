"""Pallas kernel tests (interpreter mode on CPU) vs the XLA fallbacks."""
import numpy as np
import jax
import jax.numpy as jnp

from visual_slam_tpu.ops import detect
from visual_slam_tpu.ops.pallas import detect_kernel


def test_detect_kernel_matches_xla():
    img = np.zeros((128, 256), np.float32)
    rng = np.random.default_rng(0)
    img += rng.uniform(0, 0.05, img.shape).astype(np.float32)
    # Plant some corners via a checkerboard patch.
    img[40:80, 60:100] = 1.0
    img[90:110, 150:200] = 0.7
    uv_ref, s_ref, v_ref = detect.detect_corners(jnp.asarray(img), max_corners=64)
    uv_pal, s_pal, v_pal = detect_kernel.detect_corners_pallas(
        jnp.asarray(img), max_corners=64, interpret=True
    )
    # Same peak set (order may differ among equal scores; compare as sets of
    # the clearly-valid peaks).
    ref_set = {tuple(p) for p in np.asarray(uv_ref)[np.asarray(v_ref)].astype(int)}
    pal_set = {tuple(p) for p in np.asarray(uv_pal)[np.asarray(v_pal)].astype(int)}
    inter = len(ref_set & pal_set)
    assert inter >= 0.9 * max(len(ref_set), 1)
    # Scores at common peaks agree.
    np.testing.assert_allclose(
        sorted(np.asarray(s_pal)[np.asarray(v_pal)])[-5:],
        sorted(np.asarray(s_ref)[np.asarray(v_ref)])[-5:],
        rtol=1e-3,
    )


def test_seg_kernels_match_xla(rng):
    """Camera-segment reduce/expand (decomposed one-hot MXU kernels) vs the
    XLA scatter/gather fallbacks, interpreter mode."""
    from visual_slam_tpu.ops.pallas import seg_kernel

    for C, N, K in [(8, 5000, 300), (27, 4096, 257)]:
        data = jnp.asarray(rng.normal(size=(C, N)).astype(np.float32))
        cam = jnp.asarray(rng.integers(0, K, N), jnp.int32)
        x = jnp.asarray(rng.normal(size=(C, K)).astype(np.float32))
        red = seg_kernel.cam_reduce(data, cam, K, interpret=True)
        red_ref = seg_kernel.cam_reduce_xla(data, cam, K)
        np.testing.assert_allclose(
            np.asarray(red), np.asarray(red_ref), rtol=1e-5, atol=1e-4
        )
        exp = seg_kernel.cam_expand(x, cam, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(exp), np.asarray(seg_kernel.cam_expand_xla(x, cam))
        )
