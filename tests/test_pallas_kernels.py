"""Pallas kernel tests (interpreter mode on CPU) vs the XLA fallbacks."""
import numpy as np
import jax
import jax.numpy as jnp

from visual_slam_tpu.ops import detect, match
from visual_slam_tpu.ops.pallas import detect_kernel, match_kernel


def test_match_kernel_matches_xla(rng):
    d1 = jnp.asarray(rng.integers(0, 2**32, (256, 8), dtype=np.uint32))
    d2 = jnp.asarray(rng.integers(0, 2**32, (256, 8), dtype=np.uint32))
    v1 = jnp.asarray(rng.uniform(size=256) > 0.1)
    v2 = jnp.asarray(rng.uniform(size=256) > 0.1)
    i_ref, d_ref, g_ref = match.match_ratio_test(d1, d2, v1, v2, cross_check=True)
    i_pal, d_pal, g_pal = match_kernel.match_ratio_test_pallas(
        d1, d2, v1, v2, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(i_pal), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(d_pal), np.asarray(d_ref), atol=1e-3)
    np.testing.assert_array_equal(np.asarray(g_pal), np.asarray(g_ref))


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
