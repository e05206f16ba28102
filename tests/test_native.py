"""Native (C++) async dataloader tests."""
import os

import numpy as np
import pytest

DATA = "/root/reference/data/ICL_NUIM"

pytestmark = pytest.mark.skipif(
    not os.path.exists(DATA), reason="ICL-NUIM dataset not available"
)


def test_native_loader_matches_pil():
    from visual_slam_tpu import native

    if not native.available():
        pytest.skip("native library not built")
    from PIL import Image

    rgb_paths = [f"{DATA}/rgb/{i}.png" for i in range(8)]
    dep_paths = [f"{DATA}/depth/{i}.png" for i in range(8)]
    loader = native.AsyncFrameLoader(rgb_paths, dep_paths)
    try:
        for i in [0, 3, 7]:
            rgb, depth = loader.get(i)
            assert np.array_equal(rgb, np.asarray(Image.open(rgb_paths[i])))
            ref_d = np.asarray(Image.open(dep_paths[i])).astype(np.float32) / 5000.0
            assert np.allclose(depth, ref_d)
    finally:
        loader.close()


def test_async_frames_iterator():
    from visual_slam_tpu.utils.dataset import ICLNUIMDataset

    ds = ICLNUIMDataset(DATA)
    got = list(ds.async_frames(2, 6))
    assert [i for i, _, _ in got] == [2, 3, 4, 5]
    i, rgb, depth = got[0]
    assert rgb.shape == (480, 640, 3)
    assert depth.shape == (480, 640)
    np.testing.assert_allclose(np.median(depth[depth > 0]), np.median(ds.depth(2)[ds.depth(2) > 0]))


def test_native_loader_random_access_and_close():
    from visual_slam_tpu import native

    if not native.available():
        pytest.skip("native library not built")
    rgb_paths = [f"{DATA}/rgb/{i}.png" for i in range(5)]
    loader = native.AsyncFrameLoader(rgb_paths, None)
    rgb, depth = loader.get(4)
    assert depth is None
    assert rgb.shape == (480, 640, 3)
    loader.close()
    loader.close()  # idempotent
