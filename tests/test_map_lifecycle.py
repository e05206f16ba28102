"""Map lifecycle hardening tests (round-3): capacity growth instead of
RuntimeError walls, live-observation view counting on prune, and
observation-table compaction. Reference semantics being preserved:
Point.GetNVisibleFrames counts current observations (point.py:58-59) and
DiscardOutlierMapPoints culls on that live count (map.py:124-131)."""
import numpy as np

from visual_slam_tpu.models.map_state import MapConfig, SlamMap


def _small_map():
    return SlamMap(MapConfig(max_keyframes=2, max_points=8,
                             max_observations=8, track_capacity=32))


def test_capacity_growth_all_tables(rng):
    m = _small_map()
    R = np.eye(3, dtype=np.float32)
    # 5 keyframes into capacity-2 storage.
    for k in range(5):
        t = np.array([0.1 * k, 0, 0], np.float32)
        assert m.add_keyframe(R, t, frame_idx=k) == k
    assert m.n_kf == 5 and m.kf_valid[:5].all()
    assert m.config.max_keyframes >= 5
    np.testing.assert_allclose(m.kf_t[3], [0.3, 0, 0], atol=1e-6)
    # 30 points into capacity-8 storage.
    xyz = rng.normal(size=(30, 3)).astype(np.float32)
    desc = rng.integers(0, 2**31, size=(30, 8)).astype(np.uint32)
    ids = m.add_points(xyz, desc)
    assert m.config.max_points >= 30
    np.testing.assert_allclose(m.pt_xyz[ids], xyz)
    # 5 x 12 observations into capacity-8 storage.
    for k in range(5):
        sel = ids[:12]
        m.add_observations(k, sel, np.zeros((12, 2), np.float32))
    assert m.n_obs == 60 and m.config.max_observations >= 60
    assert (m.pt_views[ids[:12]] == 5).all()
    # Queries still work across the grown tables.
    seen, _ = m.points_seen_by(2)
    assert set(seen) == set(ids[:12])


def test_prune_decrements_views_and_cull_uses_live_count(rng):
    m = _small_map()
    R = np.eye(3, dtype=np.float32)
    for k in range(4):
        m.add_keyframe(R, np.array([0.1 * k, 0, 0], np.float32), k)
    xyz = rng.normal(size=(3, 3)).astype(np.float32) + [0, 0, 5]
    ids = m.add_points(xyz, np.zeros((3, 8), np.uint32))
    for k in range(4):
        m.add_observations(k, ids, np.zeros((3, 2), np.float32))
    assert (m.pt_views[ids] == 4).all()
    # Invalidate point 0's observations in kf 2,3 directly (as the BA prune
    # path does through prune_obs_from_ba).
    rows = np.where((m.obs_pt[: m.n_obs] == ids[0]) & (m.obs_cam[: m.n_obs] >= 2))[0]

    class FakeMeta:
        slot_obs = rows
        pt_ids = ids

    n = m.prune_obs_from_ba(np.ones(len(rows), bool), FakeMeta)
    assert n == 2
    assert m.pt_views[ids[0]] == 2  # live count, not lifetime count
    # Double-prune of the same rows is a no-op (views must not go negative).
    assert m.prune_obs_from_ba(np.ones(len(rows), bool), FakeMeta) == 0
    assert m.pt_views[ids[0]] == 2
    # cull at min_views=3: point 0 has 2 LIVE sightings -> culled; others stay.
    culled = m.cull_points(min_views=3)
    assert culled == 1
    assert not m.pt_valid[ids[0]] and m.pt_valid[ids[1]] and m.pt_valid[ids[2]]


def test_compact_observations(rng):
    m = _small_map()
    R = np.eye(3, dtype=np.float32)
    for k in range(2):
        m.add_keyframe(R, np.zeros(3, np.float32), k)
    ids = m.add_points(
        rng.normal(size=(10, 3)).astype(np.float32),
        np.zeros((10, 8), np.uint32),
    )
    uv = rng.uniform(0, 640, size=(10, 2)).astype(np.float32)
    m.add_observations(0, ids, uv)
    m.add_observations(1, ids, uv + 1)
    # Kill 40% of rows.
    m.obs_valid[3:11] = False
    n0 = m.n_obs
    reclaimed = m.compact_observations(min_dead_fraction=0.25)
    assert reclaimed == 8 and m.n_obs == n0 - 8
    assert m.obs_valid[: m.n_obs].all()
    # Survivor data intact: kf-1 rows still point at the right uv.
    sel = m.obs_cam[: m.n_obs] == 1
    np.testing.assert_allclose(
        m.obs_uv[: m.n_obs][sel],
        (uv + 1)[m.obs_pt[: m.n_obs][sel] - ids[0]],
    )
    # Below threshold: no-op.
    assert m.compact_observations(min_dead_fraction=0.25) == 0
